"""CubeViewer tests (reference tools/visualize_dataset.py parity).

Numeric accessors checked against hand-computed numpy on a tiny cube;
plot methods are matplotlib-gated and excluded (no matplotlib here).
"""

from __future__ import annotations

import numpy as np
import pytest

from bloomy_etl_spark.tools import CubeViewer


@pytest.fixture(scope="module")
def tiny_cube(spark):
    rows = [
        # time, y, x, ndvi, evi
        ("2024-01-01 10:00:00", 0, 0, 0.1, 0.2),
        ("2024-01-01 10:00:00", 0, 1, 0.3, 0.4),
        ("2024-01-01 10:00:00", 1, 1, None, 0.6),
        ("2024-01-02 10:00:00", 0, 0, 0.5, 0.8),
        ("2024-01-02 10:00:00", 1, 1, 0.7, None),
    ]
    df = spark.createDataFrame(rows, "time string, y int, x int, ndvi double, evi double")
    return df.withColumn("time", df["time"].cast("timestamp"))


def test_info(spark, tiny_cube):
    info = CubeViewer(spark, tiny_cube).info()
    assert info["n_timestamps"] == 2
    assert info["height"] == 2 and info["width"] == 2
    assert info["variables"] == ["ndvi", "evi"]


def test_global_stats_exact(spark, tiny_cube):
    stats = CubeViewer(spark, tiny_cube).global_stats().set_index("variable")
    vals = np.array([0.1, 0.3, 0.5, 0.7])
    assert stats.loc["ndvi", "min"] == pytest.approx(0.1)
    assert stats.loc["ndvi", "mean"] == pytest.approx(vals.mean())
    assert stats.loc["ndvi", "median"] == pytest.approx(np.median(vals))
    assert stats.loc["ndvi", "std"] == pytest.approx(vals.std())  # ddof=0
    assert stats.loc["ndvi", "valid_pct"] == pytest.approx(80.0)


def test_frame_and_nan_gaps(spark, tiny_cube):
    fr = CubeViewer(spark, tiny_cube).frame("2024-01-01")
    assert fr.shape == (2, 2)
    assert fr[0, 0] == pytest.approx(0.1, abs=1e-6)
    assert fr[0, 1] == pytest.approx(0.3, abs=1e-6)
    assert np.isnan(fr[1, 0])  # never observed
    assert np.isnan(fr[1, 1])  # observed but NULL ndvi


def test_pixel_series(spark, tiny_cube):
    s = CubeViewer(spark, tiny_cube).pixel_series(1, 1)
    assert len(s) == 2
    assert np.isnan(s["ndvi"].iloc[0]) and s["ndvi"].iloc[1] == pytest.approx(0.7)


def test_temporal_average_and_std(spark, tiny_cube):
    v = CubeViewer(spark, tiny_cube)
    avg = v.temporal_average("ndvi")
    assert avg[0, 0] == pytest.approx((0.1 + 0.5) / 2, abs=1e-6)
    assert avg[1, 1] == pytest.approx(0.7, abs=1e-6)  # null-skipping
    std = v.std_deviation("ndvi")
    assert std[0, 0] == pytest.approx(np.std([0.1, 0.5]), abs=1e-6)


def test_print_summary_runs(spark, tiny_cube, capsys):
    CubeViewer(spark, tiny_cube).print_summary()
    out = capsys.readouterr().out
    assert "GLOBAL STATISTICS" in out and "NDVI" in out


def test_dates_axis(spark, tiny_cube):
    assert CubeViewer(spark, tiny_cube).dates() == ["2024-01-01", "2024-01-02"]


def test_gif_and_interactive_graceful_without_matplotlib(spark, tiny_cube, tmp_path):
    """GIF/interactive modes (reference visualize_dataset.py:195-269,
    357-414) must fail with a CLEAR ImportError when matplotlib is absent
    (this container), never a confusing AttributeError mid-render."""
    v = CubeViewer(spark, tiny_cube)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="matplotlib"):
            v.create_gif(str(tmp_path / "a.gif"))
        with pytest.raises(ImportError, match="matplotlib"):
            v.plot_interactive()
    else:  # pragma: no cover - matplotlib present
        v.create_gif(str(tmp_path / "a.gif"))
