"""Pure-Python animated GIF encoder (tools/gif.py): LZW round-trips,
container structure, colormap, and the viewer's dependency-free path."""

from __future__ import annotations

import numpy as np
import pytest

from bloomy_etl_spark.tools.gif import (
    colormap_rdylgn,
    decode_gif_frames,
    encode_gif,
    rdylgn_palette,
)


class TestLzwRoundtrip:
    def test_small_frames_exact(self):
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, (9, 13), dtype=np.uint8) for _ in range(3)]
        got = decode_gif_frames(encode_gif(frames, duration_ms=200))
        assert len(got) == 3
        for g, f in zip(got, frames):
            np.testing.assert_array_equal(g, f)

    def test_code_width_growth_and_dict_reset(self):
        """A 200x200 random frame pushes the LZW dictionary past every
        width boundary and through the 4096-entry reset."""
        rng = np.random.default_rng(7)
        frame = rng.integers(0, 256, (200, 200), dtype=np.uint8)
        got = decode_gif_frames(encode_gif([frame]))
        np.testing.assert_array_equal(got[0], frame)

    def test_repetitive_data_compresses(self):
        frame = np.zeros((64, 64), dtype=np.uint8)
        data = encode_gif([frame])
        assert len(data) < 64 * 64  # LZW actually compressed
        np.testing.assert_array_equal(decode_gif_frames(data)[0], frame)

    def test_header_and_trailer(self):
        data = encode_gif([np.zeros((2, 3), dtype=np.uint8)], loop=0)
        assert data[:6] == b"GIF89a"
        assert data[-1] == 0x3B
        assert b"NETSCAPE2.0" in data

    def test_errors(self):
        with pytest.raises(ValueError):
            encode_gif([])
        with pytest.raises(ValueError):
            encode_gif([np.zeros((2, 2), dtype=np.uint8)], palette=b"\0" * 10)
        with pytest.raises(ValueError):
            encode_gif([
                np.zeros((2, 2), dtype=np.uint8),
                np.zeros((3, 3), dtype=np.uint8),
            ])


class TestColormap:
    def test_range_and_nan(self):
        v = np.array([[-0.2, 0.4, 1.0], [np.nan, 2.0, -5.0]])
        idx = colormap_rdylgn(v, -0.2, 1.0)
        assert idx[0, 0] == 0 and idx[0, 2] == 254
        assert idx[1, 0] == 255            # NaN -> gray slot
        assert idx[1, 1] == 254            # clipped high
        assert idx[1, 2] == 0              # clipped low
        assert len(rdylgn_palette()) == 768


def test_viewer_gif_without_optional_deps(spark, tmp_path):
    """CubeViewer.create_gif writes a playable GIF in this container
    (no matplotlib/Pillow): real header, one frame per date, panel
    width = 2 grids + separator."""
    try:
        import matplotlib  # noqa: F401
        pytest.skip("matplotlib importable: pillow branch would run")
    except ImportError:
        pass
    import datetime

    from bloomy_etl_spark.tools.viewer import CubeViewer

    rows = []
    for d, day in ((datetime.datetime(2024, 6, 1, 10), 1),
                   (datetime.datetime(2024, 6, 2, 10), 2)):
        for y in range(3):
            for x in range(4):
                rows.append((d, y, x, 0.1 * day * (y + 1), 0.2 * day))
    cube = spark.createDataFrame(
        rows, "time timestamp, y int, x int, ndvi double, evi double"
    )
    v = CubeViewer(spark, cube)
    path = v.create_gif(str(tmp_path / "series.gif"), duration_ms=100)
    data = open(path, "rb").read()
    frames = decode_gif_frames(data)
    assert len(frames) == 2
    assert frames[0].shape == (3, 4 + 1 + 4)
