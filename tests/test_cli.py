"""CLI surface (``python -m bloomy_etl_spark``): reference ``main.py:39-89``.

Runs ``main()`` in-process (same warm session via getOrCreate) rather than
spawning a JVM per test.
"""

import json
import os

import pytest

from bloomy_etl_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_process_writes_all_sinks(spark, tmp_path):
    out = str(tmp_path / "run")
    summary = main(["--sf-dir", SF, "--output", out])
    assert summary["mode"] == "process"
    assert summary["granules_kept"] > 0
    assert summary["cube_rows"] > 0
    assert os.path.isdir(summary["paths"]["cube"])
    assert os.path.isdir(summary["paths"]["events"])
    with open(summary["paths"]["index"]) as f:
        idx = json.load(f)
    assert len(idx["dates"]) >= 1 and idx["width"] >= 1


def test_cli_date_range_and_flags(spark, tmp_path):
    out = str(tmp_path / "run")
    full = main(["--sf-dir", SF, "--output", str(tmp_path / "full")])
    clipped = main(
        ["--sf-dir", SF, "--output", out,
         "--start", "2024-01-05", "--end", "2024-01-10",
         "--disable-quality-filter", "--no-detect"]
    )
    assert clipped["cube_rows"] < full["cube_rows"]
    assert clipped["n_events"] == 0
    # 100% cloud tolerance can only keep >= granules vs a strict gate
    lax = main(["--sf-dir", SF, "--output", str(tmp_path / "lax"),
                "--cloud-cover", "100"])
    assert lax["granules_kept"] >= full["granules_kept"]


def test_cli_export_only_reuses_existing_cube(spark, tmp_path):
    out = str(tmp_path / "run")
    main(["--sf-dir", SF, "--output", out])
    summary = main(["--output", out, "--only-export", "--downsample", "2"])
    assert summary["mode"] == "export-only"
    assert summary["n_rasters"] >= 1
    assert os.path.isdir(summary["geotiff_dir"])


def test_cli_cache_incremental_and_netcdf(spark, tmp_path):
    """--cache-dir: run 1 populates the (tile, date) granule cache; run 2
    over a WIDER date range appends only the uncached granules (the J5
    anti-join skip — reference processor.py:49-53). --keep-cache retains
    the dir; --export-netcdf writes the per-date interop files."""
    cache = str(tmp_path / "cache")
    r1 = main(["--sf-dir", SF, "--output", str(tmp_path / "o1"),
               "--end", "2024-01-02", "--disable-quality-filter",
               "--cache-dir", cache, "--keep-cache", "--no-detect"])
    assert r1["granule_rows_added"] > 0
    assert os.path.isdir(cache)
    # identical rerun: every granule cached -> nothing added
    r2 = main(["--sf-dir", SF, "--output", str(tmp_path / "o2"),
               "--end", "2024-01-02", "--disable-quality-filter",
               "--cache-dir", cache, "--keep-cache", "--no-detect"])
    assert r2["granule_rows_added"] == 0
    assert r2["cube_rows"] == r1["cube_rows"]
    # wider range: only the new days' granules are added
    r3 = main(["--sf-dir", SF, "--output", str(tmp_path / "o3"),
               "--end", "2024-01-03", "--disable-quality-filter",
               "--cache-dir", cache, "--no-detect", "--export-netcdf"])
    # strictly incremental: the wider range must add fewer rows than the
    # first run's full population (only the new days' granules)
    assert 0 < r3["granule_rows_added"] < r1["granule_rows_added"]
    assert r3["cube_rows"] > r1["cube_rows"]
    assert r3["n_netcdf"] >= 1 and os.path.isdir(r3["netcdf_dir"])
    # no --keep-cache on the last run -> scratch cache removed
    assert r3.get("cache_removed") is True
    assert not os.path.isdir(cache)


def test_cli_catalog_search_gates_processed_dates(spark, tmp_path):
    """--catalog-endpoint reproduces the reference's search-then-process
    flow: only dates the catalog returns (cloud/day-night/temporal
    query, pushed to the server) are processed into the cube."""
    import threading
    from http.server import ThreadingHTTPServer

    from pyspark.sql import functions as F

    from tests.test_catalog import GRANULES, _State, _make_handler

    state = _State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        out = str(tmp_path / "cat")
        summary = main([
            "--sf-dir", SF, "--output", out,
            "--catalog-endpoint", endpoint,
            "--cloud-cover", "30",
            "--start", "2024-01-01", "--end", "2024-01-31",
        ])
        want_dates = sorted({
            g["datetime"][:10] for g in GRANULES
            if g["cloud_cover"] <= 30 and g["day_night"] == "day"
        })
        assert summary["catalog_dates"] == len(want_dates)
        cube_dates = sorted(
            r["d"].isoformat()
            for r in spark.read.parquet(out + "/cube")
            .select(F.to_date("time").alias("d")).distinct().collect()
        )
        assert set(cube_dates) <= set(want_dates)
        assert cube_dates, "catalog gating removed every date"
        # the predicates reached the SERVER (pushdown, not post-filter)
        assert any(
            qp.get("day_night") == "day"
            and float(qp.get("cloud_cover_max", "nan")) == 30.0
            for qp in state.requests
        )
    finally:
        srv.shutdown()
