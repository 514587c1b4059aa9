"""CLI entry point: ``python -m bloomy_etl_spark --output /tmp/run``.

Reference parity: ``main.py:39-55`` (argparse surface: ``--start/--end``
date range, ``--output``, ``--cloud-cover``, ``--only-export``,
``--export-geotiff``, ``--geotiff-dir``, ``--downsample``) and
``main.py:57-89`` (export-only mode short-circuits processing). The
reference's AOI GeoJSON + NASA CMR search has no public-data analogue
here; the input is a pixel parquet table (``--pixels``) or the driver
fixture derivation (``--sf-dir``), which stands in for
search → download → decode (see ``operators/bloomy_queries.py``).

The pipeline body is ``pipeline.run_pipeline`` — one lazy DataFrame DAG;
this module only parses flags, builds the session, and triggers sinks.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import replace


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bloomy_etl_spark",
        description="PySpark bloom-detection ETL pipeline",
    )
    p.add_argument("--pixels", help="Input pixel parquet (tile_id, time, y, x, red, nir, blue, fmask)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="Fixture dir: derive pixels from its events table (default when --pixels absent)")
    p.add_argument("--start", help="Start date (YYYY-MM-DD), inclusive")
    p.add_argument("--end", help="End date (YYYY-MM-DD), inclusive")
    p.add_argument("--output", required=True, help="Output directory (cube/, events/, index.json)")
    p.add_argument("--catalog-endpoint",
                   help="HTTP granule-catalog endpoint (sources/catalog.py); "
                        "when set, the pipeline processes only dates the "
                        "catalog returns for the given temporal/cloud/"
                        "day-night query — the reference's search stage "
                        "(core/searcher.py) ahead of processing")
    p.add_argument("--catalog-day-night", default="day",
                   help="Catalog day_night_flag (reference pins 'day')")
    p.add_argument("--cloud-cover", type=float, default=30.0,
                   help="Max contamination %% per granule (reference --cloud-cover)")
    p.add_argument("--disable-quality-filter", action="store_true",
                   help="Skip the timestamp quality filter (reference flag)")
    p.add_argument("--no-merge-same-day", action="store_true",
                   help="Keep same-day granules separate (skip A3 merge)")
    p.add_argument("--no-detect", action="store_true", help="Skip event detection")
    p.add_argument("--only-export", action="store_true",
                   help="ONLY export GeoTIFFs from an existing cube (do not process)")
    p.add_argument("--export-geotiff", action="store_true",
                   help="Export per-date GeoTIFFs after processing")
    p.add_argument("--geotiff-dir", help="GeoTIFF dir (default: <output>/geotiffs)")
    p.add_argument("--downsample", type=int, default=1,
                   help="Downsample factor for GeoTIFFs (1=original, 2=half)")
    p.add_argument("--export-netcdf", action="store_true",
                   help="Export the cube as per-date NetCDF files after processing "
                        "(reference pipeline.py:174-177 interop)")
    p.add_argument("--netcdf-dir", help="NetCDF dir (default: <output>/netcdf)")
    p.add_argument("--cache-dir",
                   help="Granule cache (reference --cache-dir): pixels are cached "
                        "per (tile_id, date); a rerun anti-joins the cache index "
                        "and processes only uncached granules (J5)")
    p.add_argument("--keep-cache", action="store_true",
                   help="Keep the cache after processing (reference flag; without "
                        "it a --cache-dir is scratch space, removed at the end)")
    p.add_argument("--cpus", help="local[N] cores (default: $SPARK_GRAFT_CPUS or *)")
    return p


def _export(spark, cube_path: str, args) -> dict:
    from bloomy_etl_spark.sinks.geotiff import export_geotiff

    gt_dir = args.geotiff_dir or f"{args.output}/geotiffs"
    cube = spark.read.parquet(cube_path)
    manifest = export_geotiff(cube, gt_dir, downsample=args.downsample)
    n = manifest.count()
    return {"geotiff_dir": gt_dir, "n_rasters": n}


def main(argv: list[str] | None = None) -> dict:
    """Run the CLI; returns the summary dict (also printed as JSON)."""
    args = _build_parser().parse_args(argv)

    from pyspark.sql import functions as F

    from bloomy_etl_spark import get_spark
    from bloomy_etl_spark.functions.indices import DEFAULT_QUALITY
    from bloomy_etl_spark.operators.bloomy_queries import synthetic_pixels
    from bloomy_etl_spark.pipeline import run_pipeline, write_outputs

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark(app_name="bloomy-etl-cli", master=master)

    cube_path = f"{args.output}/cube"
    if args.only_export:
        # reference main.py:57-89: export an existing cube without processing
        summary = {"mode": "export-only", **_export(spark, cube_path, args)}
        print(json.dumps(summary))
        return summary

    if args.pixels:
        px = spark.read.parquet(args.pixels)
    else:
        px = synthetic_pixels(spark, args.sf_dir)
    if args.start:
        px = px.filter(F.col("time") >= F.lit(args.start).cast("timestamp"))
    if args.end:
        # inclusive end-date, as the reference's CMR temporal range is
        px = px.filter(F.to_date("time") <= F.lit(args.end).cast("date"))

    catalog_stats = {}
    if args.catalog_endpoint:
        # The reference's entry point searches the catalog FIRST and
        # processes only matching granules (pipeline.py:137-146). Here:
        # query the catalog source (temporal/cloud/day-night predicates
        # pushed to the server), reduce to the matched DATE set (tiny),
        # and semi-join the pixel stream on it.
        from bloomy_etl_spark.sources.catalog import GranuleCatalogDataSource

        spark.dataSource.register(GranuleCatalogDataSource)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        cat = (
            spark.read.format("granule_catalog")
            .option("endpoint", args.catalog_endpoint)
            .load()
            .filter(F.col("cloud_cover") <= args.cloud_cover)
            .filter(F.col("day_night") == args.catalog_day_night)
        )
        if args.start:
            cat = cat.filter(F.col("datetime") >= args.start)
        if args.end:  # inclusive end date over ISO-8601 strings
            cat = cat.filter(F.col("datetime") <= args.end + "T23:59:59Z")
        # Collect the (tiny) matched date set ONCE: Python DataSource
        # reads aren't cached, so count() + a later join would each
        # re-execute the full paged HTTP read (token + count + pages,
        # twice). One driver-side collect, then a literal-backed
        # broadcast semi-join.
        date_rows = [
            r["cat_date"]
            for r in cat.select(
                F.to_date("datetime").alias("cat_date")
            ).distinct().collect()
        ]
        dates = spark.createDataFrame(
            [(d,) for d in date_rows], "cat_date date"
        )
        px = px.join(
            F.broadcast(dates),
            F.to_date(px.time) == F.col("cat_date"),
            "left_semi",
        )
        catalog_stats = {
            "catalog_endpoint": args.catalog_endpoint,
            "catalog_dates": len(date_rows),
        }

    cache_stats = {}
    if args.cache_dir:
        # Granule cache (reference processor.py:49-53, 342-367 as S5/S6 +
        # J5): append only the granules whose (tile_id, date) is not yet
        # cached, then feed the pipeline from the cache — a rerun over an
        # extended date range reprocesses nothing it already has.
        import os

        from bloomy_etl_spark.sinks.writers import write_cache_partition

        if os.path.isdir(args.cache_dir) and any(
            f.startswith("tile_id=") for f in os.listdir(args.cache_dir)
        ):
            idx = spark.read.parquet(args.cache_dir).select("tile_id", "date").distinct()
            fresh = px.join(
                idx,
                (px.tile_id == idx.tile_id) & (F.to_date(px.time) == idx.date),
                "left_anti",
            )
        else:
            fresh = px
        n_fresh = fresh.count()
        if n_fresh:
            write_cache_partition(fresh, args.cache_dir)
        if not os.path.isdir(args.cache_dir):
            # nothing selected AND nothing previously cached: the cache
            # dir was never created — reading it back would crash; keep
            # the (empty) pixel selection and proceed to an empty summary
            cache_stats = {"cache_dir": args.cache_dir, "granule_rows_added": 0}
            px = px.limit(0)
        else:
            cached = spark.read.parquet(args.cache_dir).drop("date")
            if args.start:
                cached = cached.filter(
                    F.col("time") >= F.lit(args.start).cast("timestamp")
                )
            if args.end:
                cached = cached.filter(
                    F.to_date("time") <= F.lit(args.end).cast("date")
                )
            px = cached
            cache_stats = {
                "cache_dir": args.cache_dir, "granule_rows_added": n_fresh
            }

    q = replace(DEFAULT_QUALITY, contamination_reject=args.cloud_cover)
    result = run_pipeline(
        px,
        q=q,
        disable_quality_filter=args.disable_quality_filter,
        merge_same_day=not args.no_merge_same_day,
        detect=not args.no_detect,
    )
    paths = write_outputs(result, args.output)
    summary = {
        "mode": "process",
        "granules_kept": result.kept_stats.count(),
        "cube_rows": spark.read.parquet(paths["cube"]).count(),
        "n_events": result.events.count() if not args.no_detect else 0,
        "paths": paths,
        **catalog_stats,
        **cache_stats,
    }
    if args.export_geotiff:
        summary.update(_export(spark, paths["cube"], args))
    if args.export_netcdf:
        from bloomy_etl_spark.sinks.netcdf import export_netcdf

        nc_dir = args.netcdf_dir or f"{args.output}/netcdf"
        manifest = export_netcdf(spark.read.parquet(paths["cube"]), nc_dir)
        summary.update({"netcdf_dir": nc_dir, "n_netcdf": manifest.count()})
    if args.cache_dir and not args.keep_cache:
        # reference pipeline.py:178-182: the cache is scratch unless kept
        import shutil

        shutil.rmtree(args.cache_dir, ignore_errors=True)
        summary["cache_removed"] = True
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
