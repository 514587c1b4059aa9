"""Executed-plan profiler (tools/profile.py): harvested SQLMetrics
match ground truth the test can compute independently — real shuffle
bytes on real shuffles, zero on pure projections, scan file counts that
see partition pruning, and correct root output rows — all without any
row reaching the driver."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloomy_etl_spark.sources.tables import load_table
from bloomy_etl_spark.tools.profile import profile_report, run_profile
from tests.conftest import SF_SMOKE


def test_aggregate_metrics_match_ground_truth(spark):
    df = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    p = run_profile(df)
    assert p["output_rows"] == df.count()
    assert p["exchanges"] >= 1
    assert p["shuffle_bytes_written"] > 0
    assert p["shuffle_records_written"] >= p["output_rows"]
    assert p["spill_bytes"] == 0  # fixture-sized aggregate must not spill
    # the scan is visible with its real file count
    assert p["scans"] and all(s["numFiles"] >= 1 for s in p["scans"])


def test_pure_projection_has_no_shuffle(spark):
    df = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("x")
    )
    p = run_profile(df)
    assert p["exchanges"] == 0
    assert p["shuffle_bytes_written"] == 0
    assert p["output_rows"] == df.count()


def test_join_profile_sees_both_scans_and_report_renders(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    p = run_profile(df)
    assert len(p["scans"]) == 2
    rep = profile_report(p)
    assert "output_rows=" in rep and "Scan parquet" in rep
    # every node line is indented by its depth (tree shape preserved)
    assert any(line.startswith("  ") for line in rep.splitlines()[1:])


def test_pruned_scan_reads_fewer_files_than_full(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "p_date", F.to_date("ts")
    )
    path = str(tmp_path / "part")
    ev.write.partitionBy("p_date").parquet(path)
    full = run_profile(spark.read.parquet(path))
    one_day = spark.read.parquet(path).filter(
        F.col("p_date") == F.lit("2024-01-10")
    )
    pruned = run_profile(one_day)
    f_full = sum(s.get("numFiles", 0) for s in full["scans"])
    f_pruned = sum(s.get("numFiles", 0) for s in pruned["scans"])
    assert 0 < f_pruned < f_full
    assert pruned["output_rows"] == one_day.count()


def test_repeat_profile_is_idempotent(spark):
    """Metrics reset per run: profiling the same DataFrame object twice
    must not report doubled counts."""
    df = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = run_profile(df)
    b = run_profile(df)
    assert a["output_rows"] == b["output_rows"] == df.count()
    assert b["spill_bytes"] == a["spill_bytes"] == 0


def test_row_changing_root_without_metric_reports_none(spark):
    """A limit root has no numOutputRows metric; the profiler must say
    'unknown' (None), never a deeper node's pre-limit count."""
    df = load_table(spark, SF_SMOKE, "orders").limit(10)
    p = run_profile(df)
    assert p["output_rows"] is None or p["output_rows"] == 10
