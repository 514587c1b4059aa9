"""Oracle-checked queries for the reference-semantics pixel pipeline.

The driver fixtures carry no raster table, so these queries derive a
deterministic pixel table from ``events`` with pure integer arithmetic
(identical in Spark and DuckDB) and then run the *real* operator library —
mask stack, granule stats/gates, quality filter, two-stage merge, event
detection — against a full SQL translation as the DuckDB oracle.

This puts the whole reference capability surface
(``/root/reference/core/processor.py:258-301``, ``core/quality.py``,
``core/merger.py``) under the driver's hash-match gate, not just golden
unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloomy_etl_spark.functions.indices import with_indices, with_masks
from bloomy_etl_spark.operators.events import detect_events
from bloomy_etl_spark.operators.merge import merge_all
from bloomy_etl_spark.operators.quality import (
    apply_granule_gates,
    filter_timestamps,
    granule_stats,
)
from bloomy_etl_spark.sources.tables import load_table
from bloomy_etl_spark.output import presentation_sort as _psort


def synthetic_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → pixel table (tile_id, time, y, x, red, nir, blue, fmask).

    Integer-modulo band synthesis so both engines compute bit-identical
    inputs; NULL bands on a 1/17 stride model outside-AOI pixels.
    """
    ev = load_table(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    return ev.select(
        F.concat(F.lit("T"), (uid % 3).cast("string")).alias("tile_id"),
        F.date_trunc("hour", F.col("ts")).alias("time"),
        (uid % 8).cast("int").alias("y"),
        (eid % 8).cast("int").alias("x"),
        F.when(eid % 17 != 0, ((eid * 37) % 12000).cast("double")).alias("red"),
        F.when(eid % 17 != 0, ((eid * 53 + uid) % 12000).cast("double")).alias("nir"),
        F.when(eid % 19 != 0, ((eid * 13) % 3000).cast("double")).alias("blue"),
        (eid % 11).cast("int").alias("fmask"),
    )


# Shared SQL CTEs translating the pixel derivation + mask stack + indices.
_PIXELS_CTE = """
pixels AS (
    SELECT CONCAT('T', CAST(user_id % 3 AS VARCHAR)) AS tile_id,
           DATE_TRUNC('hour', ts) AS time,
           CAST(user_id % 8 AS INT) AS y,
           CAST(event_id % 8 AS INT) AS x,
           CASE WHEN event_id % 17 <> 0
                THEN CAST((event_id * 37) % 12000 AS DOUBLE) END AS red,
           CASE WHEN event_id % 17 <> 0
                THEN CAST((event_id * 53 + user_id) % 12000 AS DOUBLE) END AS nir,
           CASE WHEN event_id % 19 <> 0
                THEN CAST((event_id * 13) % 3000 AS DOUBLE) END AS blue,
           CAST(event_id % 11 AS INT) AS fmask
    FROM events
)
"""

_MASKED_CTE = """
masked AS (
    SELECT *,
           (outside OR cloud_shadow OR anomaly_low OR anomaly_high
            OR haze OR invalid_ndvi) AS mask
    FROM (
        SELECT *,
               ((prelim > 0.95 OR prelim < -0.5) AND NOT outside) AS invalid_ndvi
        FROM (
            SELECT *,
                   (red IS NULL OR nir IS NULL OR blue IS NULL) AS outside,
                   (COALESCE(fmask, 255) IN (2, 4)
                    AND NOT (red IS NULL OR nir IS NULL OR blue IS NULL)) AS cloud_shadow,
                   (COALESCE(red < 100 OR nir < 100, FALSE)
                    AND NOT (red IS NULL OR nir IS NULL OR blue IS NULL)) AS anomaly_low,
                   (COALESCE(red > 10000 OR nir > 10000, FALSE)
                    AND NOT (red IS NULL OR nir IS NULL OR blue IS NULL)) AS anomaly_high,
                   (COALESCE(blue > 1500, FALSE)
                    AND NOT (red IS NULL OR nir IS NULL OR blue IS NULL)) AS haze,
                   (nir - red) / (nir + red + 1e-6) AS prelim
            FROM pixels
        ) m1
    ) m2
)
"""

_INDEXED_CTE = """
indexed AS (
    SELECT tile_id, time, y, x, mask,
           CASE WHEN NOT mask
                THEN GREATEST(-1.0, LEAST(1.0, (nir - red) / (nir + red + 1e-6))) END AS ndvi,
           CASE WHEN NOT mask
                THEN GREATEST(-3.0, LEAST(3.0,
                     2.5 * (nir - red) / (nir + 6 * red - 7.5 * blue + 1))) END AS evi
    FROM masked
)
"""

_STATS_CTE = """
stats AS (
    SELECT tile_id, time,
           COUNT(*) AS total_px,
           COUNT(*) - COUNT(CASE WHEN mask THEN 1 END) AS valid_px,
           CAST(COUNT(*) - COUNT(CASE WHEN mask THEN 1 END) AS DOUBLE)
               / COUNT(*) * 100.0 AS valid_pixels_pct,
           CAST(COUNT(CASE WHEN haze THEN 1 END)
                + COUNT(CASE WHEN anomaly_low OR anomaly_high THEN 1 END)
                + COUNT(CASE WHEN invalid_ndvi THEN 1 END) AS DOUBLE)
               / COUNT(*) * 100.0 AS contamination_pct,
           AVG(CASE WHEN NOT mask
                    THEN GREATEST(-1.0, LEAST(1.0, (nir - red) / (nir + red + 1e-6))) END) AS ndvi_mean,
           STDDEV_POP(CASE WHEN NOT mask
                    THEN GREATEST(-1.0, LEAST(1.0, (nir - red) / (nir + red + 1e-6))) END) AS ndvi_std
    FROM masked
    GROUP BY tile_id, time
)
"""


def _rounded_stats(stats: DataFrame) -> DataFrame:
    return stats.select(
        "tile_id",
        "time",
        "total_px",
        "valid_px",
        F.round("valid_pixels_pct", 4).alias("valid_pixels_pct"),
        F.round("contamination_pct", 4).alias("contamination_pct"),
        F.round("ndvi_mean", 4).alias("ndvi_mean"),
        F.round("ndvi_std", 4).alias("ndvi_std"),
    ).transform(_psort, "tile_id", "time")


def q21_bloomy_granule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask stack F6-F11 + per-granule aggregates A1/A2 (processor.py:258-272)."""
    px = with_indices(with_masks(synthetic_pixels(spark, sf_dir)))
    return _rounded_stats(granule_stats(px))


def q22_bloomy_granule_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granule accept gates F12/F13 (processor.py:280-292)."""
    px = with_indices(with_masks(synthetic_pixels(spark, sf_dir)))
    return _rounded_stats(apply_granule_gates(granule_stats(px)))


def q23_bloomy_merged_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage spatial+temporal merge J2/A3/A4 (merger.py:16-93),
    checksummed per day for the cross-engine hash."""
    px = with_indices(with_masks(synthetic_pixels(spark, sf_dir)))
    # track_tiles=False: the summary drops tile bookkeeping, so skip the
    # per-group string-set aggregation in the spatial merge
    cube = merge_all(
        px.filter(~F.col("mask")).select("tile_id", "time", "y", "x", "ndvi", "evi"),
        track_tiles=False,
    )
    return (
        cube.groupBy(F.to_date("time").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.round(F.sum("ndvi"), 4).alias("sum_ndvi"),
            F.round(F.sum("evi"), 4).alias("sum_evi"),
            F.max("num_granules_merged").alias("n_granules"),
        )
        .transform(_psort, "day")
    )


def q24_bloomy_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp quality filter F14/F15 (quality.py:17-96) over the derived
    granule-stats series; returns the kept granules."""
    px = with_indices(with_masks(synthetic_pixels(spark, sf_dir)))
    flagged = filter_timestamps(granule_stats(px))
    return (
        flagged.filter(~F.col("rejected"))
        .select(
            "tile_id",
            "time",
            F.round("valid_pixels_pct", 4).alias("valid_pixels_pct"),
            F.round("contamination_pct", 4).alias("contamination_pct"),
        )
        .transform(_psort, "tile_id", "time")
    )


def q25_bloomy_event_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event detector W1-W3 (quality.py:105-181) over a day-factored series
    derived from the merged cube (factors inject drops/recoveries so every
    event branch fires on the fixtures)."""
    px = with_indices(with_masks(synthetic_pixels(spark, sf_dir)))
    cube = merge_all(
        px.filter(~F.col("mask")).select("tile_id", "time", "y", "x", "ndvi", "evi"),
        track_tiles=False,
    )
    daily = cube.groupBy(F.to_date("time").alias("day")).agg(F.avg("ndvi").alias("raw"))
    dom = F.dayofmonth("day")
    factor = (
        F.when(dom == 12, 0.2)
        .when(dom.isin(20, 21, 22), 0.15)
        .when(dom == 30, 0.25)
        .otherwise(1.0)
    )
    series = daily.select(
        F.col("day").cast("timestamp").alias("time"),
        F.date_format("day", "yyyy-MM-dd").alias("date"),
        (F.lit(0.6) * factor + F.lit(0.05) * F.col("raw")).alias("v"),
    )
    ev = detect_events(series)
    return ev.select(
        "event_kind",
        "date",
        "start_date",
        "end_date",
        F.round("ndvi_before", 4).alias("ndvi_before"),
        F.round("ndvi_during", 4).alias("ndvi_during"),
        F.round("ndvi_after", 4).alias("ndvi_after"),
        F.round("drop_mag", 4).alias("drop_mag"),
        F.round("ndvi_sustained", 4).alias("ndvi_sustained"),
        "event_type",
    ).transform(_psort, "event_kind", F.coalesce("date", "end_date"))


def q38_bloomy_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE pipeline in one call (pipeline.run_pipeline — reference
    ``core/pipeline.py:93-183``): mask/indices → granule stats → gates →
    timestamp quality filter → kept-granule semi-join → two-stage merge,
    summarized per day with the day's surviving-granule count. This is
    the composition check: every stage already passes alone (q21–q25);
    here the hash covers their interaction order."""
    from bloomy_etl_spark.pipeline import run_pipeline

    # carry_kept_day_count annotates the cube rows with the day's
    # surviving-granule count instead of re-aggregating kept_stats in a
    # second subtree — the old join-back shape re-executed the whole
    # scan→stats chain (3 scans; column pruning defeats exchange reuse)
    res = run_pipeline(
        synthetic_pixels(spark, sf_dir), detect=False, carry_kept_day_count=True
    )
    return (
        res.cube.groupBy(F.to_date("time").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.round(F.sum("ndvi"), 4).alias("sum_ndvi"),
            F.round(F.sum("evi"), 4).alias("sum_evi"),
            F.max("num_granules_merged").alias("n_granules"),
            F.max("n_kept_granules").alias("n_kept_granules"),
        )
        .transform(_psort, "day")
    )


def q58_warp_to_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 reproject+resample under the hash gate: build one dense 8×8
    raster per tile from the events-derived pixel means (missing cells →
    −9999 nodata, the reference's nodata value), warp every tile onto a
    shared destination grid offset by half a pixel (``dst_transform``
    [1,0,0.5,0,−1,−0.5] vs source [1,0,0,0,−1,0]) with BILINEAR
    resampling — each output pixel is the nodata-excluding, weight-
    renormalized mean of its 2×2 source neighborhood, exactly the
    semantics of ``rasterio.warp.reproject`` with src_nodata
    (reference ``core/processor.py:205-216``) — then explode back to
    pixels. The half-pixel offset makes every bilinear weight exactly
    0.25, so the DuckDB oracle replays the warp as a 4-neighborhood
    AVG with no float-order ambiguity."""
    from bloomy_etl_spark.operators.raster import tiles_to_pixels, warp_to_grid

    px = synthetic_pixels(spark, sf_dir)
    # integer-valued cell sums, NOT 4dp-rounded means: quarters/thirds of
    # exact-integer doubles round identically in any summation order, so
    # the blended output is bit-stable across engines (a rounded-mean
    # input lands the blend on x.xxxx5 ties where the two engines' sum
    # orders disagree by 1 ulp — measured 9/147 rows at sf0.01)
    means = px.groupBy("tile_id", "y", "x").agg(F.sum("red").alias("v"))
    # densify: every (tile, pos 0..63) cell, absent means -> nodata
    full = (
        means.select("tile_id").distinct()
        .select("tile_id", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("pos"))
    )
    filled = full.join(
        means.select(
            "tile_id", (F.col("y") * 8 + F.col("x")).alias("pos"), "v"
        ),
        ["tile_id", "pos"],
        "left",
    )
    tiles = (
        filled.groupBy("tile_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("pos"),
                            F.coalesce("v", F.lit(-9999.0)).alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ).alias("data")
        )
        .select(
            "tile_id",
            F.lit("red").alias("band"),
            F.lit(8).alias("h"),
            F.lit(8).alias("w"),
            F.array(*[F.lit(float(t)) for t in (1, 0, 0, 0, -1, 0)]).alias(
                "transform"
            ),
            F.lit("EPSG:4326").alias("crs"),
            "data",
        )
    )
    warped = warp_to_grid(
        tiles,
        dst_transform=[1.0, 0.0, 0.5, 0.0, -1.0, -0.5],
        dst_width=7,
        dst_height=7,
        engine="numpy",
        resampling="bilinear",
        src_nodata=-9999.0,
    )
    return (
        tiles_to_pixels(warped)
        .select("tile_id", "y", "x", F.round("value", 4).alias("value"))
        .transform(_psort, "tile_id", "y", "x")
    )


BLOOMY_QUERIES = {
    "q21_bloomy_granule_stats": q21_bloomy_granule_stats,
    "q22_bloomy_granule_gates": q22_bloomy_granule_gates,
    "q23_bloomy_merged_cube": q23_bloomy_merged_cube,
    "q24_bloomy_quality_filter": q24_bloomy_quality_filter,
    "q25_bloomy_event_detection": q25_bloomy_event_detection,
    "q38_bloomy_end_to_end": q38_bloomy_end_to_end,
    "q58_warp_to_grid": q58_warp_to_grid,
}


_ROUNDED_STATS_SELECT = """
    SELECT tile_id, time, total_px, valid_px,
           ROUND(valid_pixels_pct, 4) AS valid_pixels_pct,
           ROUND(contamination_pct, 4) AS contamination_pct,
           ROUND(ndvi_mean, 4) AS ndvi_mean,
           ROUND(ndvi_std, 4) AS ndvi_std
"""

_MERGE_CTES = """
spatial AS (
    SELECT time, y, x, AVG(ndvi) AS ndvi, AVG(evi) AS evi
    FROM indexed WHERE NOT mask
    GROUP BY time, y, x
),
temporal AS (
    SELECT CAST(time AS DATE) AS day, y, x, AVG(ndvi) AS ndvi, AVG(evi) AS evi
    FROM spatial
    GROUP BY 1, y, x
),
granules_per_day AS (
    SELECT day, COUNT(*) AS n_granules FROM (
        SELECT DISTINCT CAST(time AS DATE) AS day, time FROM spatial
    ) g GROUP BY day
)
"""

BLOOMY_ORACLE_SQL = {
    "q21_bloomy_granule_stats": f"""
        WITH {_PIXELS_CTE.strip().rstrip()}, {_MASKED_CTE.strip()}, {_STATS_CTE.strip()}
        {_ROUNDED_STATS_SELECT}
        FROM stats ORDER BY tile_id, time
    """,
    "q22_bloomy_granule_gates": f"""
        WITH {_PIXELS_CTE.strip()}, {_MASKED_CTE.strip()}, {_STATS_CTE.strip()}
        {_ROUNDED_STATS_SELECT}
        FROM stats
        WHERE contamination_pct <= 30.0 AND valid_px >= total_px * 0.10
        ORDER BY tile_id, time
    """,
    "q23_bloomy_merged_cube": f"""
        WITH {_PIXELS_CTE.strip()}, {_MASKED_CTE.strip()}, {_INDEXED_CTE.strip()},
        {_MERGE_CTES.strip()}
        SELECT t.day, COUNT(*) AS n_px,
               ROUND(SUM(t.ndvi), 4) AS sum_ndvi,
               ROUND(SUM(t.evi), 4) AS sum_evi,
               MAX(g.n_granules) AS n_granules
        FROM temporal t JOIN granules_per_day g ON t.day = g.day
        GROUP BY t.day
        ORDER BY t.day
    """,
    "q24_bloomy_quality_filter": f"""
        WITH {_PIXELS_CTE.strip()}, {_MASKED_CTE.strip()}, {_STATS_CTE.strip()},
        w AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY time, tile_id) AS rn,
                   COUNT(*) OVER () AS n,
                   LAG(ndvi_mean) OVER (ORDER BY time, tile_id) AS prev_mean,
                   LEAD(ndvi_mean) OVER (ORDER BY time, tile_id) AS next_mean
            FROM stats
        ),
        decided AS (
            SELECT *,
                   CASE WHEN rn > 1 AND rn < n THEN (prev_mean + next_mean) / 2.0
                        WHEN rn > 1 THEN prev_mean
                        WHEN rn < n THEN next_mean END AS avg_neighbor
            FROM w
        ),
        flagged AS (
            SELECT *,
                   CASE
                     WHEN n < 3 THEN FALSE
                     WHEN valid_pixels_pct < 20.0 THEN TRUE
                     WHEN contamination_pct > 30.0 THEN TRUE
                     WHEN contamination_pct > 20.0
                          OR (ndvi_mean < 0.15 AND ndvi_std > 0.3) THEN
                       CASE
                         WHEN (avg_neighbor - ndvi_mean) > 0.3 THEN
                           COALESCE(rn < n AND (next_mean - ndvi_mean) > 0.2, FALSE)
                         ELSE
                           (rn > 1 OR rn < n)
                           AND NOT COALESCE((avg_neighbor - ndvi_mean) > 0.3, FALSE)
                           AND contamination_pct > 25.0
                       END
                     ELSE FALSE
                   END AS rejected
            FROM decided
        )
        SELECT tile_id, time,
               ROUND(valid_pixels_pct, 4) AS valid_pixels_pct,
               ROUND(contamination_pct, 4) AS contamination_pct
        FROM flagged
        WHERE NOT COALESCE(rejected, FALSE)
        ORDER BY tile_id, time
    """,
    "q38_bloomy_end_to_end": f"""
        WITH {_PIXELS_CTE.strip()}, {_MASKED_CTE.strip()}, {_STATS_CTE.strip()},
        gated AS (
            SELECT * FROM stats
            WHERE contamination_pct <= 30.0 AND valid_px >= total_px * 0.10
        ),
        w AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY time, tile_id) AS rn,
                   COUNT(*) OVER () AS n,
                   LAG(ndvi_mean) OVER (ORDER BY time, tile_id) AS prev_mean,
                   LEAD(ndvi_mean) OVER (ORDER BY time, tile_id) AS next_mean
            FROM gated
        ),
        decided AS (
            SELECT *,
                   CASE WHEN rn > 1 AND rn < n THEN (prev_mean + next_mean) / 2.0
                        WHEN rn > 1 THEN prev_mean
                        WHEN rn < n THEN next_mean END AS avg_neighbor
            FROM w
        ),
        flagged AS (
            SELECT *,
                   CASE
                     WHEN n < 3 THEN FALSE
                     WHEN valid_pixels_pct < 20.0 THEN TRUE
                     WHEN contamination_pct > 30.0 THEN TRUE
                     WHEN contamination_pct > 20.0
                          OR (ndvi_mean < 0.15 AND ndvi_std > 0.3) THEN
                       CASE
                         WHEN (avg_neighbor - ndvi_mean) > 0.3 THEN
                           COALESCE(rn < n AND (next_mean - ndvi_mean) > 0.2, FALSE)
                         ELSE
                           (rn > 1 OR rn < n)
                           AND NOT COALESCE((avg_neighbor - ndvi_mean) > 0.3, FALSE)
                           AND contamination_pct > 25.0
                       END
                     ELSE FALSE
                   END AS rejected
            FROM decided
        ),
        kept AS (
            SELECT tile_id, time FROM flagged
            WHERE NOT COALESCE(rejected, FALSE)
        ),
        {_INDEXED_CTE.strip()},
        spatial AS (
            SELECT i.time, i.y, i.x, AVG(i.ndvi) AS ndvi, AVG(i.evi) AS evi
            FROM indexed i JOIN kept k
              ON i.tile_id = k.tile_id AND i.time = k.time
            WHERE NOT i.mask
            GROUP BY i.time, i.y, i.x
        ),
        temporal AS (
            SELECT CAST(time AS DATE) AS day, y, x,
                   AVG(ndvi) AS ndvi, AVG(evi) AS evi
            FROM spatial GROUP BY 1, y, x
        ),
        granules_per_day AS (
            SELECT day, COUNT(*) AS n_granules FROM (
                SELECT DISTINCT CAST(time AS DATE) AS day, time FROM spatial
            ) g GROUP BY day
        ),
        kept_per_day AS (
            SELECT CAST(time AS DATE) AS day, COUNT(*) AS n_kept_granules
            FROM kept GROUP BY 1
        )
        SELECT t.day, COUNT(*) AS n_px,
               ROUND(SUM(t.ndvi), 4) AS sum_ndvi,
               ROUND(SUM(t.evi), 4) AS sum_evi,
               MAX(g.n_granules) AS n_granules,
               MAX(k.n_kept_granules) AS n_kept_granules
        FROM temporal t
        JOIN granules_per_day g ON t.day = g.day
        JOIN kept_per_day k ON t.day = k.day
        GROUP BY t.day
        ORDER BY t.day
    """,
    "q25_bloomy_event_detection": f"""
        WITH {_PIXELS_CTE.strip()}, {_MASKED_CTE.strip()}, {_INDEXED_CTE.strip()},
        {_MERGE_CTES.strip()},
        daily AS (
            SELECT t.day, AVG(t.ndvi) AS raw FROM temporal t GROUP BY t.day
        ),
        series AS (
            SELECT day,
                   STRFTIME(day, '%Y-%m-%d') AS date,
                   0.6 * (CASE WHEN EXTRACT(DAY FROM day) = 12 THEN 0.2
                               WHEN EXTRACT(DAY FROM day) IN (20, 21, 22) THEN 0.15
                               WHEN EXTRACT(DAY FROM day) = 30 THEN 0.25
                               ELSE 1.0 END)
                   + 0.05 * raw AS v
            FROM daily
        ),
        x AS (
            SELECT date, v,
                   LAG(v) OVER (ORDER BY day) AS v_prev,
                   LEAD(v) OVER (ORDER BY day) AS v_next,
                   LAG(date, 2) OVER (ORDER BY day) AS date_m2,
                   LAG(v, 3) OVER (ORDER BY day) AS v_m3,
                   MAX(v) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3,
                   AVG(v) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3,
                   COUNT(v) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt3,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   COUNT(*) OVER () AS n
            FROM series
        ),
        unioned AS (
            SELECT 'anomaly' AS event_kind, date,
                   CAST(NULL AS VARCHAR) AS start_date, CAST(NULL AS VARCHAR) AS end_date,
                   v_prev AS ndvi_before, v AS ndvi_during, v_next AS ndvi_after,
                   CAST(NULL AS DOUBLE) AS drop_mag, CAST(NULL AS DOUBLE) AS ndvi_sustained,
                   'transient_anomaly' AS event_type
            FROM x
            WHERE (v - v_prev) < -0.3 AND rn < n AND (v_next - v) > 0.2
            UNION ALL
            SELECT 'abrupt_drop', date, NULL, NULL,
                   v_prev, CAST(NULL AS DOUBLE), v,
                   ABS(v - v_prev), CAST(NULL AS DOUBLE),
                   CASE WHEN rn = n THEN 'recent_event' ELSE 'possible_fire_or_harvest' END
            FROM x
            WHERE (v - v_prev) < -0.3
              AND (rn = n OR NOT COALESCE((v_next - v) > 0.2, FALSE))
            UNION ALL
            SELECT 'sustained_change', CAST(NULL AS VARCHAR), date_m2, date,
                   v_m3, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS DOUBLE), avg3, 'sustained_change'
            FROM x
            WHERE cnt3 = 3 AND max3 < 0.3 AND v_m3 > 0.5
        )
        SELECT event_kind, date, start_date, end_date,
               ROUND(ndvi_before, 4) AS ndvi_before,
               ROUND(ndvi_during, 4) AS ndvi_during,
               ROUND(ndvi_after, 4) AS ndvi_after,
               ROUND(drop_mag, 4) AS drop_mag,
               ROUND(ndvi_sustained, 4) AS ndvi_sustained,
               event_type
        FROM unioned
        ORDER BY event_kind, COALESCE(date, end_date)
    """,
    # q58: replay the bilinear warp. With the half-pixel dst offset every
    # output pixel's four bilinear weights are exactly 0.25, so the
    # nodata-excluding renormalized blend is a plain AVG over the present
    # 2x2 neighborhood cells (AVG skips the left-join NULLs = weight
    # renormalization; an all-missing neighborhood averages to NULL =
    # dst_nodata).
    "q58_warp_to_grid": f"""
        WITH {_PIXELS_CTE.strip()},
        means AS (
            SELECT tile_id, y, x, SUM(red) AS v
            FROM pixels WHERE red IS NOT NULL
            GROUP BY tile_id, y, x
        ),
        tiles AS (SELECT DISTINCT tile_id FROM pixels),
        dst AS (
            SELECT g.tile_id, rr.r AS y, cc.c AS x,
                   ROUND(AVG(m.v), 4) AS value
            FROM tiles g
            CROSS JOIN range(7) rr(r)
            CROSS JOIN range(7) cc(c)
            LEFT JOIN means m
              ON m.tile_id = g.tile_id
             AND m.y BETWEEN rr.r AND rr.r + 1
             AND m.x BETWEEN cc.c AND cc.c + 1
            GROUP BY g.tile_id, rr.r, cc.c
        )
        SELECT tile_id, CAST(y AS INT) AS y, CAST(x AS INT) AS x, value
        FROM dst ORDER BY tile_id, y, x
    """,
}
