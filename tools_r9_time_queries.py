#!/usr/bin/env python
"""Time individual declared queries in isolation (min-of-N, noop sink).

Usage: python tools_r9_time_queries.py q111_jl_projection_topk q126_ann_recall ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), BENCH_RUNS (default 5).
Prints one line per query: name, min, median, all samples.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "5"))


def main() -> None:
    names = sys.argv[1:]
    from bloomy_etl_spark import get_spark
    from __spark_entry__ import queries

    spark = get_spark(app_name="r9-time")
    qmap = queries()
    # warm the JVM on the first requested query (discarded)
    qmap[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for name in names:
        spark.sparkContext.setJobDescription(name)
        samples = []
        for _ in range(RUNS):
            df = qmap[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: min={min(samples):.3f} med={statistics.median(samples):.3f} "
              f"samples={[round(s, 3) for s in samples]}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
