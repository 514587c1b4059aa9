#!/usr/bin/env python
"""Interleaved-bisect timer (VERDICT r09 item 3): time a list of declared
queries in a GIVEN repo tree — min-of-N after a warm-up, exec-only timer
(t0 after construction) so numbers are apples-to-apples with the r8/r9
recorded bench figures the bisect is adjudicating.

Usage: python tools_r10_bisect.py <repo_dir> q100_hist_quantiles ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     BENCH_RUNS (default 5).
Prints one line per query: name, min, median, all samples.

The interleave itself is driven from a shell loop — fresh process per
(tree, round), alternating trees, two full rounds, per the r8 dedup
bisect protocol in BENCH_NOTES.md.
"""
from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "5"))

    from bloomy_etl_spark import get_spark  # noqa: E402 — repo path set above
    from __spark_entry__ import queries  # noqa: E402

    spark = get_spark(app_name="r10-bisect")
    qmap = queries()
    # warm the JVM on the first requested query (discarded)
    qmap[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        spark.sparkContext.setJobDescription(name)
        samples = []
        for _ in range(runs):
            df = qmap[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(samples):.3f} med={statistics.median(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
