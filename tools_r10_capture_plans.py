#!/usr/bin/env python
"""Capture .explain('formatted') for declared queries into plans/r10/.

Usage: python tools_r10_capture_plans.py <repo_dir> <suffix> [only_names...]
Writes /root/repo/plans/r10/<name>_<suffix>.txt — pass the round-9 tree
(a git worktree of the pre-r10 commit) with suffix 'before' and the live
tree with suffix 'after'. Also writes a one-line-per-query node-count
summary to /tmp/plan_summary_r10_<suffix>.tsv.
"""
from __future__ import annotations

import os
import re
import sys


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bloomy_etl_spark import get_spark  # noqa: E402
    from __spark_entry__ import queries  # noqa: E402

    spark = get_spark(app_name="r10-plan-capture")
    qmap = queries()
    outdir = "/root/repo/plans/r10"
    os.makedirs(outdir, exist_ok=True)
    rows = []
    for name in sorted(qmap):
        if only and name not in only:
            continue
        try:
            df = qmap[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_shj = len(re.findall(r"ShuffledHashJoin", plan))
        n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan))
        n_mip = len(re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan))
        n_sort = len(re.findall(r"^\s*[^(]*\bSort\b", plan, re.M))
        n_win = len(re.findall(r"\bWindow\b", plan))
        n_scan = len(re.findall(r"Scan parquet", plan))
        pushed_none = len(re.findall(r"PushedFilters: \[\]", plan))
        rows.append((name, n_ex, n_smj, n_bhj, n_shj, n_bnl, n_cart,
                     n_py, n_mip, n_sort, n_win, n_scan, pushed_none,
                     len(plan)))
    with open(f"/tmp/plan_summary_r10_{suffix}.tsv", "w") as f:
        f.write("name\tex\tsmj\tbhj\tshj\tbnl\tcart\tpy\tmip\tsort\twin\tscan\tnopush\tlen\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    print(f"captured {len(rows)} plans -> {outdir} suffix={suffix}")


if __name__ == "__main__":
    main()
