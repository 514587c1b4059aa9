"""Executed-plan profiler: measured SQLMetrics, not guessed plans.

``.explain()`` shows the plan you HOPE for; this runs the query and
reads back what actually happened — per-operator output rows, shuffle
bytes/records, spill, scan file counts, peak memory — straight from the
executed plan's SQLMetric accumulators. That is the feedback loop the
100 TB brief demands: "is the filter pushed down" is a plan question,
but "did the shuffle move 40 GB or 400 GB" and "did the aggregate
spill" are *execution* questions only metrics answer.

Execution strategy: the plan's own RDD is counted
(``executedPlan().execute().count()``) — full distributed execution,
metrics populate, and **zero rows ever reach the driver** (unlike
``collect()``-based profiling, this is safe to point at a
corpus-sized DataFrame). Run it on a representative slice, read the
report, fix the plan, re-run — the profiler is a diagnostic tool, not
a production operator.

Typical reads of the report:
* ``shuffle_bytes_written`` ≫ expectations → a missing broadcast or a
  pre-aggregation opportunity (map-side combine shrinks what moves).
* ``spill_bytes`` > 0 → partitions don't fit the executor: raise
  ``spark.sql.shuffle.partitions``, salt the hot key, or both.
* ``scan.numFiles`` equal to the table's total → partition pruning is
  not happening; check the filter's shape against the partition keys.
* a node's ``numOutputRows`` far above its parent's → the filter runs
  too late; push the predicate below the join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["NodeMetrics", "run_profile", "profile_report"]


@dataclass
class NodeMetrics:
    name: str
    depth: int
    metrics: dict[str, int] = field(default_factory=dict)


# Nodes that only wrap the real operator tree (codegen pipelines, AQE
# roots, query-stage shells): descended through when locating the root
# OPERATOR, whose numOutputRows — if it has one — is the result size.
_WRAPPERS = (
    "WholeStageCodegen", "InputAdapter", "AdaptiveSparkPlan",
    "ResultQueryStage", "ShuffleQueryStage", "BroadcastQueryStage",
    "TableCacheQueryStage",
)
# metric-less operators that preserve the row count exactly — safe to
# look past when the root lacks numOutputRows (a repartition/sort tail
# like a presentation sort must not hide the real result size)
_ROW_PRESERVING = ("Project", "Sort", "Exchange", "ReusedExchange",
                   "AQEShuffleRead")


def _reset_metrics(jnode) -> None:
    """Zero every SQLMetric accumulator in the tree. Metrics are
    cumulative across executions of the same plan objects — without the
    reset, profiling a kept DataFrame twice reports doubled counts."""
    it = jnode.metrics().iterator()
    while it.hasNext():
        try:
            it.next()._2().reset()
        except Exception:  # noqa: BLE001 — leave unresettable ones be
            pass
    for accessor in ("executedPlan", "plan"):
        try:
            child = getattr(jnode, accessor)()
            if child is not None and hasattr(child, "nodeName"):
                _reset_metrics(child)
                return
        except Exception:  # noqa: BLE001
            pass
    children = jnode.children()
    for i in range(children.size()):
        _reset_metrics(children.apply(i))


def _walk(jnode, depth: int, out: list[NodeMetrics]) -> None:
    mets: dict[str, int] = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            mets[kv._1()] = int(kv._2().value())
        except Exception:  # noqa: BLE001 — unset accumulator: skip
            pass
    out.append(NodeMetrics(jnode.nodeName(), depth, mets))
    # AdaptiveSparkPlanExec re-roots on its final plan; QueryStageExec
    # wraps a materialized stage. Both expose the real subtree through
    # an accessor rather than children() — unwrap those first.
    for accessor in ("executedPlan", "plan"):
        try:
            child = getattr(jnode, accessor)()
            if child is not None and hasattr(child, "nodeName"):
                _walk(child, depth + 1, out)
                return
        except Exception:  # noqa: BLE001 — not that node type
            pass
    children = jnode.children()
    for i in range(children.size()):
        _walk(children.apply(i), depth + 1, out)


def run_profile(df: DataFrame) -> dict:
    """Execute ``df`` (distributed, driver receives NO rows) and return
    the harvested metrics::

        {"nodes": [NodeMetrics...],          # pre-order, root first
         "output_rows": int | None,          # root operator's output
         "shuffle_bytes_written": int, "shuffle_records_written": int,
         "spill_bytes": int,                 # sum of all spillSize
         "peak_memory_bytes": int,           # max over operators
         "scans": [{"name", "numFiles", "numOutputRows", ...}],
         "exchanges": int}                   # shuffle count in the plan

    Safe to call repeatedly on the SAME DataFrame object: accumulators
    are reset before each run. Caveat: a shuffle Spark reuses from a
    previous execution does not re-run, so its bytes count what THIS
    run moved (zero) — re-create the DataFrame to re-measure the
    exchange itself.
    """
    qe = df._jdf.queryExecution()
    root = qe.executedPlan()
    _reset_metrics(root)  # metrics are cumulative across runs
    root.execute().count()  # full execution; rows stay on executors
    nodes: list[NodeMetrics] = []
    _walk(root, 0, nodes)

    def total(metric: str) -> int:
        return sum(n.metrics.get(metric, 0) for n in nodes)

    # the result size is the first numOutputRows found while descending
    # ONLY through wrappers and row-PRESERVING metric-less operators
    # (Project/Sort). A count-CHANGING root without the metric (a
    # limit, a sample) reports None (unknown) — never a deeper node's
    # pre-limit number.
    output_rows = None
    for n in nodes:
        if any(n.name.startswith(w) for w in _WRAPPERS):
            continue
        if "numOutputRows" in n.metrics:
            output_rows = n.metrics["numOutputRows"]
            break
        if not n.name.startswith(_ROW_PRESERVING):
            break
    scans = [
        {"name": n.name, **n.metrics}
        for n in nodes
        if n.name.startswith("Scan ")
    ]
    return {
        "nodes": nodes,
        "output_rows": output_rows,
        "shuffle_bytes_written": total("shuffleBytesWritten"),
        "shuffle_records_written": total("shuffleRecordsWritten"),
        "spill_bytes": total("spillSize"),
        "peak_memory_bytes": max(
            (n.metrics.get("peakMemory", 0) for n in nodes), default=0
        ),
        "scans": scans,
        "exchanges": sum(1 for n in nodes if n.name.startswith("Exchange")),
    }


def profile_report(profile: dict) -> str:
    """Human-readable rendering of :func:`run_profile`'s dict — the
    operator tree with each node's most decision-relevant metrics."""
    interesting = (
        "numOutputRows", "numFiles", "shuffleBytesWritten",
        "shuffleRecordsWritten", "spillSize", "peakMemory", "dataSize",
    )
    lines = [
        f"output_rows={profile['output_rows']}  "
        f"shuffle_written={profile['shuffle_bytes_written']}B/"
        f"{profile['shuffle_records_written']}rec  "
        f"spill={profile['spill_bytes']}B  "
        f"exchanges={profile['exchanges']}"
    ]
    for n in profile["nodes"]:
        picked = {k: v for k, v in n.metrics.items() if k in interesting}
        shown = " ".join(f"{k}={v}" for k, v in sorted(picked.items()))
        lines.append(f"{'  ' * n.depth}{n.name}  {shown}".rstrip())
    return "\n".join(lines)
