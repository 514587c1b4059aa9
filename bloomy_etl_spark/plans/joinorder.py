"""Join-order advisor: System-R-style greedy ordering from KMV stats.

Catalyst reorders joins when statistics exist (CBO) — but on a fresh
lake there usually are none, and at 100 TB the difference between
joining the 50-billion-row fact first or last is the job. This module
computes the statistics it needs ITSELF — one bounded KMV sketch pass
per (table, join key), the same machinery as
``tools/stats.py::estimate_join_cardinality`` — then enumerates a
left-deep order greedily, always joining in the table that minimizes
the estimated next intermediate.

Model (textbook System-R uniformity): join output ≈
``matching_keys · (rows_l / ndv_l) · (rows_r / ndv_r)``, with
``matching_keys`` from Beyer-et-al. KMV intersection.  Intermediates
are not re-sketched: the carried key's NDV is approximated by its base
table's NDV (exact under lossless joins, upper bound otherwise) — the
standard propagation shortcut, documented per step in the output.

This is an ADVISOR, not a rewrite: it returns the order, per-step
estimates and a broadcast/shuffle hint; the caller (or a codegen layer)
applies it.  Cost: two small aggregation jobs per table-key, driver
state O(k) per sketch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["JoinEdge", "advise_join_order"]


@dataclass(frozen=True)
class JoinEdge:
    """Equi-join edge: ``left_table.left_key = right_table.right_key``."""

    left_table: str
    left_key: str
    right_table: str
    right_key: str


def _sketch(df: DataFrame, key: str, k: int):
    from bloomy_etl_spark.operators.sketches import kmv_build

    return kmv_build(df, [], key, k=k).first()["kmv"]


def _est_from_sketch(vals: list[int], k: int) -> float:
    """Mirror of ``sketches.kmv_estimate_col`` on a materialized sorted
    sketch: exact below k, else (k−1)/u_k with the int64→[0,1) hash
    normalization ``(h + 2^63) / 2^64``."""
    if len(vals) < k:
        return float(len(vals))
    u_k = (vals[k - 1] + 2**63) / 2**64
    return (k - 1) / u_k


def _intersect(ka, kb, k: int) -> float:
    """Driver-side Beyer et al. intersection (mirror of
    ``kmv_overlap_cols``): union sketch U = k-min of the merge,
    ρ = hashes of U in both sides, estimate ρ/|U| · est(U)."""
    sa, sb = set(ka or ()), set(kb or ())
    u = sorted(sa | sb)[:k]
    if not u:
        return 0.0
    rho = sum(1 for h in u if h in sa and h in sb)
    return rho / len(u) * _est_from_sketch(u, k)


def _ndv(sk, k: int) -> float:
    return _est_from_sketch(sorted(sk or ()), k)


def advise_join_order(
    tables: dict[str, DataFrame],
    edges: list[JoinEdge],
    *,
    k: int = 4096,
    broadcast_rows: int = 1_000_000,
) -> dict:
    """Greedy left-deep join order over an equi-join graph.

    Returns ``{"order": [t…], "steps": [{right, left_key, right_key,
    est_rows, strategy, ndv_source}…], "start": t0}``.  ``strategy`` is
    ``"broadcast"`` when the incoming table's row count is under
    ``broadcast_rows``, else ``"shuffle"``.  Raises on tables absent
    from the graph or a disconnected graph (a cross product is never
    advised — it is almost never what a 100 TB job wants implicitly).
    """
    if not edges:
        raise ValueError("advise_join_order: no edges")
    names = set(tables)
    for e in edges:
        missing = {e.left_table, e.right_table} - names
        if missing:
            raise ValueError(f"edge references unknown tables: {missing}")

    rows = {t: tables[t].count() for t in names}
    keys_needed = sorted(
        {(e.left_table, e.left_key) for e in edges}
        | {(e.right_table, e.right_key) for e in edges}
    )
    sk = {(t, c): _sketch(tables[t], c, k) for t, c in keys_needed}
    ndv = {tc: _ndv(s, k) for tc, s in sk.items()}

    # adjacency: table -> [(other, my_key, other_key)]
    adj: dict[str, list[tuple[str, str, str]]] = {t: [] for t in names}
    for e in edges:
        adj[e.left_table].append((e.right_table, e.left_key, e.right_key))
        adj[e.right_table].append((e.left_table, e.right_key, e.left_key))

    def step_estimate(cur_rows: float, in_t: str, in_key: str,
                      out_t: str, out_key: str) -> float:
        matching = _intersect(sk[(in_t, in_key)], sk[(out_t, out_key)], k)
        nl, nr = ndv[(in_t, in_key)], ndv[(out_t, out_key)]
        if not nl or not nr:
            return 0.0
        return matching * (cur_rows / nl) * (rows[out_t] / nr)

    start = min(names, key=lambda t: (rows[t], t))
    joined = {start}
    order, steps = [start], []
    cur_rows = float(rows[start])
    # which base table's key stats stand in for the intermediate
    while joined != names:
        candidates = []
        for t in sorted(joined):
            for other, my_key, other_key in adj[t]:
                if other in joined:
                    continue
                est = step_estimate(cur_rows, t, my_key, other, other_key)
                candidates.append((est, other, t, my_key, other_key))
        if not candidates:
            rest = sorted(names - joined)
            raise ValueError(f"join graph is disconnected; unreachable: {rest}")
        est, other, via, my_key, other_key = min(
            candidates, key=lambda c: (c[0], c[1])
        )
        joined.add(other)
        order.append(other)
        steps.append({
            "right": other,
            "left_key": f"{via}.{my_key}",
            "right_key": f"{other}.{other_key}",
            "est_rows": est,
            "strategy": "broadcast" if rows[other] < broadcast_rows
            else "shuffle",
            "ndv_source": via,
        })
        cur_rows = est
    return {"start": start, "order": order, "steps": steps}
