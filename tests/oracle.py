"""DuckDB differential-oracle harness (mirrors the driver's t2 gate).

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
fixtures, normalizes both to column-name-sorted, row-sorted value tuples,
and compares. Floats compared with per-element tolerance (the queries
already round to 4 dp, so exactness in practice).
"""

from __future__ import annotations

import datetime
import math
from typing import Any

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _norm(v: Any) -> Any:
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols, out


def compare(spark_df, duck_con, sql: str, float_tol: float = 1e-9) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    sc, sr = normalize(s_cols, s_rows)
    dc, dr = normalize(d_cols, d_rows)

    assert sc == dc, f"column mismatch: spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        for j, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol), (
                    f"row {i} col {sc[j]}: spark={x!r} duck={y!r}"
                )
            else:
                assert x == y, f"row {i} col {sc[j]}: spark={x!r} duck={y!r}"
