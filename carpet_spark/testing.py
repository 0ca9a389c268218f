"""Local replica of the driver's t2 correctness gate (SURVEY §5).

Runs a registered Spark query and its DuckDB oracle side-by-side and
compares row-count + column names + an order-insensitive multiset of
canonicalized rows (columns sorted by name — mirroring the driver's
order-insensitive value-hash, ``__spark_entry__.py`` docstring).
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from decimal import Decimal

import duckdb

from .tables import TABLES


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """In-memory DuckDB with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v):
    """Engine-neutral canonical form of one value (hash-stable)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # exact: the determinism rules (exprs.py) must make both sides bit-equal
        return ("f", repr(v))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("D", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v.hex())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((canon_cell(k), canon_cell(x)) for k, x in v.items())))
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        return ("r", tuple(sorted((k, canon_cell(x)) for k, x in v.asDict().items())))
    return ("?", str(v))


def _rows_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return Counter(tuple(canon_cell(row[i]) for i in order) for row in rows)


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    """Raise AssertionError with a readable diff if the two sides mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"[{name}] column mismatch:\n  spark={sorted(s_cols)}\n  duck ={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sm = _rows_multiset(s_cols, s_rows)
    dm = _rows_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        raise AssertionError(
            f"[{name}] value mismatch ({sum((sm - dm).values())} rows differ)\n"
            f"  spark-only (≤5): {only_s}\n  duck-only (≤5): {only_d}\n"
            f"  (columns sorted: {sorted(s_cols, key=str.lower)})"
        )
