"""Local replica of the driver's t2 correctness gate (SURVEY §5).

Runs a registered Spark query and its DuckDB oracle side-by-side and
compares row-count + column names + an order-insensitive multiset of
canonicalized rows (columns sorted by name — mirroring the driver's
order-insensitive value-hash, ``__spark_entry__.py`` docstring).

Two value checks run (r03 VERDICT item 2):

1. **Driver-faithful (primary)**: both sides are materialized through
   pandas exactly as the driver does — DuckDB ``con.execute(sql).df()``
   and Spark ``df.toPandas()`` — and the *pandas* values are hashed.
   This is strict where the driver is strict: DuckDB ``SUM(int)`` /
   ``list_sum`` / window ``SUM`` return HUGEINT/DECIMAL, which ``.df()``
   converts to float64 while Spark emits int64, so ``242`` vs ``242.0``
   FAILS here (it silently passed the old native-type compare — the
   root cause of the five r03 driver hash failures).
2. **Native-type (secondary)**: the original DuckDB ``fetchall()`` /
   Spark ``collect()`` compare, kept as a belt-and-braces value check
   for anything the pandas path is lenient about (e.g. decimal scale
   collapsed to float64 on both sides).
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from .tables import TABLES


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """In-memory DuckDB with the driver's table views pre-registered.

    The events/embeddings views mirror the Spark source layer's
    non-finite ingest contract (tables.py module docstring): NaN/±Inf
    metric values → NULL, embeddings with any non-finite element →
    whole-vector NULL.  The driver's own DuckDB registers RAW views,
    but the driver fixtures contain no non-finite values, so the two
    harnesses agree everywhere the driver can observe; the sanitized
    views exist so the non-finite regime (degenerate_sweep --nonfinite)
    compares like against like."""
    con = duckdb.connect()
    for t in TABLES:
        src = f"read_parquet('{sf_dir}/{t}.parquet')"
        if t == "events":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ("
                f"(CASE WHEN isfinite(value) THEN value END) AS value"
                f") FROM {src}"
            )
        elif t == "embeddings":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ("
                f"(CASE WHEN len(list_filter(embedding,"
                f" e -> NOT isfinite(e))) = 0 THEN embedding END)"
                f" AS embedding) FROM {src}"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
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


def canon_pd_cell(v):
    """Driver-faithful canonical form of one *pandas-materialized* value.

    Mirrors what the driver hashes after ``duckdb .df()`` / Spark
    ``.toPandas()``: numpy int64 and float64 are DISTINCT (the r03 failure
    class), ``Decimal`` objects (Spark decimal columns survive toPandas as
    objects) are distinct from float64 (DuckDB DECIMAL collapses to
    float64), and any datetime-like at midnight canonicalizes as a DATE
    (DATE↔DATE across engines is driver-proven benign: Spark emits
    ``datetime.date`` objects, DuckDB ``.df()`` emits midnight Timestamps,
    and `ts_rollup_multi` carried one through a green r03 hash).
    NaN/NaT canonicalize as null: pandas uses NaN for nulls in
    int-promoted-to-float columns on BOTH sides, so null≡NaN is the only
    consistent reading.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return None  # pandas null sentinel
        return ("f", repr(f))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if v.tzinfo is not None:
            v = v.tz_convert(None) if isinstance(v, pd.Timestamp) else v.replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) and getattr(v, "nanosecond", 0) == 0:
            return ("D", v.date().isoformat())
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("D", v.isoformat())
    if isinstance(v, _dt.timedelta):
        return ("td", v.total_seconds())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, np.ndarray):
        return ("l", tuple(canon_pd_cell(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon_pd_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((canon_pd_cell(k), canon_pd_cell(x)) for k, x in v.items())))
    if hasattr(v, "asDict"):  # pyspark Row (struct) — same shape as duckdb dict
        return ("m", tuple(sorted((canon_pd_cell(k), canon_pd_cell(x)) for k, x in v.asDict().items())))
    return ("?", str(v))


def _rows_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return Counter(tuple(canon_cell(row[i]) for i in order) for row in rows)


def _pd_multiset(df: "pd.DataFrame") -> Counter:
    ordered = df[sorted(df.columns, key=str.lower)]
    return Counter(
        tuple(canon_pd_cell(v) for v in row)
        for row in ordered.itertuples(index=False, name=None)
    )


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    """Raise AssertionError with a readable diff if the two sides mismatch.

    Primary check is the driver-faithful pandas path; the original
    native-type compare runs second (see module docstring).
    """
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    s_cols = list(s_pdf.columns)
    d_cols = list(d_pdf.columns)

    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"[{name}] column mismatch:\n  spark={sorted(s_cols)}\n  duck ={sorted(d_cols)}"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"[{name}] row count mismatch: spark={len(s_pdf)} duck={len(d_pdf)}"
    )

    # -- primary: driver-faithful pandas hash ------------------------------
    sm = _pd_multiset(s_pdf)
    dm = _pd_multiset(d_pdf)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        raise AssertionError(
            f"[{name}] DRIVER-PATH value mismatch ({sum((sm - dm).values())} rows differ)\n"
            f"  spark dtypes: {dict(s_pdf.dtypes.astype(str))}\n"
            f"  duck  dtypes: {dict(d_pdf.dtypes.astype(str))}\n"
            f"  spark-only (≤5): {only_s}\n  duck-only (≤5): {only_d}\n"
            f"  (columns sorted: {sorted(s_cols, key=str.lower)})"
        )

    # -- secondary: native-type compare (pre-pandas values) ----------------
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_rows = cur.fetchall()
    sm2 = _rows_multiset(s_cols, s_rows)
    dm2 = _rows_multiset(d_cols, d_rows)
    if sm2 != dm2:
        only_s = list((sm2 - dm2).items())[:5]
        only_d = list((dm2 - sm2).items())[:5]
        raise AssertionError(
            f"[{name}] native-type value mismatch ({sum((sm2 - dm2).values())} rows differ)\n"
            f"  spark-only (≤5): {only_s}\n  duck-only (≤5): {only_d}\n"
            f"  (columns sorted: {sorted(s_cols, key=str.lower)})"
        )


# --------------------------------------------------------------------------
# Registry-wide type-alignment lint (r03 VERDICT item 3).
#
# The driver hashes pandas-materialized values, so a Spark BIGINT column
# paired with a DuckDB HUGEINT/DECIMAL column (pandas float64) hash-fails
# even when every value is numerically equal.  This lint compares the Spark
# *analyzed* schema against DuckDB ``DESCRIBE <oracle>`` — no execution —
# and flags any column whose post-pandas dtype category differs.
# --------------------------------------------------------------------------

#: post-pandas dtype category for a Spark simpleString type
def _spark_category(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "DEC"  # toPandas keeps Decimal objects
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "long", "integer"):
        return "INT"
    if t in ("float", "double", "real"):
        return "FLT"
    if t == "date":
        return "DATE"
    if t.startswith("timestamp"):
        return "TS"
    if t in ("string", "varchar", "char"):
        return "STR"
    if t == "boolean":
        return "BOOL"
    if t == "binary":
        return "BIN"
    if t.startswith("array"):
        return "LIST"
    if t.startswith("struct"):
        return "STRUCT"
    if t.startswith("map"):
        return "MAP"
    if t in ("void", "null"):
        return "NULL"
    if t.startswith("interval"):
        return "TD"
    return f"?{t}"


#: post-pandas dtype category for a DuckDB DESCRIBE column_type
#: ``nested=True`` = the type sits INSIDE a list/struct/map (r05 ADVICE):
#: ``.df()`` collapses top-level DECIMAL/HUGEINT to float64, but inside a
#: container it keeps ``decimal.Decimal`` / ``int`` objects — so nested
#: DECIMAL must compare as DEC (vs Spark double → mismatch) and nested
#: HUGEINT as INT.
def _duck_category(t: str, nested: bool = False) -> str:
    t = t.upper()
    if t.endswith("[]"):
        return "LIST"
    if t.startswith("DECIMAL"):
        return "DEC" if nested else "FLT"  # top-level .df() → float64
    if t in ("HUGEINT", "UHUGEINT"):
        return "INT" if nested else "FLT"  # top-level .df() → float64
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "FLT"
    if t == "DATE":
        return "DATE"
    if t.startswith("TIMESTAMP"):
        return "TS"
    if t in ("VARCHAR", "CHAR", "TEXT", "STRING", "JSON"):
        return "STR"  # JSON materializes as str through .df() (fn_json green in r02)
    if t == "BOOLEAN":
        return "BOOL"
    if t in ("BLOB", "BYTEA", "BINARY"):
        return "BIN"
    if t.startswith("STRUCT"):
        return "STRUCT"
    if t.startswith("MAP"):
        return "MAP"
    if t.startswith("INTERVAL"):
        return "TD"
    if t == '"NULL"' or t == "NULL":
        return "NULL"
    return f"?{t}"


#: cross-engine category pairs the driver's canonicalization proves benign
_ALLOWED_CROSS = {
    ("DATE", "TS"), ("TS", "DATE"),  # midnight timestamps canon as dates
}


def _split_top(s: str) -> list[str]:
    """Split on commas at bracket depth 0 (``<>``/``()``/``[]`` aware)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def _spark_children(t: str) -> dict[str, str] | None:
    """Element/field types of a Spark ``simpleString`` container type.

    ``array<e>`` → {"[]": e}; ``map<k,v>`` → {".key": k, ".value": v};
    ``struct<a:ta,b:tb>`` → {"a": ta, ...}.  None for scalars.
    """
    t = t.strip()
    low = t.lower()
    if low.startswith("array<") and t.endswith(">"):
        return {"[]": t[6:-1]}
    if low.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1])
        return {".key": k, ".value": v}
    if low.startswith("struct<") and t.endswith(">"):
        out = {}
        for field in _split_top(t[7:-1]):
            name, _, ftype = field.partition(":")
            out[name.strip().lower()] = ftype.strip()
        return out
    return None


def _duck_children(t: str) -> dict[str, str] | None:
    """Element/field types of a DuckDB ``DESCRIBE`` container type.

    ``E[]`` → {"[]": E}; ``MAP(K, V)`` → {".key": K, ".value": V};
    ``STRUCT(a TA, b TB)`` → {"a": TA, ...}.  None for scalars.
    """
    t = t.strip()
    up = t.upper()
    if up.endswith("[]"):
        return {"[]": t[:-2]}
    if up.startswith("MAP(") and t.endswith(")"):
        k, v = _split_top(t[4:-1])
        return {".key": k, ".value": v}
    if up.startswith("STRUCT(") and t.endswith(")"):
        out = {}
        for field in _split_top(t[7:-1]):
            field = field.strip()
            if field.startswith('"'):
                close = field.index('"', 1)
                name, ftype = field[1:close], field[close + 1:]
            else:
                name, _, ftype = field.partition(" ")
            out[name.strip().lower()] = ftype.strip()
        return out
    return None


def _category_issues(
    prefix: str, s_type: str, d_type: str, nested: bool = False
) -> list[str]:
    """Category mismatches for one column, recursing into LIST/STRUCT/MAP
    element types (r04 VERDICT item 6: a list<int> vs DOUBLE[] pair is a
    driver hash-fail the flat categories cannot see).  ``nested`` marks
    that we are already inside a container, where DuckDB materialization
    differs from top level (r05 ADVICE: nested DECIMAL stays Decimal,
    nested HUGEINT stays int — they never collapse to float64)."""
    sc, dc = _spark_category(s_type), _duck_category(d_type, nested=nested)
    if "NULL" in (sc, dc) or (sc, dc) in _ALLOWED_CROSS:
        return []
    if sc != dc:
        return [f"{prefix}: spark {sc}({s_type}) vs duck {dc}({d_type})"]
    s_kids, d_kids = _spark_children(s_type), _duck_children(d_type)
    if not s_kids or not d_kids:
        return []
    issues = []
    for key in sorted(set(s_kids) | set(d_kids)):
        if key not in s_kids or key not in d_kids:
            issues.append(
                f"{prefix}.{key}: field missing on one side "
                f"(spark={key in s_kids})"
            )
            continue
        issues.extend(
            _category_issues(f"{prefix}.{key}" if key != "[]" else f"{prefix}[]",
                             s_kids[key], d_kids[key], nested=True)
        )
    return issues


def type_align_issues(spark_df, con, sql: str) -> list[str]:
    """Return a list of ``col: spark_cat(type) vs duck_cat(type)`` strings
    for every output column whose post-pandas category mismatches —
    including element/field types inside arrays, structs, and maps.
    Schema-only: builds the Spark plan and runs DuckDB DESCRIBE, no data.
    """
    s_types = {f.name.lower(): f.dataType.simpleString() for f in spark_df.schema.fields}
    d_types = {
        r[0].lower(): r[1]
        for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    issues = []
    for col in sorted(set(s_types) | set(d_types)):
        if col not in s_types or col not in d_types:
            issues.append(f"{col}: missing on one side (spark={col in s_types})")
            continue
        issues.extend(_category_issues(col, s_types[col], d_types[col]))
    return issues
