"""Local DuckDB-differential harness, mirroring the driver's t2 gate.

For each registered query: run the Spark DataFrame AND the oracle SQL
on the same parquet tables, canonicalize both result sets (columns
sorted by name, rows as sorted tuples of normalized values), and
compare. Normalization is deliberately strict — if it matches here it
should match any reasonable driver hash.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from file_indexer_spark.tables import TABLE_NAMES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb last-ulp
        # differences between engines' aggregate accumulation orders
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    # Spark Row (nested struct) — a tuple subclass, so check before tuple
    if hasattr(v, "asDict"):
        return tuple(sorted((k, _norm(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def spark_result(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duckdb_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    raw = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in raw]
    con.close()
    return sorted(cols), sorted(rows, key=repr)


def compare(df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    scols, srows = spark_result(df)
    dcols, drows = duckdb_result(sql, sf_dir)
    problems = []
    if scols != dcols:
        problems.append(f"columns differ: spark={scols} duckdb={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duckdb={len(drows)}")
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            problems.append(f"first diff at sorted row {i}:\n  spark : {a}\n  duckdb: {b}")
            break
    return problems
