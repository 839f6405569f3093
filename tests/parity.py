"""Spark-vs-DuckDB parity harness — mirrors the driver's correctness gate:
row count + column names + order-insensitive canonical value comparison."""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_val(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def canon_rows(rows: list[dict[str, Any]]) -> list[tuple[str, ...]]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(tuple(canon_val(r[c]) for c in cols) for r in rows)


def spark_rows(df) -> list[dict[str, Any]]:
    return [r.asDict() for r in df.collect()]


def duck_rows(con, sql: str) -> list[dict[str, Any]]:
    cur = con.sql(sql)
    cols = cur.columns
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def compare(df, con, sql: str) -> tuple[bool, str]:
    s_rows = spark_rows(df)
    d_rows = duck_rows(con, sql)
    s_cols = sorted(df.columns)
    d_cols = sorted({c for r in d_rows[:1] for c in r} or set(con.sql(sql).columns))
    if s_cols != [c for c in d_cols]:
        return False, f"columns differ: spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canon_rows(s_rows), canon_rows(d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
