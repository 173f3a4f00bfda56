"""Oracle-differential harness: run a declared query on Spark and its
oracle SQL on DuckDB over the same parquet; canonicalize and compare.

Mirrors the driver's check (row count + column names + order-insensitive
value comparison) so failures surface locally before a round submit.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from sparkstreaming_gmall_demo_spark.schemas import FIXTURE_TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def canon_value(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(canon_value(row[i]) for i in order))
    return sorted(out)


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Return (ok, detail). Column names sorted, values canonicalized."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
        if cs != cd:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
            problems.append(f"values differ, first diffs: {diff}")
    return (not problems, "; ".join(problems))
