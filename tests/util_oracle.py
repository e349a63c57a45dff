"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and
asserts row-count, column-name and value equality (order-insensitive,
columns sorted by name) — the same shape as CORRECTNESS_r{N}.json so
failures show up here first.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
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
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        # The driver's canonicalizer (pandas sort_values + hash) throws
        # "unhashable type: 'list'" on array cells — round 1 lost 8 keys
        # to exactly this because the mirror silently tuple-ized.  Fail
        # loudly instead: oracle-checked queries must encode vectors as
        # scalars (vec.fmt_vec / _fmt_sql).
        raise AssertionError(
            "array-valued result cell: driver canonicalizer cannot hash "
            "lists — encode with vec.fmt_vec (Spark) + printf join (DuckDB)"
        )
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
        return _norm(v.item())
    return v


def compare(spark_df, con, sql: str, key: str = "") -> None:
    spark_rows = spark_df.collect()
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    assert s_cols == d_cols, f"{key}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    # key=repr: rows may mix None with strings/ints (rollup/cube nulls)
    s_set = sorted((tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=repr)
    d_set = sorted((tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=repr)
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"{key}: first row mismatch at {i}:\n spark={a}\n duck ={b}"
