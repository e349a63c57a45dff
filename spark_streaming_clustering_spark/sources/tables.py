"""Parquet table loaders for the driver-generated test tables.

Mirrors the reference's batch scan entry point (A1,
batchStreamRun.scala:37 reads the init file with ``sc.textFile``) in
Spark-native form: columnar parquet scans with Catalyst predicate
pushdown and column pruning — at 100 TB these scans are where most of
the win comes from, so every query selects columns explicitly and
filters as early as possible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

# Dimension tables small enough to broadcast at any scale factor (region /
# nation are fixed-cardinality; customer/supplier/part grow with SF but stay
# far below fact-table size — still broadcastable at sf<=1; at 100 TB the
# planner's autoBroadcastJoinThreshold makes the call via AQE runtime stats).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a session without this
        # conf fails the scan outright ([PARQUET_TYPE_ILLEGAL]).  It is a
        # runtime SQL conf, so set it defensively — the driver harness
        # builds its own session and may not have it.  Same for the UTC
        # session timezone: the ts column is rebuilt with
        # timestamp_micros() (TIMESTAMP_LTZ), so collect()ed values must
        # render in UTC to match the tz-naive DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (spark.sql.legacy.parquet.nanosAsLong);
        # floor-divide to micros == DuckDB's nanos->micros truncation.
        from pyspark.sql import functions as F

        # integer div, not '/': nanos ~1.7e18 exceed double's 53-bit mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def source_fingerprint(sf_dir: str, name: str) -> str:
    """Size+mtime tag of a source parquet file, for keying derived
    on-disk layouts.  A cached layout keyed only on the sf_dir STRING
    silently reuses stale data if the fixture at that path is ever
    regenerated; folding the source fingerprint into the cache path
    invalidates it instead (review finding, round 4)."""
    st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
    return f"{st.st_size}_{st.st_mtime_ns}"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
