"""Spark-4-native surface: LATERAL joins, VARIANT JSON, and the
Python Data Source API (round 3 additions).

Three oracle-checked keys exercising engine features that did not
exist in the Spark 1.x era the reference targets:

- ``lateral_join_q``  — correlated LATERAL subquery (per-region top-2
  nations by customer count); Catalyst decorrelates to a
  join+window, DuckDB executes the same ANSI text natively.
- ``variant_json_q``  — ``parse_json`` -> VARIANT -> typed
  ``variant_get`` extraction, the Spark 4 semi-structured path (one
  parse, binary-encoded traversal) vs per-path string re-parsing.
- ``python_datasource_scan`` — a custom Python Data Source
  (sources/pysource.py) generating deterministic LCG points
  server-side; the oracle reproduces the identical relation with
  generate_series arithmetic, proving the source is reproducible and
  partition-independent.

Reference parity note: the reference has none of these (its only
source is a text-file directory stream, batchStreamRun.scala:37-42);
they extend the engine surface per SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pysource import LCG_A, LCG_B, LCG_M, PointsSource
from ..sources.tables import load_table, register_views
from .registry import ORACLES, register

# ==========================================================================
# lateral_join_q
# ==========================================================================

_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_cust
FROM region r, LATERAL (
  SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 2) t
"""


def lateral_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per-region top-2 nations by
    customer count — identical ANSI text runs on both engines.

    Catalyst decorrelates the lateral into a join + per-group ranking
    (no per-outer-row re-execution); at 100 TB the equivalent
    hand-written shape is the window top-k the engine also exposes
    (``topk_q``), so this key pins that the DECLARATIVE form plans as
    well as the explicit one.
    """
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


register("lateral_join_q", lateral_join_q, _LATERAL_SQL)


# ==========================================================================
# variant_json_q
# ==========================================================================


def variant_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured path: parse each event's JSON props once
    into the binary VARIANT encoding, then typed-extract ``$.k`` —
    Spark 4's answer to repeated ``get_json_object`` string re-parsing
    (cf. the ``from_json_q`` schema-typed alternative).

    Output buckets k into deciles with per-bucket counts and sums so
    the oracle checks the extraction across the whole table, not just
    a projection.
    """
    ev = load_table(spark, sf_dir, "events")
    k_val = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select(k_val.alias("k_val"))
        .withColumn("bucket", F.expr("k_val div 10"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k_val").alias("sum_k"))
    )


register(
    "variant_json_q",
    variant_json_q,
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS bucket,
           COUNT(*) AS n,
           SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
    FROM events GROUP BY 1
    """,
)


# ==========================================================================
# python_datasource_scan
# ==========================================================================

PYSOURCE_N = 1000


def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python Data Source (sources/pysource.py): 1000
    deterministic LCG points generated executor-side across 4
    partitions, then a quadrant aggregate proving the full relation
    arrived.

    The oracle recomputes the identical relation from generate_series
    arithmetic — the check is therefore also a partition-independence
    proof (the source yields row k from whichever partition owns k).
    Division by 2^31 is exact in binary64, so no rounding is needed.
    """
    spark.dataSource.register(PointsSource)
    pts = (
        spark.read.format("gstream_points")
        .option("n", str(PYSOURCE_N))
        .option("partitions", "4")
        .load()
    )
    return (
        pts.select(
            "id",
            "x",
            "y",
            ((F.col("x") >= 0.5).cast("int") * 2 + (F.col("y") >= 0.5).cast("int")).alias(
                "quadrant"
            ),
        )
        .groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            # min/max are order-independent exact doubles (a float SUM
            # would be summation-order-sensitive across engines)
            F.min("x").alias("min_x"),
            F.max("y").alias("max_y"),
        )
    )


register(
    "python_datasource_scan",
    python_datasource_scan,
    f"""
    WITH pts AS (
      SELECT k AS id,
             ((({LCG_A}*(2*k)+{LCG_B}) % {LCG_M}) * 1.0)/{LCG_M} AS x,
             ((({LCG_A}*(2*k+1)+{LCG_B}) % {LCG_M}) * 1.0)/{LCG_M} AS y
      FROM generate_series(0, {PYSOURCE_N - 1}) t(k))
    SELECT (CASE WHEN x >= 0.5 THEN 2 ELSE 0 END
            + CASE WHEN y >= 0.5 THEN 1 ELSE 0 END) AS quadrant,
           COUNT(*) AS n,
           MIN(id) AS min_id,
           MIN(x) AS min_x,
           MAX(y) AS max_y
    FROM pts GROUP BY 1
    """,
)


# ==========================================================================
# python_datasource_stream
# ==========================================================================


def python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING Python Data Source (SimpleDataSourceStreamReader):
    the same LCG relation arrives as offset-tracked micro-batches (250
    rows per trigger); the run drains all 1000 rows, then the identical
    quadrant aggregate must equal the batch-scan key's — one relation,
    two arrival modes, one oracle.

    ``readBetweenOffsets`` gives replay-after-failure (exactly-once
    with the memory sink here; idempotent-by-offset in general) — the
    streaming-source contract the reference's file-replay input never
    had.
    """
    import time as _time

    from ..sources.pysource import PointsStreamSource

    spark.dataSource.register(PointsStreamSource)
    df = spark.readStream.format("gstream_points_stream").load()
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("python_datasource_stream")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = _time.time() + 240
    while _time.time() < deadline:
        if spark.table("python_datasource_stream").count() >= PYSOURCE_N:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    pts = spark.table("python_datasource_stream")
    if pts.count() < PYSOURCE_N:
        raise TimeoutError("python streaming source did not drain in 240s")
    return (
        pts.select(
            "id",
            "x",
            "y",
            ((F.col("x") >= 0.5).cast("int") * 2 + (F.col("y") >= 0.5).cast("int")).alias(
                "quadrant"
            ),
        )
        .groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            F.min("x").alias("min_x"),
            F.max("y").alias("max_y"),
        )
    )


register("python_datasource_stream", python_datasource_stream, ORACLES["python_datasource_scan"])
