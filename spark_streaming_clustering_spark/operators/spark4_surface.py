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

import math

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
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
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


# ==========================================================================
# python_udf_scalar
# ==========================================================================


def python_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (``spark.udf.register``) —
    registered and demonstrated ONCE to complete the Python-boundary
    matrix (scalar pandas_udf, mapInPandas, applyInPandas,
    applyInPandasWithState, UDTF, and this), and deliberately
    documented as the anti-pattern: per-row Python dispatch with
    pickled exchange, ~10-100x slower than the Arrow-batched
    ``pandas_udf_distance`` equivalent.  Every hot path in this engine
    uses the vectorized forms; this key exists so the surface shows
    BOTH and names the tradeoff.

    Bounded input (nation, 25 rows) — the cost model is the point,
    not throughput.
    """
    from pyspark.sql.types import StringType

    def mirror_words(s: str) -> str:
        return " ".join(w[::-1] for w in s.split(" "))

    spark.udf.register("mirror_words", mirror_words, StringType())
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation_udf_in")
    return spark.sql(
        "SELECT n_nationkey, mirror_words(n_name) AS mirrored FROM nation_udf_in"
    )


register(
    "python_udf_scalar",
    python_udf_scalar,
    """
    SELECT n_nationkey,
           array_to_string(list_transform(string_split(n_name, ' '),
                                          w -> reverse(w)), ' ') AS mirrored
    FROM nation
    """,
)


# ==========================================================================
# join_null_safe_q
# ==========================================================================


def join_null_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantic corner
    plain equi-joins silently drop.  Keys are NULLIF'd event types so
    the NULL bucket is non-empty; output counts matches per key class.

    Plan note: Catalyst executes ``<=>`` as a hash join on the
    null-coalesced key (NULLs hash together) — same S(key) shuffle as
    a plain equi-join, no nested loop.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.expr("nullif(event_type, 'error')").alias("k"),
        F.col("event_id").alias("a_id"),
    ).filter(F.col("event_id") % 97 == 0)
    b = ev.select(
        F.expr("nullif(event_type, 'error')").alias("k2"),
        F.col("event_id").alias("b_id"),
    ).filter(F.col("event_id") % 89 == 0)
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("k2")))
        .groupBy(F.coalesce(F.col("k"), F.lit("<null>")).alias("key_class"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


register(
    "join_null_safe_q",
    join_null_safe_q,
    """
    WITH a AS (SELECT nullif(event_type, 'error') AS k, event_id AS a_id
               FROM events WHERE event_id % 97 = 0),
    b AS (SELECT nullif(event_type, 'error') AS k2, event_id AS b_id
          FROM events WHERE event_id % 89 = 0)
    SELECT COALESCE(a.k, '<null>') AS key_class, COUNT(*) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
    GROUP BY 1
    """,
)


# ==========================================================================
# arrow_map_batch (round 4)
# ==========================================================================


def arrow_map_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` boundary: per-vector stats computed directly on
    Arrow RecordBatches — the zero-copy sibling of ``mapInPandas``
    that completes the Python-boundary matrix (scalar pandas_udf,
    mapInPandas, applyInPandas, applyInPandasWithState, UDTF, row UDF,
    Python data source, and now raw Arrow).

    The kernel never materializes per-row Python objects: the list
    column's flat float buffer is viewed as one numpy array and
    segment-reduced with ``np.add.reduceat`` over the Arrow offsets —
    the pattern that makes Python-side vector math competitive with
    JVM expressions when a real kernel (BLAS, tokenizer) is needed.

    Float contract: float32 values are widened to float64 before the
    sequential segment sums, matching the oracle's
    ``list_sum(list_transform(e, x -> CAST(x AS DOUBLE) ...))``
    left-to-right order; outputs rounded to 6.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        _arrow_stats, "vec_id bigint, n_dims bigint, l2_norm double, dim_mean double"
    )


def _arrow_stats(batches):
    """The mapInArrow kernel, module-level so tests can drive it with
    hostile RecordBatches (empty lists, sliced ListArrays) directly."""
    import numpy as np
    import pyarrow as pa

    for rb in batches:
        vids = rb.column(0)
        col = rb.column(1)
        if isinstance(col, pa.ChunkedArray):  # pragma: no cover
            col = col.combine_chunks()
        lst = col.combine_chunks() if hasattr(col, "combine_chunks") else col
        # Flat values + offsets: one contiguous float buffer per
        # batch.  Offsets are ABSOLUTE into lst.values (a sliced
        # ListArray keeps the parent buffer and moves only the
        # offsets window), so slice the buffer to [offs[0], offs[-1])
        # — never assume offs[0] == 0 or that the buffer ends at
        # offs[-1].  A trailing 0.0 pad makes every reduceat index
        # valid (reduceat rejects index == len) and leaves each
        # left-to-right segment sum bit-exact (x + 0.0 == x).
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        raw = lst.values.to_numpy(zero_copy_only=False).astype(np.float64)
        vals = np.append(raw[offs[0] : offs[-1]], 0.0)
        starts = offs[:-1] - offs[0]
        n = (offs[1:] - offs[:-1]).astype(np.int64)
        if len(starts):
            # segment i runs to the NEXT start (offsets are
            # contiguous); the final segment absorbs only the 0 pad.
            s = np.add.reduceat(vals, starts)
            sq = np.add.reduceat(vals * vals, starts)
        else:  # empty batch
            s = np.zeros(0)
            sq = np.zeros(0)
        # reduceat yields x[i] (not 0) for an empty segment — mask.
        s = np.where(n > 0, s, 0.0)
        sq = np.where(n > 0, sq, 0.0)
        mean = np.divide(s, n, out=np.zeros_like(s), where=n > 0)
        yield pa.RecordBatch.from_arrays(
            [
                vids,
                pa.array(n, type=pa.int64()),
                pa.array(np.round(np.sqrt(sq), 6) + 0.0, type=pa.float64()),
                pa.array(np.round(mean, 6) + 0.0, type=pa.float64()),
            ],
            names=["vec_id", "n_dims", "l2_norm", "dim_mean"],
        )

register(
    "arrow_map_batch",
    arrow_map_batch,
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings)
    SELECT vec_id, CAST(len(e) AS BIGINT) AS n_dims,
           round(sqrt(COALESCE(list_sum(list_transform(e, x -> x * x)), 0)), 6)
             + 0.0 AS l2_norm,
           CASE WHEN len(e) = 0 THEN 0.0
                ELSE round(list_sum(e) / len(e), 6) + 0.0 END AS dim_mean
    FROM v
    """,
)


# ==========================================================================
# recursive_cte_q (round 4)
# ==========================================================================


def recursive_cte_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE``, new in Spark 4): walk the
    synthetic customer hierarchy parent = custkey div 10 from the
    roots (custkey < 10) down, computing each customer's root ancestor
    and depth — the org-chart / BOM-explosion shape that pre-4.x Spark
    had to hand-unroll (cf. the fixed-depth loops in ``pagerank_trade``
    / ``graph_bfs``; here the engine iterates to the fixpoint itself).

    Scale note: each recursion step is an equi-join of the frontier
    against the child relation — the same per-iteration plan as the
    hand-unrolled loops, with termination handled by the engine.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rc")
    return spark.sql(
        """
        WITH RECURSIVE h(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0
          FROM customer_rc WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, h.root, h.depth + 1
          FROM customer_rc c JOIN h ON c.c_custkey div 10 = h.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT custkey, root, depth FROM h
        """
    )


register(
    "recursive_cte_q",
    recursive_cte_q,
    """
    WITH RECURSIVE h(custkey, root, depth) AS (
      SELECT c_custkey, c_custkey, 0
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, h.root, h.depth + 1
      FROM customer c JOIN h ON c.c_custkey // 10 = h.custkey
      WHERE c.c_custkey >= 10
    )
    SELECT custkey, CAST(root AS BIGINT) AS root, CAST(depth AS INT) AS depth
    FROM h
    """,
)


# ==========================================================================
# collation_q (round 4)
# ==========================================================================


def collation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4): case-insensitive grouping via
    ``COLLATE UTF8_LCASE`` — collation-aware comparison is an engine
    capability (hash/sort keys under the collation), not an expression
    rewrite.  Case variance is injected deterministically (every odd
    part upper-cases its name), then part names are grouped
    case-insensitively; output keys are canonicalized with lower() so
    both engines emit identical strings.

    At 100 TB a collated group-by hashes the collation key directly —
    same single exchange as a plain groupBy, no lower() projection
    materialized.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 1, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("name_cased"),
    )
    part.createOrReplaceTempView("part_coll")
    return spark.sql(
        """
        SELECT lower(name_grp) AS name_ci, n, min_key
        FROM (
          SELECT name_cased COLLATE UTF8_LCASE AS name_grp,
                 COUNT(*) AS n, MIN(p_partkey) AS min_key
          FROM part_coll
          GROUP BY name_cased COLLATE UTF8_LCASE
        )
        """
    )


register(
    "collation_q",
    collation_q,
    """
    WITH cased AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 1 THEN upper(p_name)
                  ELSE p_name END AS name_cased
      FROM part)
    SELECT lower(name_cased) AS name_ci, COUNT(*) AS n,
           MIN(p_partkey) AS min_key
    FROM cased GROUP BY lower(name_cased)
    """,
)


# ==========================================================================
# from_xml_q (round 4)
# ==========================================================================


def from_xml_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed XML parsing (``from_xml``, new in Spark 4): each event is
    serialized to an XML fragment and parsed back with an explicit
    schema, and the round-tripped fields drive an aggregate — the XML
    sibling of ``from_json_q``, completing the semi-structured parser
    family (JSON / VARIANT / XML).

    The oracle computes the same aggregate from the base columns
    (DuckDB has no XML type) — equality proves the serialize+parse
    pair is lossless.
    """
    ev = load_table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><t>"),
        F.col("event_type"),
        F.lit("</t><u>"),
        F.col("user_id").cast("string"),
        F.lit("</u><v>"),
        F.format_number(F.col("value").cast("decimal(18,2)"), 2),
        F.lit("</v></e>"),
    )
    parsed = ev.select(
        F.from_xml(xml, "t STRING, u BIGINT, v STRING").alias("x")
    )
    return parsed.groupBy(F.col("x.t").alias("event_type")).agg(
        F.count_distinct(F.col("x.u")).alias("n_users"),
        F.sum(F.regexp_replace("x.v", ",", "").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


register(
    "from_xml_q",
    from_xml_q,
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)


# ==========================================================================
# sql_parameterized (round 4)
# ==========================================================================


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL + the IDENTIFIER clause: the query text binds
    a table name and a threshold as named parameters
    (``spark.sql(..., args=...)``) — injection-safe templating as an
    API capability, distinct from string interpolation (the literal is
    bound AFTER parsing, and IDENTIFIER() is the only sanctioned way
    to parameterize an identifier).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :thr
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders_param", "thr": 150_000.0},
    )


register(
    "sql_parameterized",
    sql_parameterized,
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)


# ==========================================================================
# udf_arrow_optimized (round 4)
# ==========================================================================


def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (``F.udf(..., useArrow=True)``,
    Spark 4): same logical row-function contract as the classic pickled
    UDF (``python_udf_scalar``) but executed over Arrow batches — the
    drop-in upgrade path when a per-row function can't be vectorized
    by hand.  Registered over the same bounded input so the boundary
    matrix shows pickled vs Arrow side by side.
    """
    from pyspark.sql.types import StringType

    def acronym(s):
        return "".join(w[0] for w in s.split(" ") if w)

    fn = F.udf(acronym, StringType(), useArrow=True)
    nat = load_table(spark, sf_dir, "nation")
    return nat.select(
        "n_nationkey", fn(F.col("n_name")).alias("acronym")
    )


register(
    "udf_arrow_optimized",
    udf_arrow_optimized,
    """
    SELECT n_nationkey,
           array_to_string(list_transform(
             list_filter(string_split(n_name, ' '), w -> len(w) > 0),
             w -> w[1]), '') AS acronym
    FROM nation
    """,
)


# ==========================================================================
# try_functions_q / group_by_all_q / approx_top_k_q (round 4, final)
# ==========================================================================


def try_functions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_`` error-safe function family (try_divide / try_cast /
    try_add): under ANSI mode (ON by default in Spark 4, and in this
    engine) arithmetic errors THROW — these are the sanctioned
    per-expression escape hatches that return NULL instead, and a
    pipeline that scrubs dirty data needs them.  The census counts
    NULL results per failure class over a deterministic dirty stripe.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        # dirty stripes: zero denominator every 11th, unparseable digit
        # string from the type name, near-overflow addend every 13th
        F.when(F.col("event_id") % 11 == 0, F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("den"),
        F.when(
            F.col("event_id") % 13 == 0, F.lit(9_223_372_036_854_775_807)
        )
        .otherwise(F.col("event_id"))
        .alias("big"),
    )
    t = ev.select(
        "event_type",
        F.expr("try_divide(value, den)").alias("ratio"),
        F.expr("try_cast(substr(event_type, 1, 2) AS INT)").alias("as_int"),
        F.expr("try_add(big, 1)").alias("plus1"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ratio").isNull(), 1).otherwise(0)).alias("n_div_null"),
        F.sum(F.when(F.col("as_int").isNull(), 1).otherwise(0)).alias("n_cast_null"),
        F.sum(F.when(F.col("plus1").isNull(), 1).otherwise(0)).alias("n_add_null"),
    )


register(
    "try_functions_q",
    try_functions_q,
    """
    WITH ev AS (
      SELECT event_id, event_type, value,
             CASE WHEN event_id % 11 = 0 THEN 0.0 ELSE value END AS den,
             CASE WHEN event_id % 13 = 0 THEN 9223372036854775807
                  ELSE event_id END AS big
      FROM events)
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN den = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           CAST(SUM(CASE WHEN TRY_CAST(substr(event_type, 1, 2) AS INT)
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
           CAST(SUM(CASE WHEN big = 9223372036854775807 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_add_null
    FROM ev GROUP BY event_type
    """,
)


_GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


def group_by_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (modern SQL sugar, Spark 4
    and DuckDB both): the grouping key set is inferred from the
    non-aggregate select list — one query text runs verbatim on both
    engines, which is itself the point (dialect convergence)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


register("group_by_all_q", group_by_all_q, _GROUP_BY_ALL_SQL)


def approx_top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Spark 4 sketch aggregate): frequency sketch
    over event types, relationalized by exploding the (item, count)
    result array.  With k >= the true distinct count (5 here) the
    sketch is EXACT, which is what makes the key oracle-checkable —
    the same reasoning ``approx_count_distinct_q`` uses.  At real
    cardinalities the sketch's bounded memory replaces a full
    groupBy; the exact regime pins the plumbing.
    """
    ev = load_table(spark, sf_dir, "events")
    topk = ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )


register(
    "approx_top_k_q",
    approx_top_k_q,
    """
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type
    """,
)


# ==========================================================================
# pandas_udaf_q (round 4, final)
# ==========================================================================


def pandas_udaf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the custom-aggregate boundary that
    completes the Python matrix (scalar pandas_udf, GROUPED_AGG
    pandas_udf, mapInPandas, applyInPandas, applyInPandasWithState,
    mapInArrow, UDTF, row UDF, Arrow-optimized UDF, Python data
    source): a 10%-trimmed aggregate per event type, the robust
    statistic Spark has no built-in for.

    Exactness contract: the kernel works in integer CENTS
    (round(value * 100) is exact for the 2-decimal event values), so
    the trimmed sum is order-independent and bit-identical to the
    oracle's window-ranked integer arithmetic — the same trick the
    quality_micros pipeline uses, extended to a custom aggregate.

    Plan: one (event_type) exchange; the UDAF receives each group as
    an Arrow batch (5 groups here; at 100 TB the same plan holds
    because group count, not group size, bounds the final stage).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def trimmed_sum_cents(v):
        cents = (v * 100).round().astype("int64").sort_values()
        k = len(cents) // 10
        kept = cents.iloc[k : len(cents) - k] if k else cents
        return int(kept.sum())

    def n_rows(v):
        return len(v)

    # Spark rejects mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg ([INVALID_PANDAS_UDF_PLACEMENT]) — so the count is a
    # second pandas UDAF over the same grouping.
    trimmed_sum_cents.__annotations__ = {"v": pd.Series, "return": int}
    n_rows.__annotations__ = {"v": pd.Series, "return": int}
    udaf = pandas_udf(trimmed_sum_cents, "bigint")
    udaf_n = pandas_udf(n_rows, "bigint")

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        udaf_n(F.col("value")).alias("n"),
        udaf(F.col("value")).alias("trimmed_sum_cents"),
    )


register(
    "pandas_udaf_q",
    pandas_udaf_q,
    """
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY event_type ORDER BY
                                CAST(round(value * 100) AS BIGINT)) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10
                         THEN c ELSE 0 END) AS BIGINT) AS trimmed_sum_cents
    FROM cents GROUP BY event_type
    """,
)


# ==========================================================================
# pandas_cogroup_q — the cogrouped-map Python boundary
# ==========================================================================


def pandas_cogroup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInPandas`` — the two-sided grouped Python
    boundary: each customer's ORDERS and EVENTS arrive as two aligned
    pandas frames in one call (the merge-per-entity shape that a
    single-side grouped map cannot express without a pre-join).

    The function computes, per customer, order count, event count, and
    the integer-cent order total — deliberately simple arithmetic so
    the boundary (co-partitioning, two-frame alignment, empty-side
    handling: customers with orders but no events and vice versa) is
    what the oracle checks, via a FULL OUTER per-entity aggregate
    join.  Both sides shuffle S(entity) once — at 100 TB this is the
    entity-resolution boundary (merge CRM + clickstream per user).
    """
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cid"), "o_totalprice"
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("cid"), "value"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cid = int(left["cid"].iloc[0] if len(left) else right["cid"].iloc[0])
        # Half-AWAY rounding per price (prices are positive): Python's
        # round() is banker's (half-to-even) and would diverge from the
        # oracle's SQL round() on an exact .5 cent boundary (review
        # finding — latent on this fixture, pinned anyway).
        cents = int(sum(math.floor(float(v) * 100 + 0.5) for v in left["o_totalprice"]))
        return pd.DataFrame(
            {
                "cid": [cid],
                "n_orders": [len(left)],
                "n_events": [len(right)],
                "order_cents": [cents],
            }
        )

    out = (
        orders.groupBy("cid")
        .cogroup(events.groupBy("cid"))
        .applyInPandas(
            merge, "cid long, n_orders long, n_events long, order_cents long"
        )
    )
    return out


register(
    "pandas_cogroup_q",
    pandas_cogroup_q,
    """
    WITH o AS (
      SELECT o_custkey AS cid, COUNT(*) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS order_cents
      FROM orders GROUP BY o_custkey),
    e AS (SELECT user_id AS cid, COUNT(*) AS n_events
          FROM events GROUP BY user_id)
    SELECT COALESCE(o.cid, e.cid) AS cid,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(order_cents, 0) AS order_cents
    FROM o FULL OUTER JOIN e ON o.cid = e.cid
    """,
)


# ==========================================================================
# arrow_grouped_map — applyInArrow grouped map
# ==========================================================================


def arrow_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy(...).applyInArrow`` (Spark 4) — the grouped-map
    boundary WITHOUT the pandas conversion layer: each label group's
    embeddings arrive as a pyarrow Table and the reduction runs on the
    Arrow buffers directly (numpy view, no per-column Series
    materialization) — the lowest-overhead grouped Python hook,
    completing the matrix next to applyInPandas (grouped_map_normalize)
    and mapInArrow (arrow_map_batch).

    Per label: vector count and the integer sum of per-ELEMENT
    milli-quantized coordinates — quantization happens on the raw
    values BEFORE any reduction (the _proto_summary discipline), so
    the integer sum is exactly order-independent; quantizing after a
    float mean would leave np-pairwise vs SQL-sequential low-bit
    drift at the rounding boundary (review finding), and np.rint's
    half-to-even would diverge from SQL round()'s half-away ties, so
    half-away is computed explicitly.
    """
    import numpy as np
    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")

    def stats(tbl: pa.Table) -> pa.Table:
        col = tbl.column("embedding").combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64) * 1000.0
        q = np.where(
            flat >= 0, np.floor(flat + 0.5), np.ceil(flat - 0.5)
        ).astype(np.int64)
        label = int(tbl.column("label")[0].as_py())
        return pa.table(
            {
                "label": pa.array([label], pa.int32()),
                "n_vecs": pa.array([len(tbl)], pa.int64()),
                "coord_q_sum": pa.array([int(q.sum())], pa.int64()),
            }
        )

    return emb.groupBy("label").applyInArrow(
        stats, "label int, n_vecs long, coord_q_sum long"
    )


register(
    "arrow_grouped_map",
    arrow_grouped_map,
    """
    WITH expl AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings),
    q AS (
      SELECT label, CAST(SUM(CAST(round(v * 1000) AS BIGINT)) AS BIGINT)
               AS coord_q_sum
      FROM expl GROUP BY label),
    n AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label)
    SELECT n.label, n.n_vecs, q.coord_q_sum
    FROM n JOIN q ON n.label = q.label
    """,
)


# ==========================================================================
# udtf_polymorphic — UDTF with analyze()-computed output schema
# ==========================================================================

UDTF_POLY_N = 3


def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 3.5+/4): the output SCHEMA is
    computed at plan time by a static ``analyze()`` from the literal
    argument — here ``lead_tokens(text, n)`` emits columns
    ``tok1..tokN`` (first n whitespace tokens, null-padded), so the
    same function is reusable at any width without re-registration.
    The fixed-schema sibling is ``udtf_split_words``; this key pins
    the analyze-time type computation, the remaining UDTF slot.

    Runs as one projection-shaped generator per row — no shuffle;
    the oracle reproduces n=UDTF_POLY_N with split_part columns.
    """
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            schema = StructType()
            for i in range(1, width + 1):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = [t for t in (text or "").split(" ") if t]
            row = tuple(toks[i] if i < len(toks) else None for i in range(n))
            yield row

    fn = udtf(LeadTokens)
    spark.udtf.register("lead_tokens", fn)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_poly")
    return spark.sql(
        f"""
        SELECT d.doc_id, t.*
        FROM docs_poly d,
             LATERAL lead_tokens(d.text, {UDTF_POLY_N}) t
        """
    )


register(
    "udtf_polymorphic",
    udtf_polymorphic,
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
      FROM documents)
    SELECT doc_id,
           {", ".join(f"t[{i}] AS tok{i}" for i in range(1, UDTF_POLY_N + 1))}
    FROM toks
    """,
)
