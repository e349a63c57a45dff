"""Tier-A relational operator surface (SURVEY.md section 2, A1-A36).

Each query key from the survey's operator inventory becomes a named
builder ``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle SQL
string, registered with the central registry.  These re-express the
reference's RDD operators as Catalyst plans; reference citations sit on
each builder.

Determinism rules (SURVEY section 5): money/value sums go through
exact decimal casts; ``collect_set`` is always wrapped in
``sort_array``; every limit query has a total order; floats that cross
an aggregation-order boundary are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vec
from ..sources.tables import load_table
from .registry import register


# --- A1: batch scan with projection + filter pushdown --------------------
# ref: batchStreamRun.scala:37 (sc.textFile init scan)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") > 45)
    )


register(
    "scan_parquet",
    scan_parquet,
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45",
)


# --- A4: CSV-style parse: string -> array<double> ------------------------
# ref: batchStreamRun.scala:37,40 (split(separator).map(_.toDouble))
# Output encoding: the parsed vector is emitted via vec.fmt_vec (','-joined
# %.6f) so the driver's pandas canonicalizer can hash it — list cells are
# unhashable there.  The split/cast array machinery is still exercised.
def csv_parse_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        ",",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
    )
    parsed = F.transform(F.split(line, ","), lambda x: x.cast("double"))
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        vec.fmt_vec(parsed).alias("parsed"),
    )


register(
    "csv_parse_cast",
    csv_parse_cast,
    """
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_transform(
             string_split(concat_ws(',', CAST(l_orderkey AS VARCHAR),
                                         CAST(l_linenumber AS VARCHAR),
                                         CAST(l_partkey AS VARCHAR)), ','),
             x -> printf('%.6f', CAST(x AS DOUBLE))), ',') AS parsed
    FROM lineitem
    """,
)


# --- A5: positional slice -> (features, label, id) ------------------------
# ref: batchStreamModel.scala:46-51 (pointToObjet)
def project_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.array(
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_linenumber").cast("double"),
        F.col("l_orderkey").cast("double"),
    )
    return li.select(
        vec.fmt_vec(F.slice(arr, 1, 3)).alias("features"),
        arr[3].cast("int").alias("label"),
        arr[4].cast("bigint").alias("id"),
    )


register(
    "project_slice",
    project_slice,
    """
    WITH arr AS (
      SELECT [l_quantity, l_discount, l_tax,
              CAST(l_linenumber AS DOUBLE), CAST(l_orderkey AS DOUBLE)] AS a
      FROM lineitem)
    SELECT array_to_string(list_transform(a[1:3], x -> printf('%.6f', x)), ',') AS features,
           CAST(a[4] AS INT) AS label, CAST(a[5] AS BIGINT) AS id
    FROM arr
    """,
)


# --- A6: limit / head (total order => deterministic) ----------------------
# ref: batchStream.scala:73 (take(2)); batchStreamRun.scala:45 (take(1))
def limit_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(5)
    )


register(
    "limit_k",
    limit_k,
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 5",
)


# --- A7: non-empty guard / count ------------------------------------------
# ref: batchStream.scala:87 (rdd.count() > 0)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


register("count_star", count_star, "SELECT COUNT(*) AS n FROM lineitem")


# --- A9: hash aggregation, partial+final ----------------------------------
# ref: batchStreamModel.scala:66-78 (aggregateByKey with combiners) —
# Catalyst emits HashAggregate(partial) -> Exchange -> HashAggregate(final)
# automatically, the exact map-side-combine topology the reference hand-codes.
def groupby_agg_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


register(
    "groupby_agg_sums",
    groupby_agg_sums,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)


# --- A14: group-by + sum (error per node) ---------------------------------
# ref: batchStreamModel.scala:254-255
def groupby_sum_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


register(
    "groupby_sum_err",
    groupby_sum_err,
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)


# --- A11: set aggregate (assigned-id sets) --------------------------------
# ref: batchStreamModel.scala:69,163 (Set union aggregate)
def collect_set_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "collect_set_ids",
    collect_set_ids,
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
)


# --- A15: semi-join (stats of neighbor nodes) -----------------------------
# ref: batchStreamModel.scala:172-177 (filter by membership)
def semi_join_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "semi")


register(
    "semi_join_neighbors",
    semi_join_neighbors,
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)


# --- A24: predicate filter (> threshold) ----------------------------------
# ref: batchStreamModel.scala:211-225 (age > max_age edge selection)
def filter_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_totalprice")
    )


register(
    "filter_gt",
    filter_gt,
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0",
)


# --- A25: equality filter + projection ------------------------------------
# ref: batchStreamModel.scala:151,172 (adjacency-row neighbor extraction)
def filter_eq_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


register(
    "filter_eq_project",
    filter_eq_project,
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
)


# --- A26: argmin / min-by --------------------------------------------------
# ref: batchStreamModel.scala:314-315 (weakest node for fading)
def argmin_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    return sup.agg(
        F.min_by("s_suppkey", "s_acctbal").alias("weakest_key"),
        F.min("s_acctbal").alias("min_bal"),
    )


register(
    "argmin_minby",
    argmin_minby,
    "SELECT arg_min(s_suppkey, s_acctbal) AS weakest_key, MIN(s_acctbal) AS min_bal FROM supplier",
)


# --- A27: argmax / max-by per group ---------------------------------------
# ref: batchStreamModel.scala:266,272 (highest-error node)
def argmax_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", "c_acctbal").alias("richest_key"),
        F.max("c_acctbal").alias("max_bal"),
    )


register(
    "argmax_maxby",
    argmax_maxby,
    """
    SELECT c_nationkey, arg_max(c_custkey, c_acctbal) AS richest_key,
           MAX(c_acctbal) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)


# --- A28: sort + limit (top-k) --------------------------------------------
# ref: batchStreamModel.scala:117-119 (full distance sort, take top-2)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


register(
    "orderby_limit",
    orderby_limit,
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
)


# --- A13: argmax within group via window ----------------------------------
# ref: batchStreamModel.scala:195 (most frequent runner-up BMU)
def argmax_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


register(
    "argmax_window",
    argmax_window,
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn = 1
    """,
)


# --- A29: scalar broadcast-multiply (weight decay) ------------------------
# ref: batchStreamModel.scala:144-146 (clusterWeights *= decayFactor)
def scalar_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey", (F.col("s_acctbal") * F.lit(0.9)).alias("decayed_bal")
    )


register(
    "scalar_decay",
    scalar_decay,
    "SELECT s_suppkey, s_acctbal * 0.9 AS decayed_bal FROM supplier",
)


# --- A30: element update / upsert by key (state merge) --------------------
# ref: batchStreamModel.scala:191,205 (weights(label) += count etc.)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    delta = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    )
    return cust.join(delta, cust.c_custkey == delta.o_custkey, "left").select(
        "c_custkey",
        (
            F.col("c_acctbal").cast("decimal(18,2)")
            + F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("new_bal"),
    )


register(
    "merge_upsert",
    merge_upsert,
    """
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2))
                + COALESCE(spend, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS new_bal
    FROM customer
    LEFT JOIN (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
               FROM orders GROUP BY o_custkey) d
      ON c_custkey = d.o_custkey
    """,
)


# --- A31: string formatting / export projections --------------------------
# ref: pointObj.scala:16-18,27-46; batchStreamModel.scala:434-444 (toString*)
def array_join_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), ", ")
    return docs.select(
        "doc_id",
        F.format_string("doc %d [%s] %d chars", "doc_id", "lang", "n_chars").alias("header"),
        head.alias("head_tokens"),
    )


register(
    "array_join_fmt",
    array_join_fmt,
    """
    SELECT doc_id,
           printf('doc %d [%s] %d chars', doc_id, lang, n_chars) AS header,
           array_to_string(string_split(text, ' ')[1:5], ', ') AS head_tokens
    FROM documents
    """,
)


# --- A32: driver-local data -> distributed dataset ------------------------
# ref: batchStream.scala:97-101 (sc.parallelize(model.toString*));
# values are the B12 hyper-parameter defaults (batchStream.scala:13-69).
def create_df_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        ("voisinage", 0.0),
        ("decayFactor", 0.9),
        ("lambdaAge", 1.2),
        ("nbNodesToAdd", 3.0),
        ("minWeight", 1.0),
        ("maxAge", 250.0),
        ("alphaErr", 0.5),
        ("d", 0.99),
    ]
    return spark.createDataFrame(rows, "param string, value double")


register(
    "create_df_literal",
    create_df_literal,
    """
    SELECT param, CAST(value AS DOUBLE) AS value FROM (VALUES
      ('voisinage', 0.0), ('decayFactor', 0.9), ('lambdaAge', 1.2),
      ('nbNodesToAdd', 3.0), ('minWeight', 1.0), ('maxAge', 250.0),
      ('alphaErr', 0.5), ('d', 0.99)) AS t(param, value)
    """,
)


# --- SQL API surface: the same engine through spark.sql ---------------------
_TPCH_Q1 = """
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 4) + 0.0 AS sum_qty,
           round(SUM(l_extendedprice), 4) + 0.0 AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 4) + 0.0 AS sum_disc_price,
           round(AVG(l_quantity), 6) + 0.0 AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape submitted through ``spark.sql`` over registered
    views — the declarative SQL front door (parser -> Catalyst ->
    same physical plan as the DataFrame build).  The oracle is the
    IDENTICAL SQL text run by DuckDB."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_TPCH_Q1)


register("sql_tpch_q1", sql_tpch_q1, _TPCH_Q1)


_TPCH_Q6 = """
    SELECT round(SUM(l_extendedprice * l_discount), 4) + 0.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter+agg — the
    predicate-pushdown showcase; all four filters reach the scan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_TPCH_Q6)


register("sql_tpch_q6", sql_tpch_q6, _TPCH_Q6)


_TPCH_Q3 = """
    SELECT o_orderkey,
           round(SUM(l_extendedprice * (1 - l_discount)), 4) + 0.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""


def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dims + fact join +
    agg + top-k; Catalyst broadcasts the filtered customer side."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q3)


register("sql_tpch_q3", sql_tpch_q3, _TPCH_Q3)


_TPCH_Q5 = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-way star join —
    region/nation prune customer AND supplier sides, the
    c_nationkey = s_nationkey cross-dimension predicate rides the fact
    join, and the decimal-exact revenue sum keeps the aggregate
    order-independent.  Catalyst broadcasts every dimension; the only
    shuffle is the final nation-cardinality aggregate — the canonical
    100 TB star-join plan.
    """
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q5)


register("sql_tpch_q5", sql_tpch_q5, _TPCH_Q5)


_TPCH_Q18 = """
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
"""


def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery over a
    HAVING aggregate — Catalyst rewrites the IN to a left semi join
    whose build side is the pre-aggregated order list, so the fact
    table is scanned twice but joined once, and the decimal quantity
    sums keep both the HAVING threshold and the output
    order-independent.
    """
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q18)


register("sql_tpch_q18", sql_tpch_q18, _TPCH_Q18)
