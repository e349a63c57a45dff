"""Round-6 breadth batch: skyline dominance.

One operator (deliberately small: VERDICT r5 item 1 freezes surface
growth until the driver-verification queue drains), chosen because it
is a CLASS of query the engine did not yet demonstrate —
multi-objective pareto dominance.  (A funnel key was drafted too and
dropped on review: ``event_funnel`` already covers ordered
multi-stage conversion.)  Registered from the module imported LAST so their keys sort after every
pre-existing never-driver-verified key — the r6 driver window drains
the old queue first (VERDICT r5 item 1); these keys reach the driver in
a later window and are selfcheck-verified meanwhile.

Determinism rules per the house idioms: integer micros for time,
integer cents for money, floor(x+0.5) for half-away quantization on
both engines, explicit deterministic tie-breaks, no ELSE-defaulted
golden constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# skyline_pareto — multi-objective dominance (pareto frontier)
# --------------------------------------------------------------------------


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts on (minimize retail price, maximize size): a
    part survives iff no other part is cheaper-or-equal AND
    larger-or-equal with at least one strict.

    The textbook formulation is a quadratic NOT EXISTS self-join (the
    oracle); the distributed plan is the sort-free two-level sweep:

    1. bucket by price band (fixed 2-dollar widths -> price-ordered,
       bounded bucket count);
    2. per-bucket cumulative running max of size -> a bucket-count
       relation, tiny, window-ordered WITHOUT touching data rows;
    3. broadcast those prefix maxima back; a row is dominated by a
       STRICTLY CHEAPER bucket iff that prefix max >= its size, and
       within its own bucket by the partitioned RANGE-frame running
       max (strictly cheaper rows) or the equal-price group max.

    Every data-sized operation is partition-parallel (groupBy bucket,
    window PARTITIONED by bucket); the only ordered scan is over the
    bucket relation — metadata-sized at any scale.  Price quantized to
    integer cents with floor(x*100 + 0.5) on both engines (half-away
    parity; Python/NumPy round are banker's).
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    parts = parts.withColumn("bkt", F.expr("price_cents div 200"))
    # bucket-count relation: one row per price band
    bmax = parts.groupBy("bkt").agg(F.max("size").alias("bkt_max"))
    wprev = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_bkt = bmax.select(
        "bkt", F.max("bkt_max").over(wprev).alias("lower_bkt_max")
    )
    wrange = (
        Window.partitionBy("bkt")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy("bkt", "price_cents")
    flagged = (
        parts.join(F.broadcast(prev_bkt), "bkt")
        .withColumn("cheaper_in_bkt_max", F.max("size").over(wrange))
        .withColumn("eq_price_max", F.max("size").over(weq))
    )
    dominated = (
        (F.coalesce(F.col("lower_bkt_max"), F.lit(-1)) >= F.col("size"))
        | (F.coalesce(F.col("cheaper_in_bkt_max"), F.lit(-1)) >= F.col("size"))
        | (F.col("eq_price_max") > F.col("size"))
    )
    return (
        flagged.filter(~dominated)
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


_SKYLINE_ORACLE = """
    WITH parts AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part)
    SELECT p.p_partkey, p.price_cents, p.size
    FROM parts p
    WHERE NOT EXISTS (
      SELECT 1 FROM parts q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size))
    ORDER BY p.price_cents, p.p_partkey
"""

register("skyline_pareto", skyline_pareto, _SKYLINE_ORACLE)
