"""Flagship query: revenue by region / returnflag.

One query exercising scan -> filter -> multi-way join (broadcast dims)
-> aggregate -> sort: the relational spine every other operator hangs
off (SURVEY.md section 7 M0).

Scale notes (100 TB): lineitem is the fact table; orders->customer->
nation->region form a dimension chain.  region/nation are tiny and
customer is < 1/40 of lineitem, so the dimension chain is reduced
first (broadcast hash joins, zero shuffle) and the single shuffle in
the plan is the final groupBy on (r_name, l_returnflag) — low
cardinality, so the partial (map-side) aggregate collapses almost all
rows before the exchange.  Money sums go through decimal(18,4)/(18,6)
so results are order-independent and bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

SHIP_CUTOFF = "1997-01-01"


def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")

    # Reduce the dimension chain first; each of these is a broadcast join.
    cust_region = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    ord_region = orders.join(F.broadcast(cust_region), orders.o_custkey == cust_region.c_custkey).select(
        "o_orderkey", "r_name"
    )

    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(SHIP_CUTOFF).cast("timestamp"))
        .join(ord_region, lineitem.l_orderkey == ord_region.o_orderkey)
        .groupBy("r_name", "l_returnflag")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "l_returnflag")
    )


FLAGSHIP_ORACLE = f"""
SELECT r_name,
       l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate < TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY r_name, l_returnflag
ORDER BY r_name, l_returnflag
"""
