"""Invariants of the TPC-H derived-fixture layer (tpch_ext.py).

Oracle equality is the selfcheck/driver's job; these tests pin the
DERIVATION invariants the oracle comparison cannot articulate — if a
modulo constant drifts, both engines would drift together and the
oracle would stay green while the fixture silently degenerates."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_clustering_spark.operators.tpch_ext import (
    register_ext_views,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_partsupp_four_distinct_suppliers_per_part(spark):
    """TPC-H cardinality: every part has EXACTLY 4 distinct suppliers
    (the stride-17 mapping must not collide at any fixture supplier
    count), and every ps_suppkey refers to a real supplier."""
    for sf in (SF_SMOKE, SF_ORACLE):
        register_ext_views(spark, sf)
        bad = spark.sql(
            """SELECT ps_partkey FROM partsupp GROUP BY ps_partkey
               HAVING COUNT(DISTINCT ps_suppkey) <> 4"""
        ).count()
        assert bad == 0, f"supplier collision at {sf}"
        dangling = spark.sql(
            """SELECT COUNT(*) AS n FROM partsupp
               LEFT JOIN supplier ON ps_suppkey = s_suppkey
               WHERE s_suppkey IS NULL"""
        ).collect()[0].n
        assert dangling == 0, f"dangling ps_suppkey at {sf}"


def test_lineitem_x_date_and_domain_invariants(spark):
    """Derived dates stay within the construction bounds
    (commitdate in shipdate +-30 d, receiptdate in shipdate +1..+30 d)
    and the shipmode/shipinstruct domains are exactly the TPC-H ones —
    with every value actually produced (no dead CASE branch)."""
    register_ext_views(spark, SF_ORACLE)
    row = spark.sql(
        """SELECT
             MIN(datediff(l_commitdate, CAST(l_shipdate AS DATE))) AS cmin,
             MAX(datediff(l_commitdate, CAST(l_shipdate AS DATE))) AS cmax,
             MIN(datediff(l_receiptdate, CAST(l_shipdate AS DATE))) AS rmin,
             MAX(datediff(l_receiptdate, CAST(l_shipdate AS DATE))) AS rmax
           FROM lineitem_x"""
    ).collect()[0]
    assert -30 <= row.cmin and row.cmax <= 30
    assert 1 <= row.rmin and row.rmax <= 30
    modes = {r.l_shipmode for r in spark.sql(
        "SELECT DISTINCT l_shipmode FROM lineitem_x").collect()}
    assert modes == {"REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"}
    instr = {r.l_shipinstruct for r in spark.sql(
        "SELECT DISTINCT l_shipinstruct FROM lineitem_x").collect()}
    assert instr == {"DELIVER IN PERSON", "COLLECT COD", "NONE",
                     "TAKE BACK RETURN"}


def test_customer_phone_country_code_recovers_nation(spark):
    """substr(c_phone, 1, 2) must invert to 10 + c_nationkey for every
    customer — Q22's grouping depends on it."""
    register_ext_views(spark, SF_ORACLE)
    bad = spark.sql(
        """SELECT COUNT(*) AS n FROM customer_x
           WHERE CAST(substr(c_phone, 1, 2) AS INT) <> 10 + c_nationkey"""
    ).collect()[0].n
    assert bad == 0


def test_tpch_queries_nondegenerate_at_oracle_sf(spark):
    """Every round-5 TPC-H shape returns rows at sf0.01 — a predicate
    calibration drifting to an empty result would keep the oracle green
    (both engines agree on nothing) while gutting the test."""
    from spark_streaming_clustering_spark.operators.registry import QUERIES

    for key in ("sql_tpch_q2", "sql_tpch_q4", "sql_tpch_q9", "sql_tpch_q11",
                "sql_tpch_q12", "sql_tpch_q16", "sql_tpch_q19", "sql_tpch_q20",
                "sql_tpch_q21", "sql_tpch_q22"):
        assert QUERIES[key](spark, SF_ORACLE).count() > 0, key
