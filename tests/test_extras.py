"""Round-6 extras: skyline_pareto.

Brute-force property checks at sf0.001 (the oracle gate at sf0.01 is
the primary check; these pin SEMANTICS against an independent Python
reimplementation so an engine-coincident oracle bug can't hide), plus
plan-shape pins for the scale claims."""

from __future__ import annotations

import math

from spark_streaming_clustering_spark.operators.extras_surface import skyline_pareto
from spark_streaming_clustering_spark.plans import formatted_plan
from spark_streaming_clustering_spark.sources.tables import load_table


def test_skyline_matches_bruteforce(spark, sf_dir):
    pts = [
        (r.p_partkey, int(math.floor(r.p_retailprice * 100 + 0.5)), int(r.p_size))
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    expect = {
        (k, pc, sz)
        for (k, pc, sz) in pts
        if not any(
            qc <= pc and qs >= sz and (qc < pc or qs > sz)
            for (_, qc, qs) in pts
        )
    }
    got = {tuple(r) for r in skyline_pareto(spark, sf_dir).collect()}
    assert got == expect and len(got) >= 1


def test_skyline_frontier_is_monotone(spark, sf_dir):
    """On the frontier, strictly increasing price must mean strictly
    increasing size (otherwise the cheaper point would dominate)."""
    rows = skyline_pareto(spark, sf_dir).collect()  # ordered by price
    for a, b in zip(rows, rows[1:]):
        assert a.price_cents <= b.price_cents
        if a.price_cents < b.price_cents:
            assert b.size > a.size


def test_skyline_plan_bucket_parallel(spark, sf_dir):
    plan = formatted_plan(skyline_pareto(spark, sf_dir))
    # prefix-maxima relation joined back via broadcast, not shuffle
    assert "BroadcastExchange" in plan
    # no quadratic path: the NOT EXISTS formulation would plan a
    # nested-loop/cartesian; the sweep must not
    assert "CartesianProduct" not in plan
