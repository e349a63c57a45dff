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


# --- round-7 extras: shard_pack_two_phase / hll_union_rollup -------------


def test_two_phase_pack_equals_sequential_spec(spark, sf_dir):
    """The executed two-phase pack must reproduce the one-window
    sequential spec exactly (contiguous pids preserve doc_id order)."""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        shard_pack_two_phase,
    )
    from spark_streaming_clustering_spark.operators.pipeline_surface import (
        shard_by_token_budget,
    )

    two = {
        (r.doc_id, r.lang, r.n_tok, r.shard)
        for r in shard_pack_two_phase(spark, sf_dir).collect()
    }
    one = {
        (r.doc_id, r.lang, r.n_tok, r.shard)
        for r in shard_by_token_budget(spark, sf_dir).collect()
    }
    assert two == one and len(two) > 0


def test_two_phase_pack_plan_is_split_parallel(spark, sf_dir):
    """The scale claims: data-sized window partitioned by (lang, pid),
    offsets joined back via broadcast, no unpartitioned window."""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        shard_pack_two_phase,
    )

    plan = formatted_plan(shard_pack_two_phase(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # both windows carry a partition spec (no global single-task window)
    import re

    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        assert "lang" in m.group(1)


def test_hll_union_rollup_contract(spark, sf_dir):
    """ALL row present; n_sketches add up; every estimate in contract;
    the layout write is once-per-session (guarded by _SUCCESS)."""
    import os

    from spark_streaming_clustering_spark.operators.extras_surface import (
        _hll_daily_layout,
        hll_union_rollup,
    )

    rows = {r.event_type: r for r in hll_union_rollup(spark, sf_dir).collect()}
    assert "ALL" in rows and len(rows) > 1
    assert all(r.est_within_5pct for r in rows.values())
    per_type_sum = sum(
        r.n_sketches for t, r in rows.items() if t != "ALL"
    )
    assert rows["ALL"].n_sketches == per_type_sum
    # exact companions: ALL distinct users <= sum over types (overlap)
    assert rows["ALL"].exact_nd <= sum(
        r.exact_nd for t, r in rows.items() if t != "ALL"
    )
    out = _hll_daily_layout(spark, sf_dir)
    mtime = os.path.getmtime(os.path.join(out, "_SUCCESS"))
    hll_union_rollup(spark, sf_dir)  # second call must not rewrite
    assert os.path.getmtime(os.path.join(out, "_SUCCESS")) == mtime


def test_hll_union_survives_write_roundtrip(spark, sf_dir):
    """Merging sketches read back from parquet must give the same
    estimate as merging the in-memory sketches (lossless blob
    roundtrip + order-independent union)."""
    from pyspark.sql import functions as F

    from spark_streaming_clustering_spark.operators.extras_surface import (
        _hll_daily_layout,
    )

    direct = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    roundtrip = (
        spark.read.parquet(_hll_daily_layout(spark, sf_dir))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert direct == roundtrip
