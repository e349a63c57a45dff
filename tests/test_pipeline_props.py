"""Semantic properties of the corpus-logistics operators.

The oracle gate proves Spark == DuckDB; these tests prove both engines
compute the RIGHT thing — the invariants a training pipeline actually
relies on (a split that partitions and stays stable, shards that
respect the packing rule, components that are a true fixpoint).
"""

from __future__ import annotations

from spark_streaming_clustering_spark.operators.pipeline_surface import (
    SHARD_TOKEN_BUDGET,
    dedup_connected_components,
    dedup_minhash_lsh_capped,
    shard_by_token_budget,
    split_train_test,
)
from spark_streaming_clustering_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_split_partitions_the_corpus_and_is_stable(spark):
    total = load_table(spark, SF_SMOKE, "documents").count()
    a = {(r.split, r.lang): r.n for r in split_train_test(spark, SF_SMOKE).collect()}
    assert sum(a.values()) == total  # partition: every doc in exactly one split
    assert {s for s, _ in a} <= {"train", "val", "test"}
    # pure-hash assignment: a second invocation is byte-identical
    b = {(r.split, r.lang): r.n for r in split_train_test(spark, SF_SMOKE).collect()}
    assert a == b


def test_shard_assignment_matches_greedy_packing(spark):
    rows = sorted(
        shard_by_token_budget(spark, SF_SMOKE).collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    cum: dict[str, int] = {}
    prev_shard: dict[str, int] = {}
    for r in rows:
        excl = cum.get(r.lang, 0)
        assert r.shard == excl // SHARD_TOKEN_BUDGET  # greedy exclusive-cumsum rule
        assert r.shard >= prev_shard.get(r.lang, 0)  # monotone per lang
        cum[r.lang] = excl + r.n_tok
        prev_shard[r.lang] = r.shard


def test_connected_components_is_a_fixpoint(spark):
    pairs = dedup_minhash_lsh_capped(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    labels = {
        r.doc_id: r.component
        for r in dedup_connected_components(spark, SF_SMOKE).collect()
    }
    # fixpoint: both endpoints of every edge carry the same label
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b], (p.doc_a, p.doc_b)
    # canonical labels: each component's label is its smallest member
    members: dict[int, list[int]] = {}
    for node, comp in labels.items():
        members.setdefault(comp, []).append(node)
    for comp, nodes in members.items():
        assert comp == min(nodes)


def test_results_invariant_to_shuffle_partition_count(spark):
    """Distributed-correctness property: changing the shuffle partition
    count must not change any oracle-checked result (catches hidden
    partition-order dependence — first/collect_list without sort,
    unstable tie-breaks, float accumulation order)."""
    from spark_streaming_clustering_spark.operators.registry import QUERIES

    keys = [
        "flagship_revenue",
        "groupby_agg_sums",
        "dedup_minhash_lsh_capped",
        "dedup_connected_components",
        "tf_idf_topk",
        "topk_q",
        "window_frame_range",
        "shard_by_token_budget",
        "string_agg_q",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("5", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results[n] = {
                k: sorted(map(tuple, QUERIES[k](spark, SF_SMOKE).collect()))
                for k in keys
            }
        for k in keys:
            assert results["5"][k] == results["17"][k], k
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
