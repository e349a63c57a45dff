"""Semantic invariants of the round-4 batch-2 operators (sources, map
functions, streaming parquet sink, iterative PageRank)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_pagerank_matches_sequential_emulation(spark):
    """The unrolled distributed PageRank equals a pure-Python
    emulation of the same integer-scaled recurrence over the same
    symmetric edge set."""
    from collections import defaultdict

    from spark_streaming_clustering_spark.operators.analytics_surface import (
        PR_ITERS,
        PR_SCALE,
        PR_TOPK,
        pagerank_trade,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    orders = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    pairs = set()
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        ck = orders.get(r.l_orderkey)
        if ck is not None:
            pairs.add((ck * 2, r.l_suppkey * 2 + 1))
    out_edges = defaultdict(list)
    for c, s in pairs:
        out_edges[c].append(s)
        out_edges[s].append(c)
    rank = {n: PR_SCALE for n in out_edges}
    for _ in range(PR_ITERS):
        nxt = defaultdict(int)
        for u, vs in out_edges.items():
            contrib = rank[u] // len(vs)
            for v in vs:
                nxt[v] += contrib
        rank = {v: 150000 + (s * 85) // 100 for v, s in nxt.items()}
    expect = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:PR_TOPK]
    got = [(r.node, r.rank) for r in pagerank_trade(spark, SF_SMOKE).collect()]
    assert got == expect
    kinds = {r.node: r.kind for r in pagerank_trade(spark, SF_SMOKE).collect()}
    for node, kind in kinds.items():
        assert kind == ("customer" if node % 2 == 0 else "supplier")


def test_streaming_parquet_sink_equals_batch(spark):
    """The drained streaming-parquet roundtrip equals the same
    filter+aggregate computed in one batch pass."""
    from pyspark.sql import functions as F

    from spark_streaming_clustering_spark.operators.streaming_surface import (
        streaming_parquet_sink,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    got = {
        r.event_type: (r.n, r.sum_value)
        for r in streaming_parquet_sink(spark, SF_SMOKE).collect()
    }
    exp = {
        r.event_type: (r.n, r.sum_value)
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("value") > 100.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == exp and got


def test_source_roundtrips_preserve_corpus(spark):
    """Text-lines and binaryFile sources reproduce content-sensitive
    hashes of the original documents table."""
    from pyspark.sql import functions as F

    from spark_streaming_clustering_spark.operators.scale_surface import (
        _docs_subset,
        _roundtrip_check,
        source_binary_files,
        source_text_lines,
    )

    direct = {
        r.lang: (r.n, r.sum_chars, r.sum_hash)
        for r in _roundtrip_check(_docs_subset(spark, SF_SMOKE)).collect()
    }
    via_text = {
        r.lang: (r.n, r.sum_chars, r.sum_hash)
        for r in source_text_lines(spark, SF_SMOKE).collect()
    }
    assert via_text == direct and direct

    # binaryFile: each lang blob's byte length is the sum of its text
    # lengths plus the newline separators
    n_per_lang = {r.lang: r.n for r in _roundtrip_check(_docs_subset(spark, SF_SMOKE)).collect()}
    for r in source_binary_files(spark, SF_SMOKE).collect():
        n, sum_chars, _ = direct[r.lang]
        assert r.n_bytes == sum_chars + (n - 1)
        assert len(r.content_sha256) == 64


def test_map_funcs_counts_consistent(spark):
    """Map sizes and the relationalized key list agree; probing 'the'
    never exceeds the doc's total term count."""
    from spark_streaming_clustering_spark.operators.builtins_surface import (
        map_funcs_q,
    )

    rows = map_funcs_q(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_freq_terms <= r.n_terms
        n_listed = len(r.freq_terms.split(",")) if r.freq_terms else 0
        assert n_listed == r.n_freq_terms
        assert r.n_the >= 0
