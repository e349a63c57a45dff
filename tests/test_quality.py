"""Clustering quality: the G-Stream prototype graph must quantize the
data competitively with batch KMeans at the same centroid count —
validates the algorithm does useful clustering, not just bookkeeping."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_streaming_clustering_spark.sources.tables import load_table
from spark_streaming_clustering_spark.streaming.params import GStreamParams
from spark_streaming_clustering_spark.streaming.train import GStreamTrainer


def _embeddings(spark, sf_dir):
    pdf = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.transform("embedding", lambda x: x.cast("double")).alias("features"),
            F.col("vec_id").alias("id"),
        )
        .orderBy("id")
        .toPandas()
    )
    return np.stack(pdf["features"].to_numpy()), pdf


def _quantization_mse(x, centroids):
    d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return float(d2.min(axis=1).mean())


def test_gstream_quantizes_like_kmeans(spark, sf_dir):
    x, pdf = _embeddings(spark, sf_dir)
    # stream the points through G-Stream in 10 batches
    tr = GStreamTrainer(spark, GStreamParams(), nb_wind=10)
    per = len(pdf) // 10
    tr.init_from_seed(pdf.iloc[:2])
    for b in range(10):
        tr.step(pdf.iloc[b * per : (b + 1) * per].reset_index(drop=True))
    protos = tr.model.nodes
    assert protos.shape[0] >= 3  # the graph grew beyond the seed pair

    gstream_mse = _quantization_mse(x, protos)

    # batch KMeans with the same k on the same data (numpy Lloyd, fixed
    # seed, deterministic init from evenly spaced points)
    k = protos.shape[0]
    cent = x[:: max(len(x) // k, 1)][:k].copy()
    for _ in range(20):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        asn = d2.argmin(axis=1)
        for j in range(k):
            m = asn == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    kmeans_mse = _quantization_mse(x, cent)

    # online single-pass GNG vs converged batch Lloyd: within 5x
    assert gstream_mse <= 5.0 * kmeans_mse, (gstream_mse, kmeans_mse)


def _mis_python_replay(spark, sf_path: str):
    """Pure-Python Luby replay over the Spark-built pair relation
    (the pair generator itself is pinned by its own oracle): returns
    (kept_set, adj, rounds_to_empty)."""
    import hashlib
    from collections import defaultdict

    from spark_streaming_clustering_spark.operators.quality_surface import (
        dedup_simhash_hamming,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup_simhash_hamming(spark, sf_path)
        .select("doc_a", "doc_b")
        .collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)

    def prio(d):
        return (int(hashlib.md5(str(d).encode()).hexdigest()[:7], 16), d)

    live, kept, rounds = set(adj), set(), 0
    while live:
        rounds += 1
        chosen = {
            u
            for u in live
            if all(prio(u) < prio(v) for v in adj[u] if v in live)
        }
        kept |= chosen
        live -= chosen | {v for u in chosen for v in adj[u]}
    return kept, adj, rounds


def test_mis_matches_python_replay_and_guarantees(spark, sf_dir):
    """Exact replay pin plus the two MIS guarantees on the output:
    INDEPENDENCE (no two kept docs are near-dups) and MAXIMALITY
    (every dropped doc is a near-dup of some kept doc — nothing was
    dropped without cause)."""
    import hashlib

    from spark_streaming_clustering_spark.operators.quality_surface import (
        dedup_mis_max_retention,
    )

    kept, adj, _rounds = _mis_python_replay(spark, sf_dir)
    expect = {
        u: (
            int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16),
            len(adj[u]),
        )
        for u in kept
    }
    got = {
        r.doc_id: (r.priority, r.deg_full)
        for r in dedup_mis_max_retention(spark, sf_dir).collect()
    }
    assert got == expect and len(got) >= 1
    for u in kept:
        assert not (adj[u] & kept), u  # independence
    for u in adj:
        if u not in kept:
            assert adj[u] & kept, u  # maximality


def test_mis_retention_beats_keep_one_per_component(spark):
    """The contract teeth at EVERY committed fixture scale: the MIS
    keep-set is strictly larger than one-per-component retention (the
    chains exist), and Luby finishes within _MIS_ROUNDS - 2 (the
    margin both engines' fixed unrolls rely on)."""
    from spark_streaming_clustering_spark.operators.quality_surface import (
        _MIS_ROUNDS,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        kept, adj, rounds = _mis_python_replay(spark, f"/root/testdata/{sf}")
        seen, n_comp = set(), 0
        for s in adj:
            if s in seen:
                continue
            n_comp += 1
            stack = [s]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                stack.extend(adj[x] - seen)
        assert len(kept) > n_comp, (sf, len(kept), n_comp)
        assert rounds <= _MIS_ROUNDS - 2, (sf, rounds)
