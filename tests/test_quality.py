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
