"""Distributed E-step: nearest-2 assignment + per-node stats aggregate.

Re-expresses the reference's map/aggregateByKey stage
(batchStreamModel.scala:63-78,111-125) Spark-first:

* the centroid matrix rides to executors once per batch (Spark
  broadcast — the reference closure-captures the whole model into
  every task, an implicit broadcast);
* ``mapInPandas`` computes distances vectorized (numpy/BLAS) and emits
  PER-PARTITION PARTIAL AGGREGATES keyed by (bmu1, bmu2) — the
  map-side combine the reference hand-codes with ``aggregateByKey``;
* the driver merges <= partitions x |observed (bmu1,bmu2)| tiny rows.

Scale: the shuffle the reference pays between map and reduce is gone
entirely — partials flow straight to the driver (bounded by N^2 per
partition, N <= ~300).  At 100 TB the same plan holds: the batch scan
is the only heavy stage and it is embarrassingly parallel.

Latency: a Spark job costs ~200 ms of scheduling on this host, so for
small micro-batches (the reference's measured regime is ~100 points per
100 ms window) the trainer uses ``estep_local`` — the same numpy kernel
run driver-side with zero Spark jobs — and only falls back to the
distributed plan when a batch exceeds the small-batch threshold.  The
reference has the same topology: its per-batch work at this scale is
driver-bound too.

Tie semantics: the reference sorts (distance, index) pairs, so equal
distances resolve to the lower node position (findTwoNearestPointDist1L,
batchStreamModel.scala:117-119).  numpy's stable argsort over the
distance row reproduces that.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .gstream_model import PointStats

PARTIAL_SCHEMA = (
    "bmu1 int, bmu2 int, cnt long, sum_d2 double, sum_vec array<double>, ids array<long>"
)


def _assign_top2(x: np.ndarray, cent: np.ndarray):
    """Vectorized nearest-2 assignment (findTwoNearestPointDist1L,
    batchStreamModel.scala:111-125).  Returns (bmu1, bmu2, d2_min)."""
    c_sq = (cent * cent).sum(axis=1)
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (BLAS); clamp fp negatives
    d2 = np.maximum(
        (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cent.T) + c_sq[None, :], 0.0
    )
    order = np.argsort(d2, axis=1, kind="stable")  # ties -> lower index
    bmu1 = order[:, 0]
    bmu2 = order[:, 1]
    d2_min = d2[np.arange(len(x)), bmu1]
    return bmu1, bmu2, d2_min


def estep_local(x: np.ndarray, ids: np.ndarray, centroids: np.ndarray) -> dict[int, PointStats]:
    """Driver-local E-step over an in-memory batch — zero Spark jobs.

    Identical math to the distributed path (same ``_assign_top2``
    kernel), used for micro-batches below the trainer's small-batch
    threshold where job-scheduling latency would dominate.
    """
    x = np.ascontiguousarray(x, dtype=np.float64)
    bmu1, bmu2, d2_min = _assign_top2(x, centroids)
    out: dict[int, PointStats] = {}
    for b1 in np.unique(bmu1):
        mask = bmu1 == b1
        counts = np.bincount(bmu2[mask])
        out[int(b1)] = PointStats(
            defaultdict(int, {int(k): int(v) for k, v in enumerate(counts) if v}),
            float(d2_min[mask].sum()),
            x[mask].sum(axis=0),
            int(mask.sum()),
            set(int(i) for i in ids[mask]),
        )
    return out


def _partial_stats(pdf_iter, centroids_bc):
    """Executor side: vectorized top-2 assignment + partial aggregation."""
    cent = centroids_bc.value  # (n, dim) float64
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        x = np.stack(pdf["features"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        bmu1, bmu2, d2_min = _assign_top2(x, cent)

        acc: dict[tuple[int, int], list] = {}
        for i in range(len(x)):
            key = (int(bmu1[i]), int(bmu2[i]))
            slot = acc.get(key)
            if slot is None:
                acc[key] = [1, d2_min[i], x[i].copy(), [int(ids[i])]]
            else:
                slot[0] += 1
                slot[1] += d2_min[i]
                slot[2] += x[i]
                slot[3].append(int(ids[i]))
        yield pd.DataFrame(
            {
                "bmu1": [k[0] for k in acc],
                "bmu2": [k[1] for k in acc],
                "cnt": [v[0] for v in acc.values()],
                "sum_d2": [v[1] for v in acc.values()],
                "sum_vec": [v[2].tolist() for v in acc.values()],
                "ids": [v[3] for v in acc.values()],
            }
        )


def compute_point_stats(batch_df: DataFrame, centroids: np.ndarray) -> dict[int, PointStats]:
    """Run the E-step for one micro-batch.

    ``batch_df`` needs columns (features array<double>, id long);
    returns the reference's pointStats keyed by winner position.
    """
    spark = batch_df.sparkSession
    centroids_bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids))
    partials = batch_df.select("features", "id").mapInPandas(
        lambda it: _partial_stats(it, centroids_bc), PARTIAL_SCHEMA
    )
    rows = partials.collect()
    centroids_bc.unpersist()

    dim = centroids.shape[1]
    out: dict[int, PointStats] = {}
    for r in rows:
        st = out.get(r.bmu1)
        if st is None:
            st = out[r.bmu1] = PointStats(defaultdict(int), 0.0, np.zeros(dim), 0, set())
        st.bmu2_counts[r.bmu2] += r.cnt
        st.sum_d2 += r.sum_d2
        st.sum_vec = st.sum_vec + np.asarray(r.sum_vec)
        st.count += r.cnt
        st.ids.update(r.ids)
    return out
