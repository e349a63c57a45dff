"""Hypothesis property tests for the pure-numpy kernels (no Spark).

Covers SURVEY.md section 7 "hard parts": (a) assignment/aggregation
math vs naive reference implementations, (c) positional graph algebra
invariants (symmetry, squareness) under random update sequences.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from spark_streaming_clustering_spark.streaming.estep import (
    _assign_top2,
    _group_partials,
    estep_local,
)
from spark_streaming_clustering_spark.streaming.gstream_model import GStreamModel, PointStats
from spark_streaming_clustering_spark.streaming.params import GStreamParams

finite = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=64)


def batches(min_nodes=2, max_nodes=6, max_rows=24, dim=3):
    n_nodes = st.integers(min_nodes, max_nodes)
    n_rows = st.integers(1, max_rows)
    return n_nodes.flatmap(
        lambda k: n_rows.flatmap(
            lambda n: st.tuples(
                arrays(np.float64, (n, dim), elements=finite),
                arrays(np.float64, (k, dim), elements=finite),
            )
        )
    )


@settings(max_examples=150, deadline=None)
@given(batches())
def test_assign_top2_matches_bruteforce(xc):
    x, cent = xc
    bmu1, bmu2, d2_min = _assign_top2(x, cent)
    # The ||x||^2 - 2x.c + ||c||^2 expansion loses ~eps*(||x||^2+||c||^2)
    # to cancellation; assignment can only differ from the naive order
    # within that bound, so near-ties are excluded from the order check.
    max_c2 = float((cent * cent).sum(axis=1).max())
    for i in range(len(x)):
        d = ((x[i][None, :] - cent) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")
        tol = 1e-10 * max(float((x[i] * x[i]).sum()) + max_c2, 1.0)
        if d[order[1]] - d[order[0]] > tol:
            assert bmu1[i] == order[0]
        if len(d) > 2 and d[order[2]] - d[order[1]] > tol and d[order[1]] - d[order[0]] > tol:
            assert bmu2[i] == order[1]
        assert abs(d2_min[i] - d[bmu1[i]]) <= tol


@settings(max_examples=100, deadline=None)
@given(batches())
def test_group_partials_partition_the_batch(xc):
    x, cent = xc
    ids = np.arange(len(x), dtype=np.int64) * 7 + 3
    bmu1, bmu2, d2_min = _assign_top2(x, cent)
    parts = list(_group_partials(x, ids, bmu1, bmu2, d2_min, len(cent)))
    # groups partition the rows exactly
    assert sum(p[2] for p in parts) == len(x)
    all_ids = sorted(int(i) for p in parts for i in p[5])
    assert all_ids == sorted(ids.tolist())
    # per-group sums equal masked sums
    for b1, b2, cnt, sum_d2, sum_vec, id_grp in parts:
        mask = (bmu1 == b1) & (bmu2 == b2)
        assert cnt == int(mask.sum())
        np.testing.assert_allclose(sum_vec, x[mask].sum(axis=0), rtol=1e-9, atol=1e-9)
        assert abs(sum_d2 - d2_min[mask].sum()) <= 1e-9 * max(abs(sum_d2), 1.0)


@settings(max_examples=100, deadline=None)
@given(batches())
def test_estep_local_totals(xc):
    x, cent = xc
    ids = np.arange(len(x), dtype=np.int64)
    stats = estep_local(x, ids, cent)
    assert sum(s.count for s in stats.values()) == len(x)
    assert set().union(*(s.ids for s in stats.values())) == set(range(len(x)))
    for b1, s in stats.items():
        assert 0 <= b1 < len(cent)
        assert sum(s.bmu2_counts.values()) == s.count
        assert b1 not in s.bmu2_counts  # runner-up is never the winner


@st.composite
def update_sequences(draw):
    dim = 2
    n_batches = draw(st.integers(1, 6))
    seq = []
    for _ in range(n_batches):
        n_pts = draw(st.integers(1, 12))
        pts = draw(arrays(np.float64, (n_pts, dim), elements=finite))
        seq.append(pts)
    return seq


@settings(max_examples=60, deadline=None)
@given(update_sequences())
def test_model_invariants_under_random_updates(seq):
    """Whatever the batch sequence, the graph algebra keeps its
    invariants (the reference throws IllegalStateException on breakage,
    batchStreamModel.scala:231-233,310-312)."""
    m = GStreamModel(GStreamParams()).init_two_nodes([0.0, 0.0], [1.0, 1.0])
    next_id = 100
    for kk, pts in enumerate(seq, start=1):
        ids = np.arange(len(pts), dtype=np.int64) + next_id
        next_id += len(pts)
        stats = estep_local(pts, ids, m.nodes)
        m.update(stats, kk)
        n = m.n_nodes
        assert m.edges.shape == (n, n) and m.ages.shape == (n, n)
        assert len(m.weights) == len(m.errors) == len(m.node_ids) == n
        np.testing.assert_array_equal(m.edges, m.edges.T)
        has_edge = m.edges == 1
        np.testing.assert_array_equal(has_edge, ~np.isnan(m.ages) & has_edge)
        sym = np.where(np.isnan(m.ages), -1.0, m.ages)
        np.testing.assert_allclose(sym, sym.T)
        assert not has_edge.diagonal().any()
        # no isolated nodes survive the update (B5 runs inside update)
        if n > 0:
            assert has_edge.any(axis=1).all()
