"""Semantic invariants of the round-4 lakehouse / corpus operators.

Oracle equality is the selfcheck/driver's job; these tests pin the
*semantics* the oracle comparison alone cannot articulate: interval
algebra for SCD2, packing bounds for the compaction planner, count
algebra for block dedup, and an independent numpy recompute for the
mapInArrow kernel.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE

np = pytest.importorskip("numpy")


def test_scd2_intervals_partition_user_history(spark):
    """Per user: versions are 1..n, exactly one open (is_current) row,
    intervals are ordered, non-overlapping and contiguous (each row's
    valid_to equals the next row's valid_from), and consecutive rows
    never carry the same status (change detection actually fired)."""
    from spark_streaming_clustering_spark.operators.lakehouse_surface import (
        scd2_dimension,
    )

    rows = scd2_dimension(spark, SF_SMOKE).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for hist in by_user.values():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.is_current for r in hist) == 1
        assert hist[-1].is_current and hist[-1].valid_to is None
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from
            assert a.valid_from < a.valid_to
            assert a.status != b.status


def test_compaction_plan_groups_are_target_bounded(spark):
    """Every output group's byte total is < target + its largest member
    (the next-fit bound), groups are contiguous in file order, and the
    running sum reconstructs exactly from the member sizes."""
    from spark_streaming_clustering_spark.operators.lakehouse_surface import (
        COMPACT_TARGET_BYTES,
        compaction_plan,
    )

    rows = sorted(compaction_plan(spark, SF_SMOKE).collect(), key=lambda r: r.file_id)
    assert rows
    cum = 0
    groups: dict = {}
    last_group = 0
    for r in rows:
        cum += r.est_bytes
        assert r.cum_bytes == cum
        assert r.out_group >= last_group  # contiguous, non-decreasing
        last_group = r.out_group
        g = groups.setdefault(r.out_group, {"bytes": 0, "max": 0})
        g["bytes"] += r.est_bytes
        g["max"] = max(g["max"], r.est_bytes)
    for g in groups.values():
        assert g["bytes"] < COMPACT_TARGET_BYTES + g["max"]


def test_dedup_paragraph_matches_sequential_emulation(spark):
    """The distributed block-dedup signal equals a driver-side
    emulation: same 10-token blocking, same corpus doc-frequency,
    same per-doc duplicated-block fraction."""
    from collections import defaultdict

    from spark_streaming_clustering_spark.operators.quality_surface import (
        PARA_TOKENS,
        dedup_paragraph,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    doc_blocks = {}
    block_docs = defaultdict(set)
    for d, text in texts.items():
        t = text.split(" ")
        nb = max((len(t) + PARA_TOKENS - 1) // PARA_TOKENS, 1)
        blocks = [
            " ".join(t[i * PARA_TOKENS : (i + 1) * PARA_TOKENS])
            for i in range(nb)
        ]
        doc_blocks[d] = blocks
        for b in blocks:
            block_docs[b].add(d)
    got = {r.doc_id: r for r in dedup_paragraph(spark, SF_SMOKE).collect()}
    assert set(got) == set(texts)
    for d, blocks in doc_blocks.items():
        n_dup = sum(1 for b in blocks if len(block_docs[b]) > 1)
        assert got[d].n_blocks == len(blocks)
        assert got[d].n_dup_blocks == n_dup
        assert got[d].dup_frac == round(n_dup / len(blocks), 6)


def test_quality_perplexity_bounds_and_floor_case(spark):
    """Cross-entropy is >= 0 (every bigram probability <= 1) and 0 only
    when each of the doc's prefix words is always followed by the same
    next word corpus-wide; n_bigrams == token count - 1."""
    from spark_streaming_clustering_spark.operators.quality_surface import (
        quality_perplexity,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    n_toks = {
        r.doc_id: len(r.text.split(" "))
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    rows = quality_perplexity(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams == n_toks[r.doc_id] - 1
        assert r.cross_entropy >= 0.0


def test_arrow_map_batch_matches_numpy_recompute(spark):
    """The Arrow-kernel stats equal a per-row numpy recompute of the
    same embeddings (widened to float64, same rounding)."""
    from spark_streaming_clustering_spark.operators.spark4_surface import (
        arrow_map_batch,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    rows = arrow_map_batch(spark, SF_SMOKE).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        v = vecs[r.vec_id]
        assert r.n_dims == v.size
        assert r.l2_norm == pytest.approx(math.sqrt(float((v * v).sum())), abs=2e-6)
        assert r.dim_mean == pytest.approx(float(v.mean()), abs=2e-6)


def test_cdc_apply_matches_sequential_emulation(spark):
    """CDC apply equals a per-key sequential replay: deleted keys
    absent, survivors carry the latest op's value and the full change
    count."""
    from collections import defaultdict

    from spark_streaming_clustering_spark.operators.lakehouse_surface import (
        cdc_apply,
    )
    from spark_streaming_clustering_spark.sources.tables import load_table

    feed = defaultdict(list)
    for e in load_table(spark, SF_SMOKE, "events").collect():
        op = (
            "delete"
            if e.event_type == "error"
            else "insert" if e.event_type == "signup" else "upsert"
        )
        feed[e.user_id].append((e.ts, e.event_id, op, e.value))
    expect = {}
    for uid, ops in feed.items():
        ops.sort()
        ts, _, op, val = ops[-1]
        if op != "delete":
            expect[uid] = (op, ts, round(val, 2), len(ops))
    got = {
        r.user_id: (r.last_op, r.last_ts, r.value, r.n_changes)
        for r in cdc_apply(spark, SF_SMOKE).collect()
    }
    assert got == expect and got
    # at least one key must have been deleted for the test to bite
    assert len(expect) < len(feed)


def test_snapshot_diff_census(spark):
    """Every user appears exactly once; v1 subset semantics hold
    (removed impossible when v2's window contains v1's); changed rows
    really differ and unchanged rows really don't."""
    from spark_streaming_clustering_spark.operators.lakehouse_surface import (
        snapshot_diff,
    )

    rows = snapshot_diff(spark, SF_SMOKE).collect()
    assert rows
    seen = set()
    statuses = set()
    for r in rows:
        assert r.user_id not in seen
        seen.add(r.user_id)
        statuses.add(r.status)
        assert r.status != "removed"  # window-1 events are inside window-2
        if r.status == "added":
            assert r.n_v1 is None and r.n_v2 is not None
        elif r.status == "changed":
            assert (r.n_v1, r.total_v1) != (r.n_v2, r.total_v2)
        elif r.status == "unchanged":
            assert (r.n_v1, r.total_v1) == (r.n_v2, r.total_v2)
    assert "changed" in statuses or "added" in statuses


def test_merge_into_upsert_copy_on_write(spark):
    """The merge must be partition-level copy-on-write: v2 holds ONLY
    the affected buckets {1, 3}, v1 keeps all 8; and all three clause
    kinds are visible in the read-back state."""
    import os

    from pyspark.sql import functions as F

    from spark_streaming_clustering_spark.operators.lakehouse_surface import (
        merge_into_upsert,
    )
    from spark_streaming_clustering_spark.sources.tables import (
        derived_layout_path,
        load_table,
    )

    final = merge_into_upsert(spark, SF_ORACLE)

    # the layout path has a single owner (derived_layout_path) — derive
    # it the same way rather than hand-rebuilding the naming scheme
    # (hand-built spelling broke when r7 nested layouts per prefix)
    base = derived_layout_path(spark, "merge_tbl", SF_ORACLE, "customer")
    v1_bkts = {d for d in os.listdir(os.path.join(base, "v1")) if d.startswith("bkt=")}
    v2_bkts = {d for d in os.listdir(os.path.join(base, "v2")) if d.startswith("bkt=")}
    assert v1_bkts == {f"bkt={i}" for i in range(8)}
    assert v2_bkts == {"bkt=1", "bkt=3"}  # copy-on-write: only touched buckets

    rows = final.collect()
    keys = {r.c_custkey for r in rows}
    base_keys = {
        r.c_custkey
        for r in load_table(spark, SF_ORACLE, "customer").select("c_custkey").collect()
    }
    inserted = keys - base_keys
    deleted = base_keys - keys
    assert inserted and all(k >= 1_000_000 for k in inserted)  # INSERT clause ran
    assert deleted and all(k % 8 in (1, 3) for k in deleted)  # DELETE clause ran
    # UPDATE clause ran: some surviving matched row has a shifted balance
    orig = {
        r.c_custkey: int(round(r.c_acctbal * 100))
        for r in load_table(spark, SF_ORACLE, "customer").collect()
    }
    updated = [r for r in rows if r.c_custkey in orig and r.acctbal_cents != orig[r.c_custkey]]
    assert updated
    assert all(r.c_mktsegment == "NEW" for r in rows if r.c_custkey in inserted)
