"""Checkpoint recovery: a streaming query stopped mid-stream resumes
from its checkpoint without losing or double-counting data.

This is the fault-tolerance upgrade over the reference (SURVEY.md
section 4.2): the reference's driver state dies with the process
(no WAL/checkpoint anywhere in batchStream.scala); Structured
Streaming's file-source offsets + foreachBatch batchId give an
idempotent exactly-once sink contract — a re-delivered batch arrives
with the SAME batchId, so a sink keyed by batchId deduplicates
replays.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spark_streaming_clustering_spark.operators.streaming_surface import (
    _replay_event_files,
)
from spark_streaming_clustering_spark.sources.tables import load_table

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _start(spark, in_dir, ckpt, sink):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_checkpoint_recovery_no_loss_no_dupes(spark, sf_dir):
    in_dir, ckpt = _replay_event_files(spark, sf_dir, "gstream_ckptrec_")
    all_ids = {
        r.event_id for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    }

    # keyed by batchId: the idempotent-sink contract — a replayed batch
    # overwrites its own slot instead of double-counting
    seen: dict[int, set] = {}

    def sink(df, bid: int) -> None:
        seen[bid] = {r.event_id for r in df.select("event_id").collect()}

    # Run 1: kill the query as soon as at least one batch committed —
    # mid-stream, before the 4-file replay completes.
    q = _start(spark, in_dir, ckpt, sink)
    deadline = time.time() + 120
    while not seen and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    assert seen, "first run committed no batch within 120s"
    ids_run1 = set().union(*seen.values())
    bids_run1 = set(seen)

    # Run 2: same checkpoint — must resume from the committed offset,
    # reprocessing at most the one in-flight batch (same batchId).
    q2 = _start(spark, in_dir, ckpt, sink)
    assert q2.awaitTermination(240), "recovery run did not finish"

    union = set().union(*seen.values())
    assert union == all_ids  # nothing lost
    # every event delivered exactly once per batchId slot; batches
    # partition the id space (no id in two different batchIds)
    total = sum(len(v) for v in seen.values())
    assert total == len(all_ids)
    # run 2 continued, not restarted from scratch: it appended new
    # batch ids beyond run 1's high-water mark (unless run 1 already
    # consumed everything, which maxFilesPerTrigger=1 + early stop
    # makes effectively impossible with 4 files)
    if ids_run1 != all_ids:
        assert max(seen) > max(bids_run1)


def test_ddww_recovery_state_survives_restart(spark, sf_dir):
    """dropDuplicatesWithinWatermark's dedup state must be restored
    from the checkpoint on restart: a key emitted before the kill is
    NOT re-emitted by the resumed run within its TTL window, and the
    union of both runs equals the chain-rule oracle exactly (VERDICT
    r11 item 4: recovery-safe pytest for streaming_dedup_watermark)."""
    from spark_streaming_clustering_spark.operators.streaming_surface import (
        _ddww_dedup_stream,
        _ddww_replay_files,
    )
    from tests.util_oracle import duck_con

    from spark_streaming_clustering_spark.operators.registry import ORACLES

    in_dir, ckpt = _ddww_replay_files(spark, sf_dir)
    seen: dict[int, list] = {}

    def sink(df, bid: int) -> None:
        seen[bid] = [
            (r.uid_bucket, r.event_type, int(r.ts.timestamp()))
            for r in df.collect()
        ]

    def _run():
        return (
            _ddww_dedup_stream(spark, in_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = _run()
    deadline = time.time() + 120
    while not seen and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    assert seen, "first run committed no batch within 120s"
    bids_run1 = set(seen)

    q2 = _run()
    assert q2.awaitTermination(240), "recovery run did not finish"
    if max(seen) == max(bids_run1):
        # run 1 got so far the replay was already complete — the kill
        # missed the window, so the RESTART path was never exercised
        # and this degrades to a plain replay-equality test (ADVICE
        # r12: make that visible instead of silently passing).
        import warnings

        warnings.warn(
            "ddww recovery: run 1 completed the whole replay before "
            "the kill; restart/recovery path NOT exercised this run "
            f"(run1 batches={sorted(bids_run1)})",
            stacklevel=1,
        )

    got = sorted(row for rows in seen.values() for row in rows)
    want = sorted(
        (int(u), e, int(t))
        for u, e, t in duck_con(sf_dir)
        .execute(ORACLES["streaming_dedup_watermark"])
        .fetchall()
    )
    assert got == want  # nothing lost, nothing double-emitted
