"""Lakehouse table-maintenance operators (round 4 additions).

Two warehouse-management shapes every 100 TB deployment ends up
needing, each oracle-checked:

- ``scd2_dimension``  — slowly-changing-dimension type-2 build from an
                        event log: change detection + validity
                        intervals + version numbers, i.e. the MERGE
                        history pattern behind every dimension table
                        fed by CDC.
- ``compaction_plan`` — the OPTIMIZE/compaction *planner*: bin-pack a
                        manifest of small files into target-size
                        output groups with a running-sum assignment.
                        Planning is manifest-level metadata (one row
                        per file), which is why the global-order
                        window here is bounded by manifest size — the
                        same driver-side-planning contract Delta and
                        Iceberg OPTIMIZE use.

Reference parity note: the reference (G-Stream) has a merge/upsert of
prototype nodes (batchStreamModel.scala:300-340, generalized by
``merge_upsert``); SCD2 extends that to *history-preserving* upsert
semantics.  Compaction has no reference counterpart — it is part of the
SURVEY.md section 2 scale-extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

# ==========================================================================
# scd2_dimension
# ==========================================================================


def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the event log: per user,
    one row per *status change* (event_type treated as the tracked
    attribute), with ``valid_from`` / ``valid_to`` interval bounds,
    a per-user ``version`` ordinal and an ``is_current`` flag.

    Plan shape: one hash-partition by user_id serves every step — the
    change-detection lag, the post-filter lead and the row_number all
    sort on the same (user_id | ts, event_id) key, so Catalyst plans a
    single exchange end to end (the filter between the two window
    groups is within-partition).  At 100 TB this is the CDC-compaction
    shape: shuffle once by entity key, never by event.

    Determinism: ties on ts are broken by event_id in both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


register(
    "scd2_dimension",
    scd2_dimension,
    """
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events),
    c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type AS status, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           lead(ts) OVER w IS NULL AS is_current
    FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)


# ==========================================================================
# compaction_plan
# ==========================================================================

# Target output size for compacted files.  Estimated bytes per row and
# per-file overhead are fixed literals shared with the oracle SQL.
COMPACT_TARGET_BYTES = 65_536
BYTES_PER_ROW = 64
FILE_OVERHEAD_BYTES = 256


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: treat each event hour as one input
    file (the classic streaming-ingest small-file pattern), estimate
    its size, and bin-pack files in time order into output groups of
    ~``COMPACT_TARGET_BYTES`` via an exclusive running sum.

    Assignment rule: a file joins the group its *preceding* cumulative
    bytes fall into (``(cum - bytes) div target``) — next-fit packing,
    deterministic, no driver loop.

    Scale note: stage 1 (the per-file stats aggregate) shuffles at
    file cardinality; stage 2's global-order window runs over the
    MANIFEST (one row per file, ~1e2 here, ~1e6-1e7 at 100 TB), not
    the data — exactly the metadata-sized planning step Delta/Iceberg
    OPTIMIZE performs driver-side.  The single-partition window is
    bounded by manifest size by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    # hour index since epoch == the ingest-partition "file" id
    file_id = F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
    files = (
        ev.select(file_id.alias("file_id"))
        .groupBy("file_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn(
            "est_bytes",
            F.col("n_rows") * BYTES_PER_ROW + FILE_OVERHEAD_BYTES,
        )
    )
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("est_bytes").over(w)
    return files.select(
        "file_id",
        "n_rows",
        "est_bytes",
        cum.alias("cum_bytes"),
        F.expr(
            f"(sum(est_bytes) over (order by file_id rows unbounded preceding)"
            f" - est_bytes) div {COMPACT_TARGET_BYTES}"
        ).alias("out_group"),
    )


register(
    "compaction_plan",
    compaction_plan,
    f"""
    WITH files AS (
      SELECT epoch_us(ts) // 3600000000 AS file_id,
             COUNT(*) AS n_rows
      FROM events GROUP BY 1),
    sized AS (
      SELECT file_id, CAST(n_rows AS BIGINT) AS n_rows,
             CAST(n_rows * {BYTES_PER_ROW} + {FILE_OVERHEAD_BYTES} AS BIGINT)
               AS est_bytes
      FROM files)
    SELECT file_id, n_rows, est_bytes,
           CAST(SUM(est_bytes) OVER w AS BIGINT) AS cum_bytes,
           (CAST(SUM(est_bytes) OVER w AS BIGINT) - est_bytes)
             // {COMPACT_TARGET_BYTES} AS out_group
    FROM sized WINDOW w AS (ORDER BY file_id ROWS UNBOUNDED PRECEDING)
    """,
)
