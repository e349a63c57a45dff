"""Late-registered breadth batches (rounds 6-7).

Round 6: skyline dominance (one key — VERDICT r5 item 1 froze surface
growth until the driver-verification queue drained), chosen because it
is a CLASS of query the engine did not yet demonstrate —
multi-objective pareto dominance.  (A funnel key was drafted too and
dropped on review: ``event_funnel`` already covers ordered
multi-stage conversion.)  Round 7: the executed two-phase shard pack
and the cross-write HLL union rollup (VERDICT r6 item 6's two named
candidate classes; growth bounded at two keys so the r7 driver window
still covers all 25 previously-pending keys plus these).

Registered from the module imported LAST so these keys sort after every
pre-existing never-driver-verified key — each driver window drains
the old queue first (VERDICT r5 item 1); new keys land behind it and
are selfcheck-verified meanwhile.

Determinism rules per the house idioms: integer micros for time,
integer cents for money, floor(x+0.5) for half-away quantization on
both engines, explicit deterministic tie-breaks, no ELSE-defaulted
golden constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# skyline_pareto — multi-objective dominance (pareto frontier)
# --------------------------------------------------------------------------


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts on (minimize retail price, maximize size): a
    part survives iff no other part is cheaper-or-equal AND
    larger-or-equal with at least one strict.

    The textbook formulation is a quadratic NOT EXISTS self-join (the
    oracle); the distributed plan is the sort-free two-level sweep:

    1. bucket by price band (fixed 2-dollar widths -> price-ordered,
       bounded bucket count);
    2. per-bucket cumulative running max of size -> a bucket-count
       relation, tiny, window-ordered WITHOUT touching data rows;
    3. broadcast those prefix maxima back; a row is dominated by a
       STRICTLY CHEAPER bucket iff that prefix max >= its size, and
       within its own bucket by the partitioned RANGE-frame running
       max (strictly cheaper rows) or the equal-price group max.

    Every data-sized operation is partition-parallel (groupBy bucket,
    window PARTITIONED by bucket); the only ordered scan is over the
    bucket relation — metadata-sized at any scale.  Price quantized to
    integer cents with floor(x*100 + 0.5) on both engines (half-away
    parity; Python/NumPy round are banker's).
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    parts = parts.withColumn("bkt", F.expr("price_cents div 200"))
    # bucket-count relation: one row per price band
    bmax = parts.groupBy("bkt").agg(F.max("size").alias("bkt_max"))
    wprev = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_bkt = bmax.select(
        "bkt", F.max("bkt_max").over(wprev).alias("lower_bkt_max")
    )
    wrange = (
        Window.partitionBy("bkt")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy("bkt", "price_cents")
    flagged = (
        parts.join(F.broadcast(prev_bkt), "bkt")
        .withColumn("cheaper_in_bkt_max", F.max("size").over(wrange))
        .withColumn("eq_price_max", F.max("size").over(weq))
    )
    dominated = (
        (F.coalesce(F.col("lower_bkt_max"), F.lit(-1)) >= F.col("size"))
        | (F.coalesce(F.col("cheaper_in_bkt_max"), F.lit(-1)) >= F.col("size"))
        | (F.col("eq_price_max") > F.col("size"))
    )
    return (
        flagged.filter(~dominated)
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


_SKYLINE_ORACLE = """
    WITH parts AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part)
    SELECT p.p_partkey, p.price_cents, p.size
    FROM parts p
    WHERE NOT EXISTS (
      SELECT 1 FROM parts q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size))
    ORDER BY p.price_cents, p.p_partkey
"""

register("skyline_pareto", skyline_pareto, _SKYLINE_ORACLE)


# --------------------------------------------------------------------------
# Round-7 additions (VERDICT r6 item 6: new CLASSES only, late-registered,
# bounded growth — two keys, both the 100 TB form of a capability the
# surface previously only documented)
# --------------------------------------------------------------------------


_PACK_BUDGET = 2000  # tokens per shard — matches shard_by_token_budget
_PACK_PID_WIDTH = 100  # docs per logical input split (see docstring)


def shard_pack_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTED two-phase token-budget pack —
    ``shard_by_token_budget``'s docstring describes this as "the honest
    100 TB version"; this key runs it (VERDICT r6 item 6).

    Phase 1: exclusive running token sums within (lang, pid), where
    pid = doc_id div {width} models the contiguous doc_id range of one
    input split (at 100 TB: one file/row-group; width there is the
    ingest file size, keeping the phase-2 relation metadata-sized).
    The window is PARTITIONED by (lang, pid) — parallelism is
    #langs x #splits, not #langs, so no language-sized single task.

    Phase 2: per-(lang, pid) token totals (map-side partial aggregate
    over the same projection) -> exclusive prefix offsets over pid
    within each lang — a metadata-sized window — broadcast back.
    global running sum = offset + local exclusive sum; shard = its
    floor-division by the budget.

    Because pids are CONTIGUOUS doc_id ranges, (pid, doc_id) order ==
    doc_id order per lang, so the output provably equals the
    sequential one-window spec — which is exactly what the oracle
    checks (single global window in DuckDB vs the two-phase plan).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.expr(f"doc_id div {_PACK_PID_WIDTH}").alias("pid"),
    )
    w_local = (
        Window.partitionBy("lang", "pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_excl = F.sum("n_tok").over(w_local) - F.col("n_tok")
    packed = docs.withColumn("local_excl", local_excl)
    totals = docs.groupBy("lang", "pid").agg(F.sum("n_tok").alias("pid_tok"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang",
        "pid",
        F.coalesce(F.sum("pid_tok").over(w_off), F.lit(0)).alias("off"),
    )
    return (
        packed.join(F.broadcast(offsets), ["lang", "pid"])
        .select(
            "doc_id",
            "lang",
            "pid",
            "n_tok",
            F.floor((F.col("off") + F.col("local_excl")) / F.lit(_PACK_BUDGET))
            .cast("bigint")
            .alias("shard"),
        )
    )


register(
    "shard_pack_two_phase",
    shard_pack_two_phase,
    f"""
    SELECT doc_id, lang, doc_id // {_PACK_PID_WIDTH} AS pid,
           len(string_split(text, ' ')) AS n_tok,
           CAST(floor((SUM(len(string_split(text, ' '))) OVER
                         (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - len(string_split(text, ' '))) / {_PACK_BUDGET})
                AS BIGINT) AS shard
    FROM documents
    """,
)


def _hll_daily_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session+sf) per-(event_type, day) HLL sketches
    of user_id as a parquet table of BINARY sketch blobs — the
    materialized daily-rollup table a 100 TB deployment maintains so
    distinct-count questions never rescan raw events.  Same
    _SUCCESS-guarded write-once pattern as events_by_day_layout."""
    import os

    from ..sources.tables import derived_layout_path

    out = derived_layout_path(spark, "hll_daily", sf_dir, "events")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .coalesce(1)  # metadata-sized output: #types x #days rows
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-WRITE sketch mergeability (VERDICT r6 item 6): per-day HLL
    sketches are persisted to parquet by ``_hll_daily_layout``, read
    BACK as binary blobs, and rolled up with ``hll_union_agg`` — per
    event_type and an ALL row unioning every daily sketch.  This is the
    100 TB distinct-count story end-to-end: sketch once per
    partition/day at ingest, answer any later rollup by merging stored
    bytes (rows here = #types x #days, never the event count).

    Estimates aren't hash-comparable cross-engine, so the oracle pins
    the contract (the house hll_sketch_q protocol): the merged-sketch
    estimate must sit within 5% of the exact distinct count
    (lgConfigK=12 => ~1.6% rsd, 3x margin), plus the exact count and
    the number of daily sketches merged.  The exact companions are
    recomputed from raw events — the very scan the sketch path avoids
    at scale; determinism holds because HLL union is exactly
    order-independent and the sketch bytes roundtrip parquet
    losslessly.
    """
    sk = spark.read.parquet(_hll_daily_layout(spark, sf_dir))
    events = load_table(spark, sf_dir, "events")
    per_type = sk.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    exact_type = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_nd")
    )
    typed = per_type.join(F.broadcast(exact_type), "event_type")
    all_row = (
        sk.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            F.count(F.lit(1)).alias("n_sketches"),
        )
        .crossJoin(events.agg(F.count_distinct("user_id").alias("exact_nd")))
        .select(F.lit("ALL").alias("event_type"), "est", "n_sketches", "exact_nd")
    )
    both = typed.unionByName(all_row)
    within = F.abs(F.col("est") - F.col("exact_nd")) / F.col("exact_nd") <= 0.05
    return both.select(
        "event_type", "n_sketches", "exact_nd", within.alias("est_within_5pct")
    )


register(
    "hll_union_rollup",
    hll_union_rollup,
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_sketches,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_nd,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT event_type, CAST(ts AS DATE) FROM events)),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           TRUE
    FROM events
    """,
)
