"""Event-analytics and retrieval-scoring operators (round 3 additions).

Nine oracle-checked operators extending the engine surface along two
axes the earlier rounds had not covered:

event analytics over ``events`` (the classic clickstream suite):
- ``sessionize_events`` — gap-based sessionization (6 h inactivity
  cut) via lag + running-sum window, the canonical "no session id in
  the data" shape.
- ``event_funnel``      — ordered 3-step funnel (view -> click ->
  purchase, each step strictly after the previous) with per-stage
  distinct-user counts.
- ``retention_cohort``  — weekly cohort retention matrix
  (first-activity week x weeks-since-cohort -> active users).

retrieval / corpus statistics over ``documents``:
- ``bm25_topk``         — Okapi BM25 (k1=1.2, b=0.75) top-3 terms per
  document; the doc-length-normalized upgrade of ``tf_idf_topk``.
- ``ngram_counts``      — corpus top-20 bigrams, the n-gram frequency
  table every tokenizer/LM-data audit starts from.
- ``chunk_documents``   — fixed-width sliding-window chunking
  (80 chars, stride 40) with offsets, the context-window shaping step
  of a training pipeline; pure map-side explode.
- ``quality_entropy``   — token Shannon entropy + type-token ratio per
  document (single aggregate via H = log2(n) - sum(tf*log2 tf)/n).

dedup verify stages over ``documents``:
- ``dedup_lev_verify``  — edit-distance verification of blocked
  candidate pairs (lang + length-bucket blocking, levenshtein
  similarity, deterministic top-10).
- ``dedup_containment`` — shingle containment |A n B| / min(|A|,|B|)
  for shared-shingle candidate pairs; catches subset-duplicates that
  symmetric Jaccard under-scores.

House rules (see pipeline_surface.py): every constant is a literal
shared by the Spark builder and the DuckDB oracle; float outputs are
rounded in BOTH engines; ranking always breaks ties on a total key.

Reference parity note: the reference (G-Stream, batchStreamModel.scala)
has no event or text analytics; these extend the engine per SURVEY.md
section 2. The nearest reference ops are the windowed argmax (A13,
batchStreamModel.scala:195) which the top-k rankers generalize, and
the quasi-equality scan (batchStreamModel.scala:420-431) which the
dedup verify stages generalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register, register_plan_proxy

# ==========================================================================
# sessionize_events
# ==========================================================================

SESSION_GAP_S = 21_600  # 6 h inactivity ends a session


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds SESSION_GAP_S.

    Plan shape: one hash-partition by user_id serves BOTH windows (lag
    and the running sum share the same (user_id | ts, event_id) sort),
    then the session aggregate re-uses the same partitioning — a
    single exchange end to end.  At 100 TB this is the shape that
    matters: everything after the one shuffle is within-partition.
    Session ids are per-user ordinals (user_id, sess_id) — globally
    unique without any driver-side counter.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (direct parquet read) or TIMESTAMP_LTZ
    # (the nanosAsLong rebuild path); unix_micros only accepts LTZ, and
    # the session tz is pinned UTC so the NTZ->LTZ cast is the identity.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "sess_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


register(
    "sessionize_events",
    sessionize_events,
    f"""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > CAST({SESSION_GAP_S} AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o)
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
           MIN(ts) AS sess_start, MAX(ts) AS sess_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY 1, 2
    """,
)


# ==========================================================================
# event_funnel
# ==========================================================================


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase; each step must occur
    strictly after the user's first qualifying previous step.

    Plan shape: three per-user min-aggregates chained by broadcast-able
    joins (the per-user step tables shrink monotonically, and each is
    one row per user).  No window over the full event log is needed —
    the conditional min is an aggregate, so partial aggregation keeps
    the shuffle at user-cardinality, not event-cardinality.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(n).alias("stage"), F.lit(name).alias("step"), "users"
        )

    return (
        stage(v, 1, "view").unionAll(stage(c, 2, "click")).unionAll(stage(p, 3, "purchase"))
    )


register(
    "event_funnel",
    event_funnel,
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
    SELECT CAST(1 AS INT) AS stage, 'view' AS step, COUNT(*) AS users FROM v
    UNION ALL
    SELECT CAST(2 AS INT), 'click', COUNT(*) FROM c
    UNION ALL
    SELECT CAST(3 AS INT), 'purchase', COUNT(*) FROM p
    """,
)


# ==========================================================================
# retention_cohort
# ==========================================================================


def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted once per (cohort, weeks-since-cohort) they were active in.

    Plan shape: per-user first-activity aggregate (user-cardinality),
    joined back to the event log (broadcast at dim scale; shuffle-join
    on user_id at 100 TB where both sides co-partition), then a
    distinct + count at cohort-matrix cardinality.  Week arithmetic is
    date_trunc('week') in both engines (ISO Monday truncation), so the
    day-difference is always an exact multiple of 7.
    """
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    week_no = (F.datediff("wk", "cohort") / 7).cast("int")
    return (
        active.withColumn("week_no", week_no)
        .groupBy("cohort", "week_no")
        .agg(F.count(F.lit(1)).alias("users"))
    )


register(
    "retention_cohort",
    retention_cohort,
    """
    WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT e.user_id, f.cohort,
                 CAST(date_trunc('week', e.ts) AS DATE) AS wk
          FROM events e JOIN f ON e.user_id = f.user_id)
    SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_no,
           COUNT(*) AS users
    FROM a GROUP BY 1, 2
    """,
)


# ==========================================================================
# bm25_topk
# ==========================================================================

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-3 terms per document (k1=1.2, b=0.75,
    idf = ln(1 + (N - df + 0.5) / (df + 0.5))).

    The doc-length-normalized sibling of ``tf_idf_topk``: same
    persisted-tf plan shape (tokenize once, tf feeds df AND the
    join-back), plus a per-doc length aggregate.  avgdl is computed as
    exact-integer SUM(dl)/N cast to double, so both engines derive the
    identical scalar regardless of aggregation order.  Ranking uses
    the ROUNDED score so tie-breaking (term ASC) agrees exactly.
    """
    from ._text import shared_tf

    tf = shared_tf(spark, sf_dir)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # (n docs, avg doc length) in one row; integer sums -> deterministic.
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        1.0
        + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score = F.round(
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "term", "tf", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


register(
    "bm25_topk",
    bm25_topk,
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
    scalars AS (SELECT COUNT(*) AS n,
                       CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)),
                   6) AS score
      FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN scalars s),
    r AS (SELECT doc_id, term, tf, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term ASC) AS rank
          FROM scored)
    SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3
    """,
)


# ==========================================================================
# ngram_counts
# ==========================================================================


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 bigrams by frequency (ties broken bigram ASC).

    Plan shape: bigram construction is a map-side higher-order
    transform over the token array (no self-join, no window over the
    corpus), then ONE count aggregate.  The top-20 is taken with
    ``orderBy().limit()`` — Spark compiles that to
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver), so even a 100 TB corpus whose bigram vocabulary is
    billions of keys never funnels the counts relation into a single
    partition; the unpartitioned rank window then runs over exactly
    the 20 surviving rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.regexp_extract_all("text", F.lit("[a-z]+"), 0).alias("t")
    )
    t = F.col("t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", t[i - 1], t[i]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # TakeOrderedAndProject: the ORDER BY chain is total (cnt DESC,
    # bigram ASC), so limit(20) selects exactly the rows rank<=20
    # would — then the rank window runs over those 20 rows only.
    top = counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(20)
    w = Window.orderBy(F.desc("cnt"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w))


register(
    "ngram_counts",
    ngram_counts,
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS t FROM documents),
    bi AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2),
    counts AS (SELECT bigram, COUNT(*) AS cnt FROM bi GROUP BY 1),
    r AS (SELECT bigram, cnt,
                 row_number() OVER (ORDER BY cnt DESC, bigram ASC) AS rank
          FROM counts)
    SELECT bigram, cnt, rank FROM r WHERE rank <= 20
    """,
)


# ==========================================================================
# chunk_documents
# ==========================================================================

CHUNK_WIDTH = 80
CHUNK_STRIDE = 40


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window character chunking: width 80, stride 40, with
    1-based start offsets — the context-window shaping pass that turns
    documents into training sequences.

    Plan shape: pure map-side sequence + explode (no shuffle at all);
    chunk ids are derived from the offset, so the operator is
    embarrassingly parallel and deterministic under any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            "start",
            F.substring(F.col("text"), F.col("start"), CHUNK_WIDTH).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


register(
    "chunk_documents",
    chunk_documents,
    f"""
    SELECT doc_id,
           CAST((u.start - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
           u.start AS start,
           substring(text, u.start, {CHUNK_WIDTH}) AS chunk,
           length(substring(text, u.start, {CHUNK_WIDTH})) AS chunk_len
    FROM documents,
         UNNEST(generate_series(1, greatest(length(text), 1), {CHUNK_STRIDE}))
           AS u(start)
    """,
)


# ==========================================================================
# quality_entropy
# ==========================================================================


def quality_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token Shannon entropy + type-token ratio per document.

    Uses the single-aggregate identity
    H = log2(n) - sum(tf * log2(tf)) / n, so the whole signal is one
    (doc_id, term) count followed by one per-doc aggregate — no
    join-back of per-doc totals.  Low-entropy documents are the
    keyboard-mash / template spam that length and stopword filters
    miss (complements ``quality_repetition``'s n-gram signals).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = F.sum("tf")
    return tf.groupBy("doc_id").agg(
        n.alias("n_toks"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log2(n.cast("double"))
            - F.sum(F.col("tf") * F.log2(F.col("tf").cast("double"))) / n,
            4,
        ).alias("entropy"),
        F.round(F.count(F.lit(1)) / n.cast("double"), 4).alias("ttr"),
    )


register(
    "quality_entropy",
    quality_entropy,
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_toks, COUNT(*) AS n_types,
           round(log2(CAST(SUM(tf) AS DOUBLE))
                 - SUM(tf * log2(CAST(tf AS DOUBLE))) / SUM(tf), 4) AS entropy,
           round(COUNT(*) / CAST(SUM(tf) AS DOUBLE), 4) AS ttr
    FROM tf GROUP BY 1
    """,
)


# ==========================================================================
# dedup_lev_verify
# ==========================================================================

LEV_BOUND = 400  # bounded verify set, same discipline as dedup_ngram_jaccard


def dedup_lev_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify stage: block candidates by (lang,
    length-bucket), score with levenshtein similarity
    1 - lev/max(len), return the 10 most similar pairs.

    Blocking keeps the pair expansion at bucket^2, never corpus^2 —
    the standard verify-stage contract (cf. dedup_ngram_jaccard).  The
    O(len^2) edit-distance DP runs only on blocked pairs, JVM-side
    (Spark's levenshtein == DuckDB's levenshtein: unit-cost edits).
    Bounded to doc_id < LEV_BOUND as an explicitly-bounded verify set.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < LEV_BOUND)
        # integer floor-division in BOTH engines: DuckDB CAST(x/10 AS INT)
        # rounds-to-nearest while Spark's cast truncates — use div / //.
        .select("doc_id", "text", "lang", F.expr("n_chars div 10").alias("lb"))
    )
    a, b = d.alias("a"), d.alias("b")
    lev = F.levenshtein(F.col("a.text"), F.col("b.text"))
    sim = F.round(
        1.0
        - lev
        / F.greatest(F.length("a.text"), F.length("b.text")).cast("double"),
        6,
    )
    pairs = (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.lb") == F.col("b.lb")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.alias("lev"),
            sim.alias("sim"),
        )
    )
    w = Window.orderBy(F.desc("sim"), F.asc("doc_a"), F.asc("doc_b"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)


register(
    "dedup_lev_verify",
    dedup_lev_verify,
    f"""
    WITH d AS (SELECT doc_id, text, lang, n_chars // 10 AS lb
               FROM documents WHERE doc_id < {LEV_BOUND}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(a.text, b.text) AS lev,
             round(1.0 - levenshtein(a.text, b.text)
                   / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE),
                   6) AS sim
      FROM d a JOIN d b ON a.lang = b.lang AND a.lb = b.lb
      WHERE a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, lev, sim,
                 row_number() OVER (ORDER BY sim DESC, doc_a ASC, doc_b ASC)
                   AS rank
          FROM pairs)
    SELECT doc_a, doc_b, lev, sim, rank FROM r WHERE rank <= 10
    """,
)


# ==========================================================================
# dedup_containment
# ==========================================================================

CONTAIN_BOUND = 200
CONTAIN_MIN = 0.2


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle containment |A n B| / min(|A|, |B|) for shared-shingle
    candidate pairs (3-token shingles, doc_id < CONTAIN_BOUND).

    Containment catches subset duplicates (a doc embedded inside a
    longer one) that symmetric Jaccard under-scores: a 100-shingle doc
    fully contained in a 1000-shingle doc has Jaccard 0.1 but
    containment 1.0.  Same bounded-verify-set + shared-shingle
    equi-join discipline as dedup_ngram_jaccard — never all-pairs.
    """
    from ._text import _shingles

    sh = (
        _shingles(spark, sf_dir)
        .filter(F.col("doc_id") < CONTAIN_BOUND)
        .select("doc_id", "sh")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    cont = F.round(
        F.col("n_inter") / F.least(F.col("sa.n_sh"), F.col("sb.n_sh")).cast("double"),
        6,
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_inter", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_MIN)
    )


def _containment_oracle() -> str:
    from ._text import _DK_SHINGLES

    return f"""
    WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_DK_SHINGLES})
                WHERE doc_id < {CONTAIN_BOUND}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_inter,
           round(n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6)
             AS containment
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6)
          >= {CONTAIN_MIN}
    """


register("dedup_containment", dedup_containment, _containment_oracle())


# ==========================================================================
# window_frame_rows_q
# ==========================================================================


def window_frame_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame sliding window: per event_type, the moving sum and
    count of the last 3 rows (2 PRECEDING .. CURRENT ROW) ordered by
    (ts, event_id) — the row-counted sibling of ``window_frame_range``.

    Sums go through decimal(18,2) so the incremental sliding-sum
    implementation (running add/subtract) is exact — float frames can
    drift from an engine that recomputes each frame.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("frame_n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("frame_sum"),
    )


register(
    "window_frame_rows_q",
    window_frame_rows_q,
    """
    SELECT event_id, event_type,
           COUNT(*) OVER w AS frame_n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS frame_sum
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)


# ==========================================================================
# cms_sketch_q
# ==========================================================================

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 1024) over event user_ids,
    joined back against exact counts: est = min_i counter[i][h_i(key)],
    always >= the true count (one-sided error) — the third mergeable
    sketch in the engine after HLL (distinct) and GK (quantiles),
    covering frequency estimation.

    Counters are a groupBy over (row, position) — mergeable by + across
    shards/partitions, which is the whole point at 100 TB: the sketch
    is a 4x1024 table regardless of key cardinality, and a rollup
    across time/sources is counter addition.  Hashes are the house
    md5-prefix construction evaluated identically in both engines.

    Plan shape: ONE events scan.  Per-key exact counts aggregate
    first; the 4 (row, pos) cells are then derived from the key — a
    map-side explode over the ALREADY-AGGREGATED key-cardinality
    relation, so neither the 4x cell expansion nor the distinct ever
    touches event-cardinality data (the naive cells-as-union form
    scanned events 4x for cells, twice over, plus once for truth = 9
    scans).  Each event contributes exactly one cell per sketch row,
    so counter c[i][p] = SUM of true_n over keys hashing there, and
    truth itself is just the per-key aggregate — no separate branch.
    The 4x1024 counter table broadcasts back; at runtime AQE reuses
    the per-key shuffle stage for both its consumers (verified:
    ReusedExchange in the final adaptive plan), so events is read
    once and every post-scan exchange carries key-cardinality or
    4x1024 rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    perkey = ev.groupBy("key").agg(F.count(F.lit(1)).alias("true_n"))
    structs = []
    for i in range(CMS_DEPTH):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{i}|"), F.col("key"))), 1, 7),
            16,
            10,
        ).cast("bigint")
        structs.append(
            F.struct(
                F.lit(i).alias("row"), (h % CMS_WIDTH).alias("pos")
            )
        )
    cells = perkey.select(
        "key", "true_n", F.explode(F.array(*structs)).alias("s")
    ).select("key", "true_n", F.col("s.row").alias("row"), F.col("s.pos").alias("pos"))
    counters = cells.groupBy("row", "pos").agg(F.sum("true_n").alias("c"))
    est = (
        cells.join(F.broadcast(counters), ["row", "pos"])
        .groupBy("key", "true_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        F.col("key").cast("bigint").alias("user_id"), "true_n", "cms_est"
    )


def _cms_oracle() -> str:
    hashes = "\n      UNION ALL\n".join(
        f"      SELECT key, {i} AS row, "
        f"CAST(('0x' || substring(md5('cms{i}|' || key), 1, 7)) AS BIGINT) "
        f"% {CMS_WIDTH} AS pos FROM ev"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
    cells AS (
{hashes}),
    counters AS (SELECT row, pos, COUNT(*) AS c FROM cells GROUP BY 1, 2),
    keyed AS (SELECT DISTINCT key, row, pos FROM cells),
    est AS (SELECT key, MIN(c) AS cms_est
            FROM keyed JOIN counters USING (row, pos) GROUP BY key),
    truth AS (SELECT key, COUNT(*) AS true_n FROM ev GROUP BY key)
    SELECT CAST(truth.key AS BIGINT) AS user_id, true_n, cms_est
    FROM truth JOIN est ON truth.key = est.key
    """


register("cms_sketch_q", cms_sketch_q, _cms_oracle())


# ==========================================================================
# grouped_map_normalize (applyInPandas surface)
# ==========================================================================


def grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score normalization of document lengths via
    ``groupBy().applyInPandas`` — the grouped-map Python surface (the
    engine's fourth: scalar pandas_udf, mapInPandas,
    applyInPandasWithState, and this), used where a whole group must
    be in one pandas frame (normalization, per-group model fits).

    Scale shape: one S(lang) exchange, then Arrow-batched per-group
    compute; group size is the constraint to watch at 100 TB (a single
    lang must fit an executor's memory — for skewed corpora the fix is
    sub-bucketing the group key, cf. join_salted_skew).  Stats use
    ddof=1 (sample std) to match SQL stddev_samp; z rounds to 4 in
    both engines.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def normalize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        # Singleton / zero-variance group: SQL stddev_samp is NULL (one
        # row) or 0 (x/0 -> NULL in DuckDB), so emit NULL — not 0.0 —
        # to match the oracle, and because a z-score of 0 for a
        # singleton group is a lie anyway.
        z = (
            (pdf["n_chars"] - mu) / sd
            if sd and sd > 0
            else pdf["n_chars"] * np.nan
        )
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "n_chars": pdf["n_chars"],
                "z": z.round(4),
            }
        )

    return docs.groupBy("lang").applyInPandas(
        normalize, "doc_id long, lang string, n_chars long, z double"
    )


register(
    "grouped_map_normalize",
    grouped_map_normalize,
    """
    SELECT doc_id, lang, n_chars,
           round((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS z
    FROM documents
    """,
)


# ==========================================================================
# subquery_scalar_q
# ==========================================================================


def subquery_scalar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average.  The
    average is derived as exact-decimal SUM / COUNT cast to double, so
    both engines compare against the bit-identical scalar (a plain
    AVG(double) can differ in the last ulp across engines, and a row
    sitting exactly there would flip).  Catalyst plans the subquery as
    a one-row broadcast — no per-row recomputation.
    """
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) FROM orders)
        """
    )


register(
    "subquery_scalar_q",
    subquery_scalar_q,
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*) FROM orders)
    """,
)


# ==========================================================================
# pagerank_trade (round 4)
# ==========================================================================

PR_ITERS = 4
PR_SCALE = 1_000_000  # rank unit: 1.0 == 1e6 micro-rank
PR_TOPK = 20


_TRADE_CACHE: dict = {}


def _trade_edges(spark: SparkSession, sf_dir: str):
    """Symmetric customer-supplier trade edges + out-degrees, persisted
    once per (SparkContext, sf_dir): the unrolled PageRank references
    the edge list in EVERY iteration, and without a persist the
    orders ⋈ lineitem ⋈ distinct subtree replans per reference (72
    parquet scans in the 4-iteration plan before this cache) — at
    100 TB, re-deriving the graph per iteration is the difference
    between an iterative algorithm and a re-scan storm.  Same
    lifetime contract as ``_copurchase_edges`` / ``_text.shared_tf``.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _TRADE_CACHE.get(key)
    if hit is not None:
        return hit
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    _TRADE_CACHE[key] = (edges, deg)
    return edges, deg


def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the customer-supplier trade graph
    (distinct (customer, supplier) pairs from orders x lineitem, made
    symmetric), PR_ITERS fixed iterations, top-PR_TOPK nodes.

    The numeric contract makes an *iterative float algorithm* exactly
    oracle-checkable: ranks live in integer micro-units and every step
    is integer arithmetic — contribution = rank div out_degree, damped
    sum = 150000 + (sum * 85) div 100 — so no summation-order or
    rounding drift can accumulate across iterations in either engine
    (the same trick ``pipeline_clean_corpus`` uses for one aggregate,
    extended to a fixpoint loop).

    Plan shape per iteration: ranks ⋈ edges on src (equi), groupBy dst
    — the textbook distributed PageRank step.  Node ids are disjoint
    ints (custkey*2 / suppkey*2+1); the symmetric edge set guarantees
    no dangling nodes, so no rank mass correction term is needed.  The
    4-deep unrolled plan stays well under Catalyst's analysis limits
    (dedup_connected_components localCheckpoints for the same reason
    at higher depth; 4 static iterations don't need it).
    """
    edges, deg = _trade_edges(spark, sf_dir)
    ranks = deg.select("src", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(PR_ITERS):
        # pre-divide on the NODE-sized relation, then hit the edge list
        # once: (ranks ⋈ deg) is one row per node, so rank div deg is
        # computed n times, not m times, and each iteration plans one
        # edge-sized join instead of two.
        # ranks and deg are node-sized (deg carries persisted stats but
        # ranks is a mid-plan aggregate Catalyst can't size) — hint both
        # node-sized joins broadcast so no iteration shuffles the edge
        # relation; the only per-iteration shuffle left is the groupBy
        # dst partial-agg exchange (r13-opt; the WSP/Borůvka rule)
        per_node = ranks.join(F.broadcast(deg), "src").select(
            "src", F.expr("rank div deg").alias("contrib")
        )
        contrib = edges.join(F.broadcast(per_node), "src").select(
            "dst", "contrib"
        )
        ranks = contrib.groupBy("dst").agg(
            F.expr("150000 + (sum(contrib) * 85) div 100").alias("rank")
        ).select(F.col("dst").alias("src"), "rank")
    return (
        ranks.select(
            F.col("src").alias("node"),
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            "rank",
        )
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(PR_TOPK)
    )


def _pagerank_oracle() -> str:
    prev = "it0"
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f"""it{i} AS (
      SELECT e.dst AS src,
             150000 + (SUM(r.rank // d.deg) * 85) // 100 AS rank
      FROM {prev} r JOIN edges e ON r.src = e.src JOIN deg d ON r.src = d.src
      GROUP BY e.dst)"""
        )
        prev = f"it{i}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
    it0 AS (SELECT src, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
    {steps_sql}
    SELECT src AS node,
           CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           CAST(rank AS BIGINT) AS rank
    FROM {prev}
    ORDER BY rank DESC, node ASC LIMIT {PR_TOPK}
    """


register("pagerank_trade", pagerank_trade, _pagerank_oracle())


# ==========================================================================
# graph_triangle_count / graph_bfs (round 4)
# ==========================================================================
#
# Both run on the part CO-PURCHASE graph: undirected edges between
# parts that appear in the same order (the trade graph used by
# pagerank_trade is bipartite and hence triangle-free by construction).


_EDGE_CACHE: dict = {}


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (a < b) part co-purchase edges, persisted once
    per (SparkContext, sf_dir) and shared by both graph keys — the
    triangle query references the edge list three times and BFS twice,
    so a per-call persist would leak one cached relation per invocation
    (same lifetime contract as ``_text.shared_tf``)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    e = _EDGE_CACHE.get(key)
    if e is not None:
        return e
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    x, y = li.alias("x"), li.alias("y")
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
        .persist()
    )
    _EDGE_CACHE[key] = e
    return e


_DK_COPURCHASE = """
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
      WHERE x.l_partkey < y.l_partkey
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the part co-purchase graph:
    canonical a<b<c enumeration via two equi-joins over the
    (a, b)-ordered edge list, then per-node triangle participation for
    the top 10 nodes (plus the global count as node -1).

    The a<b<c canonicalization IS the scale trick: each triangle is
    produced exactly once, the wedge join (e1.b = e2.a) only extends
    ascending pairs, and the closing edge check (a, c) is another
    equi-join — three shuffle-partitionable joins, no squaring of
    adjacency lists in memory.

    Orientation choice, MEASURED: the Schank-Wagner degree-ordered
    "forward" variant (orient edges by (deg, id); bounds oriented
    out-degree by O(sqrt(m)), wedges by O(m^1.5)) was implemented and
    benchmarked at sf0.1/local[32]: 25.2 s vs 18.8 s for this
    id-ordered form — on this near-uniform-degree graph the two extra
    node-keyed joins that attach the degree keys cost more than the
    wedge reduction saves.  Degree ordering remains the right choice
    on skewed (power-law) graphs, where Sum(deg^2) diverges from
    m^1.5; the swap is confined to this function (output is
    orientation-invariant, so the oracle and tests hold unchanged).
    """
    e = _copurchase_edges(spark, sf_dir)
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a"), F.col("b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(10)
    )
    total = tri.agg(
        F.lit(-1).cast("bigint").alias("node"),
        F.count(F.lit(1)).alias("n_triangles"),
    )
    return total.unionAll(per_node)


register(
    "graph_triangle_count",
    graph_triangle_count,
    f"""
    WITH edges AS ({_DK_COPURCHASE}),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (SELECT unnest([a, b, c]) AS node FROM tri)
      GROUP BY node ORDER BY n_triangles DESC, node ASC LIMIT 10)
    SELECT CAST(-1 AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM tri
    UNION ALL
    SELECT node, n_triangles FROM per_node
    """,
)


BFS_ITERS = 4
BFS_SEED_MAX = 10  # seed frontier: part ids < 10


def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS on the part co-purchase graph: hop distance
    from the seed set (part id < BFS_SEED_MAX) for every node within
    BFS_ITERS hops.

    Each iteration is relax + re-min: frontier ⋈ edges (undirected via
    the symmetric view) then MIN(dist) over the union with the
    previous state — the same bounded-diameter label-propagation
    recipe as ``dedup_connected_components``, with hop count instead
    of component id.  Distances are small exact integers, so the
    4-deep unrolled loop is bit-identical in both engines.
    """
    e = _copurchase_edges(spark, sf_dir)
    edges = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = edges.select(F.col("a").alias("node")).distinct()
    dist = nodes.filter(F.col("node") < BFS_SEED_MAX).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(BFS_ITERS):
        relaxed = (
            dist.join(edges, dist.node == edges.a)
            .select(F.col("b").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def _bfs_oracle() -> str:
    prev = "it0"
    steps = []
    for i in range(1, BFS_ITERS + 1):
        steps.append(
            f"""it{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.b AS node, r.dist + 1 AS dist
        FROM {prev} r JOIN edges e ON r.node = e.a)
      GROUP BY node)"""
        )
        prev = f"it{i}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH half AS ({_DK_COPURCHASE}),
    edges AS (SELECT a, b FROM half UNION ALL SELECT b AS a, a AS b FROM half),
    it0 AS (
      SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS dist
      FROM edges WHERE a < {BFS_SEED_MAX}),
    {steps_sql}
    SELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}
    """


register("graph_bfs", graph_bfs, _bfs_oracle())


# ==========================================================================
# event_transitions / anomaly_mad (round 4, final batch)
# ==========================================================================


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (from_type -> to_type) pair of consecutive events by the same user,
    the transition count and its probability given the source state —
    the path-analysis primitive behind "what do users do after X".

    Plan shape: one (user_id)-keyed exchange for the lag, then one
    tiny (from_type, to_type) aggregate; the row-count denominator is
    a window over the 25-row transition matrix, not the event log.
    Probabilities are exact-count ratios rounded once.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )


register(
    "event_transitions",
    event_transitions,
    """
    WITH pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events),
    counts AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           round(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
             AS p
    FROM counts
    """,
)


MAD_K = 6.0  # outlier threshold in MAD units (~4 sigma for normal data)


def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation (median of |x - median|), then flag values more than
    MAD_K MADs from the median — the robust-statistics alternative to
    z-scores (one wild value cannot drag the threshold, unlike
    mean/stddev).  Output is the per-type census: median, MAD, and
    outlier count.

    Plan shape, EXACTLY three passes over events (the two-level
    median-of-deviations dependence makes fewer impossible without a
    sketch): (1) per-type median, (2) per-type MAD over the deviations
    (median joined broadcast), (3) the flagging census with the
    combined 5-row stats table joined broadcast — the stats carry med
    AND mad, so the census never re-derives the deviation relation
    (an earlier draft re-expanded it per reference: 4 scans).  At
    100 TB exact grouped medians are the expensive-but-correct choice;
    the documented relaxation is approx_percentile (same plan, sketch
    accuracy), already exposed by ``approx_percentile_q``.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    stats = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(ad, 0.5)").alias("mad"),
    )
    flagged = ev.join(F.broadcast(stats), "event_type")
    return flagged.groupBy("event_type").agg(
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
    )


register(
    "anomaly_mad",
    anomaly_mad,
    f"""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med, median(ad) AS mad
      FROM dev GROUP BY 1)
    SELECT d.event_type, round(ANY_VALUE(m.med), 6) AS med,
           round(ANY_VALUE(m.mad), 6) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.ad > {MAD_K} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)


# ==========================================================================
# funnel_attribution (round 5)
# ==========================================================================

ATTRIB_WINDOW_US = 86_400_000_000  # 24 h last-touch lookback


def funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the
    user's most recent preceding click or view within a 24 h lookback,
    else 'direct' — the marketing-analytics sibling of the as-of join
    (join_asof matches one quote stream; attribution navigates within
    one partitioned event stream, which is why it's a window, not a
    join).

    Plan: ONE (user_id)-keyed exchange; the IGNORE NULLS last_value
    over (unbounded preceding, 1 preceding) carries (ts, id, type) as
    a struct so all three attributes come from the SAME touch row —
    two parallel last_values could mix rows under equal timestamps.
    Age math in integer micros on both engines (epoch_us house rule:
    DuckDB epoch() keeps fractional seconds, Spark unix_timestamp
    truncates — micros sidestep both).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"),
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch.t"))
    valid = F.col("touch").isNotNull() & (lag_us <= ATTRIB_WINDOW_US)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(valid, F.col("touch.et")).otherwise("direct").alias("channel"),
            F.when(valid, F.col("touch.eid")).alias("touch_id"),
            F.when(valid, lag_us).cast("bigint").alias("lag_us"),
        )
    )


register(
    "funnel_attribution",
    funnel_attribution,
    f"""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events),
    w AS (
      SELECT *,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN {{'t': ts, 'eid': event_id, 'et': event_type}}
                             END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM e)
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN touch IS NULL
                  OR epoch_us(ts) - epoch_us(touch.t) > {ATTRIB_WINDOW_US}
                THEN 'direct' ELSE touch.et END AS channel,
           CASE WHEN touch IS NULL
                  OR epoch_us(ts) - epoch_us(touch.t) > {ATTRIB_WINDOW_US}
                THEN NULL ELSE touch.eid END AS touch_id,
           CASE WHEN touch IS NULL
                  OR epoch_us(ts) - epoch_us(touch.t) > {ATTRIB_WINDOW_US}
                THEN NULL
                ELSE CAST(epoch_us(ts) - epoch_us(touch.t) AS BIGINT)
                END AS lag_us
    FROM w WHERE event_type = 'purchase'
    """,
)


# ==========================================================================
# ts_similarity_search (round 5)
# ==========================================================================

TS_PATTERN = (50.0, 150.0, 300.0, 150.0, 50.0)  # the query spike shape
TS_TOPK = 20


def ts_similarity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (the EDBT'19
    streaming-similarity shape, PAPERS.md): slide a length-5 query
    pattern over every user's value series and return the TS_TOPK
    closest windows by squared Euclidean distance — pattern-matching
    over telemetry (spike detection, motif search) as one declarative
    plan.

    Mechanics: a per-user ordered ROWS frame materializes each
    5-point window as an array (one user-keyed exchange); the SSE is
    expanded term by term in FIXED index order (identical IEEE adds
    on both engines) and quantized to integer millis before ranking;
    the global top-k rides orderBy+limit -> TakeOrderedAndProject, so
    no global sort materializes at scale.  Ties break on
    (user_id, event_id).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(len(TS_PATTERN) - 1), 0)
    )
    sse = " + ".join(
        f"(element_at(w5, {i + 1}) - {p!r}) * (element_at(w5, {i + 1}) - {p!r})"
        for i, p in enumerate(TS_PATTERN)
    )
    return (
        ev.withColumn("w5", F.collect_list("value").over(w))
        .filter(F.size("w5") == len(TS_PATTERN))
        .select(
            "user_id",
            "event_id",
            F.expr(f"CAST(floor(({sse}) * 1000) AS BIGINT)").alias("dist_milli"),
        )
        .orderBy("dist_milli", "user_id", "event_id")
        .limit(TS_TOPK)
    )


def _ts_search_oracle() -> str:
    n = len(TS_PATTERN)
    sse = " + ".join(
        f"(w5[{i + 1}] - {p!r}) * (w5[{i + 1}] - {p!r})"
        for i, p in enumerate(TS_PATTERN)
    )
    return f"""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events),
    w AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
               AS w5
      FROM e)
    SELECT user_id, event_id,
           CAST(floor(({sse}) * 1000) AS BIGINT) AS dist_milli
    FROM w WHERE len(w5) = {n}
    ORDER BY dist_milli, user_id, event_id
    LIMIT {TS_TOPK}
    """


register("ts_similarity_search", ts_similarity_search, _ts_search_oracle())


# ==========================================================================
# sssp_bellman_ford (round 5, batch 2)
# ==========================================================================

SSSP_ITERS = 4
SSSP_SEED_MAX = 10  # seed set: part ids < 10, distance 0
SSSP_W_MOD = 9  # edge weight: 1 + (a + b) % SSSP_W_MOD


def sssp_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source (multi-seed) WEIGHTED shortest paths on the part
    co-purchase graph — distributed Bellman-Ford, the weighted upgrade
    of ``graph_bfs``.

    Edge weights are deterministic integers derived from the canonical
    endpoint pair (1 + (a+b) % SSSP_W_MOD, symmetric by construction),
    so every relaxation is exact integer arithmetic and bit-identical
    across engines.  Each of the SSSP_ITERS rounds is one edge-sized
    equi-join (frontier x edges) followed by a MIN re-aggregation over
    the union with the previous state — the same bounded-iteration
    relax shape as ``graph_bfs`` / ``dedup_connected_components``;
    at cluster scale each round shuffles on the node key only, and
    the iteration count is a fixed constant (k-hop-bounded SSSP), so
    lineage stays shallow without checkpointing.
    """
    e = _copurchase_edges(spark, sf_dir)
    w = F.lit(1) + (F.col("a") + F.col("b")) % SSSP_W_MOD
    half = e.select("a", "b", w.cast("bigint").alias("w"))
    edges = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    nodes = edges.select(F.col("a").alias("node")).distinct()
    dist = nodes.filter(F.col("node") < SSSP_SEED_MAX).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(SSSP_ITERS):
        relaxed = dist.join(edges, dist.node == edges.a).select(
            F.col("b").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def _sssp_oracle() -> str:
    prev = "it0"
    steps = []
    for i in range(1, SSSP_ITERS + 1):
        steps.append(
            f"""it{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.b AS node, r.dist + e.w AS dist
        FROM {prev} r JOIN edges e ON r.node = e.a)
      GROUP BY node)"""
        )
        prev = f"it{i}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH half0 AS ({_DK_COPURCHASE}),
    half AS (SELECT a, b, CAST(1 + (a + b) % {SSSP_W_MOD} AS BIGINT) AS w
             FROM half0),
    edges AS (SELECT a, b, w FROM half
              UNION ALL SELECT b AS a, a AS b, w FROM half),
    it0 AS (
      SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS dist
      FROM edges WHERE a < {SSSP_SEED_MAX}),
    {steps_sql}
    SELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}
    """


register("sssp_bellman_ford", sssp_bellman_ford, _sssp_oracle())


# ==========================================================================
# graph_kcore_richclub (round 11) — k-core decomposition on a SKEW-derived
# co-occurrence graph (the r10 probe showed the uniform-degree fixture
# graphs peel to everything-or-nothing; this derivation has real hubs)
# ==========================================================================

_KCORE_C = 10  # rich-club cap: top-C customers per order week form a clique
_KCORE_COWEEKS = 2  # edge requires co-occurrence in >= this many weeks
_KCORE_K = 4  # core threshold (degree >= K within the surviving set)
# Unrolled peel depth. The peel fixpoint is data-dependent; measured
# cascade depth on the committed fixtures is <= 4 at every sf (sf0.001: 4,
# sf0.01: 2, sf0.1: 2 — r11 feasibility probe), so 8 rounds is a 2x
# margin.  tests/test_analytics_props.py pins via a full Python peel
# replay that the TRUE fixpoint is reached within _KCORE_ROUNDS // 2 at
# each fixture; applying extra rounds past fixpoint is the identity, so
# Spark (8 checkpointed rounds) and the oracle (8 unrolled CTE levels)
# compute the same set.
_KCORE_ROUNDS = 8
_WEEK_US = 604_800_000_000  # one week in microseconds (integer div key)


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded rich-club pair graph, SYMMETRIC view.

    Derivation (all integer arithmetic, engine-identical): per order
    week (unix_micros div week, the house integer-division idiom) rank
    customers ACTIVE that week by GLOBAL order count (ties: custkey) —
    the top-{C} form a clique; a pair keeps its edge only if it
    co-occurs in >= {T} weeks.  Heavy customers win the weekly cut
    repeatedly, so they accumulate degree (hubs); one-off customers
    surface in one clique at most and stay peripheral — exactly the
    skew the r10 probe said k-core needs to be non-degenerate.

    Scale shape: ONE fact scan -> S(ck, week) count; the global order
    count is a second aggregate OVER THAT bounded relation (not the
    fact); the rank window shuffles S(week) over <= active-customers
    rows; the pair self-join runs per week on <= C rows (<= C(C-1)/2
    pairs/week) so edges are calendar-bounded (#weeks x 45), NOT
    data-bounded — at 100 TB the graph grows with the time span only.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.expr(
            f"unix_micros(cast(o_orderdate as timestamp)) div {_WEEK_US}"
        )
        .cast("bigint")
        .alias("w"),
    )
    cw = o.groupBy("ck", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_w")
    )
    nord = cw.groupBy("ck").agg(
        F.sum("n_w").cast("bigint").alias("n_orders")
    )
    rn_w = Window.partitionBy("w").orderBy(
        F.col("n_orders").desc(), F.col("ck").asc()
    )
    top = (
        cw.join(nord, "ck")
        .select("w", "ck", F.row_number().over(rn_w).alias("rn"))
        .filter(F.col("rn") <= _KCORE_C)
        .select("w", "ck")
    )
    a, b = top.alias("a"), top.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.ck") < F.col("b.ck")),
        )
        .groupBy(F.col("a.ck").alias("u"), F.col("b.ck").alias("v"))
        .agg(F.count(F.lit(1)).alias("nw"))
        .filter(F.col("nw") >= _KCORE_COWEEKS)
        .select("u", "v")
    )
    return pairs.unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _kcore_peel_round(sym: DataFrame, surv: DataFrame) -> DataFrame:
    """One peel application: survivors = nodes whose degree WITHIN the
    current survivor set is >= K (two broadcast semi-joins + one count
    — the shape each of the unrolled rounds actually pays).  ``surv``
    is node-sized and checkpoint-sealed (no stats), so the hints are
    explicit (the WSP/Borůvka rule)."""
    return (
        sym.join(F.broadcast(surv.select(F.col("node").alias("u"))), "u")
        .join(F.broadcast(surv.select(F.col("node").alias("v"))), "v")
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .filter(F.col("d") >= _KCORE_K)
        .select(F.col("u").alias("node"))
    )


def graph_kcore_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition (Seidman 1983; distributed peeling per
    Montresor et al. "Distributed k-core decomposition", PODC'11 —
    public literature) of the rich-club co-order-week graph: repeatedly
    remove nodes with degree < K until fixpoint; emit the surviving
    core with each member's full-graph and within-core degree plus its
    order count — the cohesive-subgroup primitive (who is in the
    stable heavy-customer club, not just who has high degree: a hub
    whose neighbors all peel peels too).

    Non-degeneracy (the r10 k-core probe's bar): on the committed
    fixtures the core is strictly between empty and everything at
    every sf (sf0.001: 71/138 nodes, sf0.01: 227/286, sf0.1: 211/241)
    with real multi-round cascades — pinned by the Python peel replay
    in tests/test_analytics_props.py.

    Execution: the edge relation is calendar-bounded (see
    ``_kcore_edges``), localCheckpointed so the derivation runs ONCE;
    then up to {R} peel rounds (measured fixpoint depth <= 4 on every
    fixture, 2x margin; extra rounds are the identity), each
    checkpointed to truncate lineage — the ``dedup_connected_components``
    recipe.  Peeling only ever REMOVES nodes, so an unchanged survivor
    COUNT means an unchanged survivor set and every remaining round is
    the identity — the loop exits there (r13-opt; one cheap count on
    the checkpointed node-sized relation per round replaces the 3-4
    identity rounds the fixed unroll paid; result provably identical
    to the oracle's full {R}-round unroll).  The oracle unrolls the
    same {R} rounds as chained CTEs.  No driver-side graph state;
    every per-round join broadcasts the node-sized side explicitly.
    """
    sym = _kcore_edges(spark, sf_dir).localCheckpoint(eager=True)
    surv = sym.select(F.col("u").alias("node")).distinct()
    prev_n = None
    for _ in range(_KCORE_ROUNDS):
        surv = _kcore_peel_round(sym, surv).localCheckpoint(eager=True)
        n = surv.count()  # bounded: node-sized checkpointed relation
        if n == prev_n:
            break
        prev_n = n
    deg_full = sym.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg_full")
    )
    deg_core = (
        sym.join(surv.select(F.col("node").alias("u")), "u")
        .join(surv.select(F.col("node").alias("v")), "v")
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg_core"))
    )
    o = load_table(spark, sf_dir, "orders")
    nord = o.groupBy(F.col("o_custkey").alias("u")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    return (
        deg_core.join(deg_full, "u")
        .join(nord, "u")
        .select(
            F.col("u").alias("custkey"),
            "n_orders",
            "deg_full",
            "deg_core",
        )
    )


graph_kcore_richclub.__doc__ = graph_kcore_richclub.__doc__.format(
    R=_KCORE_ROUNDS
)


def graph_kcore_iteration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-only lazy plan: the executed operator localCheckpoints
    (its returned plan truncates to an RDD scan, invisible to the
    drift gate — the ``dedup_cc_iteration_plan`` precedent), so this
    proxy rebuilds edge derivation + ONE peel round lazily for
    PLANS.json / test_plan_drift to fingerprint."""
    sym = _kcore_edges(spark, sf_dir)
    surv = sym.select(F.col("u").alias("node")).distinct()
    return _kcore_peel_round(sym, surv)


def _kcore_graph_ctes() -> str:
    """The rich-club graph derivation as CTE text (cw/nord/top/pairs/
    sym) — shared by the k-core and coreness-decomposition oracles."""
    return f"""cw AS (
      SELECT o_custkey AS ck,
             epoch_us(o_orderdate) // {_WEEK_US} AS w,
             CAST(COUNT(*) AS BIGINT) AS n_w
      FROM orders GROUP BY 1, 2),
    nord AS (SELECT ck, CAST(SUM(n_w) AS BIGINT) AS n_orders
             FROM cw GROUP BY 1),
    top AS (
      SELECT w, ck FROM (
        SELECT cw.w, cw.ck,
               ROW_NUMBER() OVER (PARTITION BY cw.w
                                  ORDER BY n.n_orders DESC, cw.ck ASC) AS rn
        FROM cw JOIN nord n ON n.ck = cw.ck)
      WHERE rn <= {_KCORE_C}),
    pairs AS (
      SELECT a.ck AS u, b.ck AS v
      FROM top a JOIN top b ON a.w = b.w AND a.ck < b.ck
      GROUP BY 1, 2 HAVING COUNT(*) >= {_KCORE_COWEEKS}),
    sym AS MATERIALIZED (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs)"""


def _kcore_oracle() -> str:
    levels = []
    prev = "s0"
    for i in range(1, _KCORE_ROUNDS + 1):
        # MATERIALIZED is load-bearing: each level references the previous
        # one TWICE, so DuckDB's default CTE inlining would re-evaluate the
        # whole chain per reference — 2^R copies of the derivation (timed
        # out at sf0.01).  Materializing makes each level evaluate once,
        # mirroring the Spark side's per-round localCheckpoint.
        levels.append(
            f"""s{i} AS MATERIALIZED (
      SELECT e.u AS node FROM sym e
      JOIN {prev} pu ON e.u = pu.node
      JOIN {prev} pv ON e.v = pv.node
      GROUP BY e.u HAVING COUNT(*) >= {_KCORE_K})"""
        )
        prev = f"s{i}"
    levels_sql = ",\n    ".join(levels)
    return f"""
    WITH {_kcore_graph_ctes()},
    s0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
    {levels_sql},
    deg_full AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg_full
                 FROM sym GROUP BY 1),
    deg_core AS (
      SELECT e.u, CAST(COUNT(*) AS BIGINT) AS deg_core FROM sym e
      JOIN {prev} pu ON e.u = pu.node
      JOIN {prev} pv ON e.v = pv.node
      GROUP BY e.u)
    SELECT c.u AS custkey, n.n_orders, f.deg_full, c.deg_core
    FROM deg_core c
    JOIN deg_full f ON f.u = c.u
    JOIN nord n ON n.ck = c.u
    """


register("graph_kcore_richclub", graph_kcore_richclub, _kcore_oracle())
register_plan_proxy("graph_kcore_richclub", graph_kcore_iteration_plan)


# ==========================================================================
# graph_label_propagation (round 11) — synchronous LPA community detection
# on a planted-partition graph (nation cliques + sparse bridges)
# ==========================================================================

_LPA_C = 10  # clique cap: top-C customers per (year, nation) cell
# Unrolled synchronous rounds.  Measured TRUE fixpoint depth on the
# committed fixtures: <= 6 at every sf (sf0.001: labels stable from round
# 5/6; sf0.01 and sf0.1: stable from round 4) — 8 rounds is the margin,
# and rounds past a fixpoint are the identity.  The convergence pin in
# tests/test_analytics_props.py replays the full synchronous LPA and
# fails if any fixture stops converging within _LPA_ROUNDS - 2.
_LPA_ROUNDS = 8
_LPA_FUSE = 4  # rounds fused per localCheckpoint (the coreness rule)


def _lpa_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-partition graph, SYMMETRIC view: per (order year,
    nation) the top-{C} customers by global order count form a clique
    (intra-nation density — the planted communities), and per year the
    rank-1 customers of ADJACENT nations (ordered by nationkey) are
    bridged, so the graph is ONE connected component whose community
    structure is finer than its connectivity — the property that gives
    label propagation a contract connected-components cannot express
    (``dedup_connected_components`` would put everything in one
    cluster here; LPA recovers the ~#nations planted blocks, purity
    0.93/1.00/1.00 at sf0.001/0.01/0.1).

    Scale shape: one orders scan joined to the broadcast customer dim
    -> S(ck, nk, year) count; global order counts aggregate OVER that
    bounded relation; the rank window shuffles S(year, nation); clique
    pairs self-join per cell on <= C rows and bridges are a lead()
    window over the #cells-row rank-1 relation — edges are bounded by
    #years x #nations x C(C-1)/2 + #years x (#nations-1), independent
    of fact rows.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.year("o_orderdate").cast("bigint").alias("y"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").cast("bigint").alias("nk"),
    )
    cw = (
        o.join(F.broadcast(c), "ck")
        .groupBy("ck", "nk", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_y"))
    )
    nord = cw.groupBy("ck").agg(
        F.sum("n_y").cast("bigint").alias("n_orders")
    )
    rn_cell = Window.partitionBy("y", "nk").orderBy(
        F.col("n_orders").desc(), F.col("ck").asc()
    )
    top = (
        cw.join(nord, "ck")
        .select("y", "nk", "ck", F.row_number().over(rn_cell).alias("rn"))
        .filter(F.col("rn") <= _LPA_C)
    )
    a, b = top.alias("a"), top.alias("b")
    intra = a.join(
        b,
        (F.col("a.y") == F.col("b.y"))
        & (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.ck") < F.col("b.ck")),
    ).select(F.col("a.ck").alias("u"), F.col("b.ck").alias("v"))
    lead_w = Window.partitionBy("y").orderBy("nk")
    heads = top.filter(F.col("rn") == 1).select(
        "y", "nk", F.col("ck").alias("head")
    )
    bridges = (
        heads.select("y", "head", F.lead("head").over(lead_w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.least("head", "nxt").alias("u"),
            F.greatest("head", "nxt").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    pairs = intra.unionAll(bridges).distinct()
    return pairs.unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _lpa_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous label-propagation step: every node adopts the
    most frequent label among its NEIGHBORS, ties to the smallest
    label — one broadcast join + one grouped count + one rank window
    (the shape each unrolled round pays).  ``labels`` is node-sized
    and checkpoint-sealed (no stats), so the broadcast hint is
    explicit — the WSP/Borůvka rule; without it each round plans a
    SortMergeJoin that shuffles both sides (r13-opt plan diff)."""
    votes = (
        sym.join(
            F.broadcast(labels.select(F.col("node").alias("v"), "lbl")), "v"
        )
        .groupBy("u", "lbl")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = Window.partitionBy("u").orderBy(
        F.col("n").desc(), F.col("lbl").asc()
    )
    return (
        votes.select("u", "lbl", F.row_number().over(rk).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col("u").alias("node"), "lbl")
    )


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous LABEL PROPAGATION (Raghavan
    et al. 2007, "Near linear time algorithm to detect community
    structures in large-scale networks" — public; deterministic
    variant: majority neighbor label, ties to the SMALLEST label,
    singleton initialization): {R} fixed synchronous rounds on the
    planted-partition graph of ``_lpa_edges``, emitting each member's
    community (the surviving label) and community size.

    The contract ``dedup_connected_components`` cannot express: the
    graph is ONE connected component (bridges chain every nation), yet
    LPA recovers the 22-25 planted nation blocks (pinned with purity
    >= 0.9 against the planted nationkey at every sf) — community
    structure FINER than connectivity.  Fixpoint is reached within 6
    rounds at every fixture (replay-pinned); rounds past fixpoint are
    the identity, so both engines' fixed {R}-round unrolls agree.

    Execution: calendar-bounded edge relation localCheckpointed once;
    each round is one broadcast join + grouped count + rank window on
    a <= few-thousand-row relation.  The label state appears ONCE per
    round, so the unrolled plan is linear in depth and {F} rounds fuse
    into each localCheckpoint (r13-opt, the coreness fusion rule —
    per-round checkpoints paid {R} compiles + materializations the
    fused blocks don't need).  Oracle: {R} MATERIALIZED CTE levels
    (single-reference per level, materialized for the same
    evaluate-once shape).
    """
    sym = _lpa_edges(spark, sf_dir).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for start in range(0, _LPA_ROUNDS, _LPA_FUSE):
        for _ in range(start, min(start + _LPA_FUSE, _LPA_ROUNDS)):
            labels = _lpa_round(sym, labels)
        labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"),
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
    )
    return (
        labels.join(F.broadcast(c), "node")
        .join(F.broadcast(sizes), "lbl")
        .select(
            F.col("node").alias("custkey"),
            "nationkey",
            F.col("lbl").alias("community"),
            "community_size",
        )
    )


graph_label_propagation.__doc__ = graph_label_propagation.__doc__.format(
    R=_LPA_ROUNDS, F=_LPA_FUSE
)


def graph_lpa_iteration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-only lazy plan: edge derivation + ONE synchronous round
    (the executed operator localCheckpoints, truncating its plan to an
    RDD scan — the ``graph_kcore_iteration_plan`` precedent)."""
    sym = _lpa_edges(spark, sf_dir)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    return _lpa_round(sym, labels)


def _lpa_oracle() -> str:
    levels = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        levels.append(
            f"""l{i} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT e.u AS node, p.lbl,
               ROW_NUMBER() OVER (PARTITION BY e.u
                                  ORDER BY COUNT(*) DESC, p.lbl ASC) AS rn
        FROM sym e JOIN {prev} p ON e.v = p.node
        GROUP BY e.u, p.lbl) t
      WHERE rn = 1)"""
        )
        prev = f"l{i}"
    levels_sql = ",\n    ".join(levels)
    return f"""
    WITH cw AS (
      SELECT o.o_custkey AS ck, CAST(c.c_nationkey AS BIGINT) AS nk,
             CAST(year(o.o_orderdate) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS n_y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    nord AS (SELECT ck, CAST(SUM(n_y) AS BIGINT) AS n_orders
             FROM cw GROUP BY 1),
    ranked AS (
      SELECT cw.y, cw.nk, cw.ck,
             ROW_NUMBER() OVER (PARTITION BY cw.y, cw.nk
                                ORDER BY n.n_orders DESC, cw.ck ASC) AS rn
      FROM cw JOIN nord n ON n.ck = cw.ck),
    top AS (SELECT y, nk, ck, rn FROM ranked WHERE rn <= {_LPA_C}),
    intra AS (
      SELECT a.ck AS u, b.ck AS v
      FROM top a JOIN top b
        ON a.y = b.y AND a.nk = b.nk AND a.ck < b.ck),
    heads AS (SELECT y, nk, ck AS head FROM top WHERE rn = 1),
    bridges AS (
      SELECT least(head, nxt) AS u, greatest(head, nxt) AS v
      FROM (SELECT y, head,
                   LEAD(head) OVER (PARTITION BY y ORDER BY nk) AS nxt
            FROM heads) t
      WHERE nxt IS NOT NULL AND head <> nxt),
    pairs AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM intra UNION ALL SELECT u, v FROM bridges) t),
    sym AS MATERIALIZED (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    l0 AS MATERIALIZED (
      SELECT DISTINCT u AS node, u AS lbl FROM sym),
    {levels_sql},
    sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
              FROM {prev} GROUP BY 1)
    SELECT f.node AS custkey, CAST(c.c_nationkey AS BIGINT) AS nationkey,
           f.lbl AS community, s.community_size
    FROM {prev} f
    JOIN customer c ON c.c_custkey = f.node
    JOIN sizes s ON s.lbl = f.lbl
    """


register(
    "graph_label_propagation", graph_label_propagation, _lpa_oracle()
)
register_plan_proxy("graph_label_propagation", graph_lpa_iteration_plan)


# ==========================================================================
# graph_coreness_decomposition (round 11) — FULL core number per node via
# h-index iteration (the core-periphery profile, not single-K membership)
# ==========================================================================

# Unrolled h-index rounds.  Lü et al. (Nature Communications 2016, "The
# H-index of a network node and its relation to degree and coreness" —
# public) prove the iteration c_0 = degree, c_{t+1}(u) = H-index of
# {c_t(v) : v ~ u} converges to the CORENESS of every node.  Measured
# fixpoint depth on the committed fixtures: 7 / 12 / 14 rounds at
# sf0.001/0.01/0.1 — 20 is the margin, and rounds past the fixpoint are
# the identity.  The replay pin (tests/test_analytics_props.py)
# verifies against an INDEPENDENT exact-peeling implementation and
# fails if the true h-iteration fixpoint exceeds _CORE_ROUNDS - 4.
_CORE_ROUNDS = 20
# Rounds fused per localCheckpoint: the state relation appears once per
# round, so a fused block's plan depth is linear (no 2^N re-execution);
# fusing trades per-round Catalyst compiles + checkpoint jobs for one
# deeper plan per block (r13-opt; measured job count 113 -> ~60 per run
# and the wall roughly halves at sf0.1).
_CORE_FUSE = 5


def _coreness_round(sym: DataFrame, c: DataFrame) -> DataFrame:
    """One h-index update: for each node, rank neighbor values
    descending and take max r with value_r >= r — one broadcast join +
    one rank window + one grouped max (the per-round shape).  ``c`` is
    node-sized (calendar-bounded), and after a localCheckpoint its
    stats are gone, so the hint is explicit (the WSP/Borůvka rule) —
    without it the round plans a SortMergeJoin that shuffles BOTH
    sides before AQE can demote it (r13-opt plan diff)."""
    rk = Window.partitionBy("u").orderBy(
        F.col("cv").desc(), F.col("v").asc()
    )
    return (
        sym.join(
            F.broadcast(
                c.select(F.col("node").alias("v"), F.col("c").alias("cv"))
            ),
            "v",
        )
        .select("u", "v", "cv", F.row_number().over(rk).alias("r"))
        .groupBy("u")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cv") >= F.col("r"), F.col("r"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("c")
        )
        .select(F.col("u").alias("node"), "c")
    )


def graph_coreness_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL k-core DECOMPOSITION — the core NUMBER of every node of the
    rich-club graph (Seidman coreness; computed by the Lü et al. 2016
    h-index iteration, which provably converges to coreness from
    c_0 = degree) — the core-periphery PROFILE the single-K
    ``graph_kcore_richclub`` cannot express: every node is labeled
    with the deepest core it survives to (fixture profiles span
    coreness 1..4 / 1..14 / 1..22 at sf0.001/0.01/0.1), so one result
    answers every K at once and ranks members by structural depth.

    Correctness cross-pin: the pytest replay computes coreness with an
    INDEPENDENT exact peeling algorithm (bucket peel, no h-index) and
    requires equality — two different published algorithms agreeing on
    both engines' outputs.

    Execution: the shared ``_kcore_edges`` relation (calendar-bounded)
    localCheckpointed once; {R} fixed h-index rounds (measured
    fixpoint <= 14 at every fixture; extra rounds are the identity),
    each one broadcast join + rank window + grouped max on the
    value-bounded relation.  The state appears ONCE per round, so the
    unrolled plan is LINEAR in depth — {F} rounds fuse into each
    localCheckpoint (r13-opt: per-round checkpoints paid {R} compile+
    materialize actions for lineage the fused blocks already bound;
    the 2^N blowup rule only bites when state is referenced twice per
    round, WSP/union-style).  Oracle: {R} MATERIALIZED CTE levels of
    the same update.  All integers.
    """
    sym = _kcore_edges(spark, sf_dir).localCheckpoint(eager=True)
    c = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    for start in range(0, _CORE_ROUNDS, _CORE_FUSE):
        for _ in range(start, min(start + _CORE_FUSE, _CORE_ROUNDS)):
            c = _coreness_round(sym, c)
        c = c.localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return c.join(deg, "node").select(
        F.col("node").alias("custkey"),
        "degree",
        F.col("c").alias("coreness"),
    )


graph_coreness_decomposition.__doc__ = (
    graph_coreness_decomposition.__doc__.format(
        R=_CORE_ROUNDS, F=_CORE_FUSE
    )
)


def graph_coreness_iteration_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audit-only lazy plan: edge derivation + ONE h-index round (the
    executed operator localCheckpoints — the kcore/LPA precedent)."""
    sym = _kcore_edges(spark, sf_dir)
    c = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return _coreness_round(sym, c)


def _coreness_oracle() -> str:
    levels = []
    prev = "c0"
    for i in range(1, _CORE_ROUNDS + 1):
        levels.append(
            f"""c{i} AS MATERIALIZED (
      SELECT u AS node,
             CAST(coalesce(MAX(CASE WHEN cv >= r THEN r END), 0)
                  AS BIGINT) AS c
      FROM (
        SELECT e.u, p.c AS cv,
               ROW_NUMBER() OVER (PARTITION BY e.u
                                  ORDER BY p.c DESC, p.node ASC) AS r
        FROM sym e JOIN {prev} p ON p.node = e.v) t
      GROUP BY u)"""
        )
        prev = f"c{i}"
    levels_sql = ",\n    ".join(levels)
    return f"""
    WITH {_kcore_graph_ctes()},
    c0 AS MATERIALIZED (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS c
      FROM sym GROUP BY 1),
    {levels_sql}
    SELECT f.node AS custkey, d.c AS degree, f.c AS coreness
    FROM {prev} f JOIN c0 d ON d.node = f.node
    """


register(
    "graph_coreness_decomposition",
    graph_coreness_decomposition,
    _coreness_oracle(),
)
register_plan_proxy(
    "graph_coreness_decomposition", graph_coreness_iteration_plan
)


# ==========================================================================
# graph_weighted_shortest_path (round 12)
# ==========================================================================

_WSP_ROUNDS = 6  # Bellman-Ford relaxation rounds; fixpoint margin below
_WSP_SEED_MAX = 20  # seeds: customer nodes (even ids) with id < 20
# Rounds fused per localCheckpoint.  With zero-weight self-loops the
# per-round update references the distance state exactly ONCE, so the
# unrolled plan is LINEAR in depth (the union-branch 2^N doubling that
# forced per-round checkpoints is gone) and the LPA/coreness fusion
# rule applies: 6 rounds -> 2 checkpoints (r13-opt).
_WSP_FUSE = 3


def _wsp_weight(src, dst):
    """Deterministic integer edge weight in [1, 9]: house md5-prefix28
    of 'src#dst' mod 9, plus 1 — data-independent, identical in both
    engines, and non-uniform enough that 36.5% of sf0.1 nodes take a
    longer-but-lighter route than their BFS hop path (the r12
    feasibility probe that justifies this key over ``graph_bfs``)."""
    return 1 + F.conv(
        F.substring(F.md5(F.concat_ws("#", src, dst)), 1, 7), 16, 10
    ).cast("bigint") % 9


def graph_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE single-source-set weighted shortest paths (Bellman-Ford run
    to its fixpoint) on the customer-supplier trade graph — the
    contract neither ``graph_bfs`` (hop counts, no weights) nor
    ``sssp_bellman_ford`` (k-hop-BOUNDED weighted distances on the
    co-purchase graph, no convergence claim) expresses: here the
    unroll depth provably COVERS the fixpoint, so the output is the
    exact weighted distance, independently pinned against Dijkstra.
    Edges carry integer weights 1..9 (see ``_wsp_weight`` — hash-mixed,
    unlike sssp's (a+b)%mod which correlates with node ids) and each
    of the {R} rounds relaxes frontier ⋈ edges then re-MINs against
    the previous state.

    Fixpoint margin (r12 feasibility probe, all three committed
    fixtures): exact driver Dijkstra confirms Bellman-Ford converges in
    5 rounds at sf0.001/sf0.01/sf0.1, so {R} rounds return the TRUE
    weighted distances with one slack round — pinned per-sf by
    tests/test_analytics_props.py::test_wsp_matches_exact_dijkstra
    (the independent-algorithm replay pin, kcore-peeling precedent).
    At an unseen larger fixture the output would still be the
    well-defined "{R}-hop-bounded weighted distance" in both engines
    (identical unrolls), but the Dijkstra pin must be re-run to
    re-verify the fixpoint claim (ADVICE r11 on unroll margins).

    Scale shape: the session-cached ``_trade_edges`` relation is hit
    once per round with a node-sized distance relation (equi-join on
    src, then groupBy-min — map-side partial agg); weights are a
    map-side expression over the persisted edges, never materialized.
    Distances are small exact integers, so the unrolled plan is
    bit-identical in both engines.  All reference graph machinery is
    driver-side (batchStreamModel.scala:17-18 adjacency matrices);
    this is the distributed counterpart for graphs that outgrow it.
    """
    edges, deg = _trade_edges(spark, sf_dir)
    # weights + one zero-weight SELF-LOOP per node, materialized ONCE
    # (localCheckpoint): six rounds re-read a sealed edge relation
    # instead of re-deriving orders ⋈ lineitem ⋈ distinct per round
    # (the kcore/LPA precedent).  The self-loops fold the old
    # ``dist UNION ALL relaxed`` carry-over branch into the join itself
    # (min(dist + 0) == dist; customers are even, suppliers odd, so no
    # real edge is a self-loop), making each round reference the
    # distance state exactly ONCE — the union-shape doubled the plan
    # tree per round (2^6 recomputations, measured 64 s at sf0.1) and
    # forced a checkpoint per round; the single-reference shape is
    # linear, so _WSP_FUSE rounds fuse per checkpoint (r13-opt; result
    # provably identical — same candidate multiset per node per round).
    nodes = edges.select("src").distinct()
    wedges = (
        edges.select(
            "src", "dst", _wsp_weight(F.col("src"), F.col("dst")).alias("w")
        )
        .unionAll(
            nodes.select(
                "src",
                F.col("src").alias("dst"),
                F.lit(0).cast("bigint").alias("w"),
            )
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        deg.select(F.col("src").alias("node"))
        .filter((F.col("node") < _WSP_SEED_MAX) & (F.col("node") % 2 == 0))
        .select("node", F.lit(0).cast("bigint").alias("dist"))
    )
    for start in range(0, _WSP_ROUNDS, _WSP_FUSE):
        for _ in range(start, min(start + _WSP_FUSE, _WSP_ROUNDS)):
            # broadcast the node-sized distance relation into the
            # edge-sized join (post-checkpoint stats are gone, so the
            # hint is explicit — the WSP/Borůvka rule)
            dist = (
                F.broadcast(dist)
                .join(wedges, dist.node == wedges.src)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
            )
        dist = dist.localCheckpoint(eager=True)
    return dist.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        "dist",
    )


graph_weighted_shortest_path.__doc__ = (
    graph_weighted_shortest_path.__doc__.format(R=_WSP_ROUNDS)
)


def graph_wsp_iteration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-only lazy plan: edge derivation + ONE relaxation round
    (self-loop shape — the executed operator's per-round plan)."""
    edges, deg = _trade_edges(spark, sf_dir)
    nodes = edges.select("src").distinct()
    wedges = edges.select(
        "src", "dst", _wsp_weight(F.col("src"), F.col("dst")).alias("w")
    ).unionAll(
        nodes.select(
            "src", F.col("src").alias("dst"), F.lit(0).cast("bigint").alias("w")
        )
    )
    dist = (
        deg.select(F.col("src").alias("node"))
        .filter((F.col("node") < _WSP_SEED_MAX) & (F.col("node") % 2 == 0))
        .select("node", F.lit(0).cast("bigint").alias("dist"))
    )
    return (
        F.broadcast(dist)
        .join(wedges, dist.node == wedges.src)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
    )


def _wsp_oracle() -> str:
    prev = "it0"
    steps = []
    for i in range(1, _WSP_ROUNDS + 1):
        steps.append(
            f"""it{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.dst AS node, r.dist + e.w AS dist
        FROM {prev} r JOIN wedges e ON r.node = e.src)
      GROUP BY node)"""
        )
        prev = f"it{i}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs),
    wedges AS MATERIALIZED (
      SELECT src, dst,
             1 + CAST(('0x' || substr(md5(CAST(src AS STRING) || '#' ||
                       CAST(dst AS STRING)), 1, 7)) AS BIGINT) % 9 AS w
      FROM edges),
    it0 AS (
      SELECT src AS node, CAST(0 AS BIGINT) AS dist
      FROM (SELECT DISTINCT src FROM edges) n
      WHERE src < {_WSP_SEED_MAX} AND src % 2 = 0),
    {steps_sql}
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           CAST(dist AS BIGINT) AS dist
    FROM {prev}
    """


register(
    "graph_weighted_shortest_path",
    graph_weighted_shortest_path,
    _wsp_oracle(),
)
register_plan_proxy("graph_weighted_shortest_path", graph_wsp_iteration_plan)


# ==========================================================================
# boruvka_msf_trade (round 13)
# ==========================================================================

_MSF_ROUNDS = 6  # Borůvka round cap; probe: 2/3/4 rounds needed at the 3 sfs
_MSF_JUMPS = 2  # pointer-jumping passes per round; probe: 2 suffice at all sfs


def _msf_wkey(w, lo, hi):
    """Globally-distinct composite edge key as ONE bigint:
    w * 2^50 + lo * 2^25 + hi.  Distinctness (each undirected edge has
    a unique (lo, hi)) makes the minimum spanning forest UNIQUE and
    every min_by/arg_min deterministic, so both engines and the
    Kruskal pin agree edge-for-edge with no tie-break ambiguity.
    Precondition: node ids < 2^25 (~33.5M — holds with three orders of
    magnitude of margin at every committed fixture; pinned by
    tests/test_round13.py so a larger fixture fails loudly, the
    events-ts-monotone precedent)."""
    return (
        w * F.lit(1 << 50).cast("bigint")
        + lo * F.lit(1 << 25).cast("bigint")
        + hi
    ).cast("bigint")


def boruvka_msf_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the weighted customer-supplier trade
    graph via distributed Borůvka — the GLOBAL-structure graph contract
    nothing else in the registry expresses:
    ``graph_weighted_shortest_path`` computes distances from a seed
    set, ``graph_kcore_richclub``/coreness measure local density,
    ``dedup_connected_components`` finds components but is blind to
    weights; the MSF is the cheapest backbone connecting the graph —
    the single-linkage-clustering primitive (Borůvka 1926).  The r13
    feasibility probe disproved the naive one-round model: the
    per-node min-incident-edge forest differs from the true MSF at
    EVERY committed fixture (155/159, 1575/1599, 15790/15998 edges),
    so the multi-round cut-property machinery is load-bearing; edge
    keys are globally distinct (probe-asserted), so the MSF is unique.

    Algorithm (identically unrolled in the DuckDB oracle): each round,
    every current component selects its minimum-wkey incident CROSS
    edge with one ``min_by`` hash aggregate (by the cut property with
    distinct keys every selected edge IS in the MSF — valid even under
    PARTIAL contraction, because selection only ever sees a partition
    REFINING the true components); components hook to their chosen
    neighbour, 2-cycles break toward the smaller label (distinct keys
    make every pseudo-forest cycle a 2-cycle), and {J} pointer-jumping
    passes contract the hook forest.  The loop stops as soon as a
    round finds no cross edges (identical to letting the oracle's
    remaining unrolled rounds run empty) and is capped at {R} rounds —
    the probed fixpoint (4 rounds at sf0.1) plus 2 slack; the output
    is pinned edge-for-edge against an independent driver-side Kruskal
    at all three fixtures (tests/test_round13.py, the Dijkstra-pin
    precedent).

    Scale shape: the live edge relation starts as the checkpointed
    canonical edge list and is REPLACED each round by the checkpointed
    cross-edge survivors, so the per-round scan SHRINKS geometrically
    (587k -> ~40k after round 0 at sf0.1); ``comp`` (node-sized) is
    BROADCAST into the edge join; the hook/pointer relations hold one
    row per STILL-MERGING component and shrink geometrically too.  The
    only edge-sized shuffle per round is the per-component ``min_by``
    — a map-side-combining hash aggregate.  The multiply-referenced
    per-round states (``cross``, ``chosen``) are localCheckpointed
    (the kcore/WSP lineage rule); the hook/jump chain ``p`` and the
    ``comp`` label map are bounded broadcast-join chains over the
    sealed ``chosen`` relations / the persisted ``deg``, so neither
    pays a checkpoint job (r13/r14-opt); the convergence probe reads
    the sealed ``chosen`` (empty iff no cut edge existed) instead of
    paying a separate ``cross.isEmpty()`` job (r14-opt).
    Reference parity: all reference graph state is a driver-local
    adjacency matrix (batchStreamModel.scala:17-18); this is the
    distributed counterpart for graphs that outgrow one machine.
    """
    edges, deg = _trade_edges(spark, sf_dir)
    live = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
        .withColumn("w", _wsp_weight(F.col("lo"), F.col("hi")))
    )
    live = live.withColumn(
        "wkey", _msf_wkey(F.col("w"), F.col("lo"), F.col("hi"))
    ).localCheckpoint(eager=True)
    # Identity component map: referenced ONCE (the end-of-round-0 comp
    # update) over the persisted deg relation, so a checkpoint here paid
    # a job for lineage the single reference never re-executes (r13-opt).
    comp = deg.select(F.col("src").alias("node"), F.col("src").alias("c"))
    sel = None
    for rnd in range(_MSF_ROUNDS):
        if rnd == 0:
            # Round 0: comp is the identity (every node its own
            # component), so the cross relation is the edge list itself
            # with ca=lo, cb=hi — same rows the oracle's comp0 join
            # yields, without re-joining 587k edges against an identity
            # map (saves the round's two broadcast joins + a redundant
            # checkpoint; `live` is already sealed and IS the survivor
            # set, since in round 0 every edge crosses).
            cross = live.select(
                "lo", "hi", "w", "wkey",
                F.col("lo").alias("ca"), F.col("hi").alias("cb"),
            )
        else:
            ca = comp.select(F.col("node").alias("lo"), F.col("c").alias("ca"))
            cb = comp.select(F.col("node").alias("hi"), F.col("c").alias("cb"))
            cross = (
                live.join(F.broadcast(ca), "lo")
                .join(F.broadcast(cb), "hi")
                .filter(F.col("ca") != F.col("cb"))
                .select("lo", "hi", "w", "wkey", "ca", "cb")
                .localCheckpoint(eager=True)
            )
            live = cross.select("lo", "hi", "w", "wkey")  # sealed survivors
        # Both incidence directions via one map-side explode instead of
        # a self-union: the sealed cross relation is scanned ONCE per
        # selection round (r14; §2.4 — same aggregate input, one scan).
        incid = cross.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("ca").alias("c"), F.col("cb").alias("d"),
                        F.col("lo"), F.col("hi"), F.col("w"), F.col("wkey"),
                    ),
                    F.struct(
                        F.col("cb").alias("c"), F.col("ca").alias("d"),
                        F.col("lo"), F.col("hi"), F.col("w"), F.col("wkey"),
                    ),
                )
            ).alias("e")
        ).select("e.c", "e.d", "e.lo", "e.hi", "e.w", "e.wkey")
        chosen = (
            incid.groupBy("c")
            .agg(
                F.min_by("d", "wkey").alias("d"),
                F.min_by("lo", "wkey").alias("lo"),
                F.min_by("hi", "wkey").alias("hi"),
                F.min_by("w", "wkey").alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        # Convergence probe PIGGYBACKS on the sealed selection result
        # (r14; §5 — one fewer action per round): chosen is empty iff
        # cross found no cut edges, so the former cross.isEmpty() job
        # is redundant.  Round 0 never probes (cross = the full edge
        # list; an empty one just yields an empty forest below).
        if rnd > 0 and chosen.isEmpty():
            break  # converged: later rounds would all select nothing
        picked = chosen.select("lo", "hi", "w")
        sel = picked if sel is None else sel.unionAll(picked)
        h2 = chosen.select(F.col("c").alias("c2"), F.col("d").alias("d2"))
        # p and its jump passes reference only the SEALED chosen relation
        # (component-sized broadcast joins): the 2 references per jump
        # double a tree of cheap sealed-base scans, not of shuffle
        # recomputation, so the former checkpoint here paid one job per
        # round for lineage relief this bounded block never needs
        # (r13-opt; the kcenter rule).
        p = chosen.join(F.broadcast(h2), chosen.d == F.col("c2"), "left").select(
            "c",
            F.when(
                (F.col("d2") == F.col("c")) & (F.col("c") < F.col("d")),
                F.col("c"),
            )
            .otherwise(F.col("d"))
            .alias("p"),
        )
        for _ in range(_MSF_JUMPS):
            pj = p.select(F.col("c").alias("cj"), F.col("p").alias("pj"))
            p = p.join(F.broadcast(pj), p.p == F.col("cj"), "left").select(
                "c", F.coalesce(F.col("pj"), F.col("p")).alias("p")
            )
        pr = p.select(F.col("c").alias("pc"), F.col("p").alias("pp"))
        # comp stays LAZY (r14; the kcenter rule): it is a chain of
        # broadcast left-joins of geometrically-shrinking component
        # relations (pr, derived from the SEALED chosen) over the
        # persisted deg base — re-executing it for the two broadcast
        # builds per round costs <= _MSF_ROUNDS tiny map-side joins,
        # while the former per-round eager checkpoint paid a full job
        # for lineage relief this bounded chain never needs.
        comp = comp.join(F.broadcast(pr), comp.c == F.col("pc"), "left").select(
            "node", F.coalesce(F.col("pp"), F.col("c")).alias("c")
        )
    return sel.distinct().select(
        "lo", "hi", F.col("w").cast("bigint").alias("w")
    )


boruvka_msf_trade.__doc__ = boruvka_msf_trade.__doc__.format(
    R=_MSF_ROUNDS, J=_MSF_JUMPS
)


def boruvka_msf_iteration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-only lazy plan: edge derivation + ONE selection round (the
    executed operator localCheckpoints per round, WSP precedent)."""
    edges, deg = _trade_edges(spark, sf_dir)
    live = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
        .withColumn("w", _wsp_weight(F.col("lo"), F.col("hi")))
    )
    live = live.withColumn(
        "wkey", _msf_wkey(F.col("w"), F.col("lo"), F.col("hi"))
    )
    comp = deg.select(F.col("src").alias("node"), F.col("src").alias("c"))
    ca = comp.select(F.col("node").alias("lo"), F.col("c").alias("ca"))
    cb = comp.select(F.col("node").alias("hi"), F.col("c").alias("cb"))
    cross = (
        live.join(F.broadcast(ca), "lo")
        .join(F.broadcast(cb), "hi")
        .filter(F.col("ca") != F.col("cb"))
    )
    incid = cross.select(
        F.col("ca").alias("c"), "lo", "hi", "w", "wkey"
    ).unionAll(cross.select(F.col("cb").alias("c"), "lo", "hi", "w", "wkey"))
    return incid.groupBy("c").agg(
        F.min_by("lo", "wkey").alias("lo"),
        F.min_by("hi", "wkey").alias("hi"),
        F.min_by("w", "wkey").alias("w"),
    )


def _msf_oracle() -> str:
    rounds = []
    prev_comp = "comp0"
    prev_edges = "wedges"
    sels = []
    for r in range(1, _MSF_ROUNDS + 1):
        jump_ctes = []
        pprev = f"p{r}_0"
        for j in range(1, _MSF_JUMPS + 1):
            jump_ctes.append(
                f"""p{r}_{j} AS (
      SELECT a.c, COALESCE(b.p, a.p) AS p
      FROM {pprev} a LEFT JOIN {pprev} b ON b.c = a.p)"""
            )
            pprev = f"p{r}_{j}"
        jumps_sql = ",\n    ".join(jump_ctes)
        rounds.append(
            f"""cross{r} AS MATERIALIZED (
      SELECT e.lo, e.hi, e.w, e.wkey, ca.c AS ca, cb.c AS cb
      FROM {prev_edges} e
      JOIN {prev_comp} ca ON ca.node = e.lo
      JOIN {prev_comp} cb ON cb.node = e.hi
      WHERE ca.c <> cb.c),
    incid{r} AS (
      SELECT ca AS c, cb AS d, lo, hi, w, wkey FROM cross{r}
      UNION ALL
      SELECT cb AS c, ca AS d, lo, hi, w, wkey FROM cross{r}),
    chosen{r} AS MATERIALIZED (
      SELECT c, min_by(d, wkey) AS d, min_by(lo, wkey) AS lo,
             min_by(hi, wkey) AS hi, min_by(w, wkey) AS w
      FROM incid{r} GROUP BY c),
    p{r}_0 AS MATERIALIZED (
      SELECT a.c,
             CASE WHEN b.d = a.c AND a.c < a.d THEN a.c ELSE a.d END AS p
      FROM chosen{r} a LEFT JOIN chosen{r} b ON b.c = a.d),
    {jumps_sql},
    comp{r} AS MATERIALIZED (
      SELECT n.node, COALESCE(p.p, n.c) AS c
      FROM {prev_comp} n LEFT JOIN {pprev} p ON p.c = n.c)"""
        )
        sels.append(f"SELECT lo, hi, w FROM chosen{r}")
        prev_comp = f"comp{r}"
        prev_edges = f"(SELECT lo, hi, w, wkey FROM cross{r})"
    rounds_sql = ",\n    ".join(rounds)
    sel_union = "\n      UNION ALL\n      ".join(sels)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    wedges AS MATERIALIZED (
      SELECT LEAST(c, s) AS lo, GREATEST(c, s) AS hi, w,
             w * (1::BIGINT << 50) + LEAST(c, s) * (1::BIGINT << 25)
               + GREATEST(c, s) AS wkey
      FROM (
        SELECT c, s,
               1 + CAST(('0x' || substr(md5(CAST(LEAST(c, s) AS STRING)
                     || '#' || CAST(GREATEST(c, s) AS STRING)), 1, 7))
                   AS BIGINT) % 9 AS w
        FROM pairs) t),
    comp0 AS MATERIALIZED (
      SELECT node, node AS c FROM (
        SELECT lo AS node FROM wedges UNION SELECT hi FROM wedges) n),
    {rounds_sql}
    SELECT DISTINCT lo, hi, CAST(w AS BIGINT) AS w FROM (
      {sel_union}) all_sel
    """


register("boruvka_msf_trade", boruvka_msf_trade, _msf_oracle())
register_plan_proxy("boruvka_msf_trade", boruvka_msf_iteration_plan)
