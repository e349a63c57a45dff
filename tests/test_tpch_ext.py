"""Invariants of the TPC-H derived-fixture layer (tpch_ext.py).

Oracle equality is the selfcheck/driver's job; these tests pin the
DERIVATION invariants the oracle comparison cannot articulate — if a
modulo constant drifts, both engines would drift together and the
oracle would stay green while the fixture silently degenerates."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_clustering_spark.operators.tpch_ext import (
    register_ext_views,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_partsupp_four_distinct_suppliers_per_part(spark):
    """TPC-H cardinality: every part has EXACTLY 4 distinct suppliers
    (the stride-17 mapping must not collide at any fixture supplier
    count), and every ps_suppkey refers to a real supplier."""
    for sf in (SF_SMOKE, SF_ORACLE):
        register_ext_views(spark, sf)
        bad = spark.sql(
            """SELECT ps_partkey FROM partsupp GROUP BY ps_partkey
               HAVING COUNT(DISTINCT ps_suppkey) <> 4"""
        ).count()
        assert bad == 0, f"supplier collision at {sf}"
        dangling = spark.sql(
            """SELECT COUNT(*) AS n FROM partsupp
               LEFT JOIN supplier ON ps_suppkey = s_suppkey
               WHERE s_suppkey IS NULL"""
        ).collect()[0].n
        assert dangling == 0, f"dangling ps_suppkey at {sf}"


def test_lineitem_x_date_and_domain_invariants(spark):
    """Derived dates stay within the construction bounds
    (commitdate in shipdate +-30 d, receiptdate in shipdate +1..+30 d)
    and the shipmode/shipinstruct domains are exactly the TPC-H ones —
    with every value actually produced (no dead CASE branch)."""
    register_ext_views(spark, SF_ORACLE)
    row = spark.sql(
        """SELECT
             MIN(datediff(l_commitdate, CAST(l_shipdate AS DATE))) AS cmin,
             MAX(datediff(l_commitdate, CAST(l_shipdate AS DATE))) AS cmax,
             MIN(datediff(l_receiptdate, CAST(l_shipdate AS DATE))) AS rmin,
             MAX(datediff(l_receiptdate, CAST(l_shipdate AS DATE))) AS rmax
           FROM lineitem_x"""
    ).collect()[0]
    assert -30 <= row.cmin and row.cmax <= 30
    assert 1 <= row.rmin and row.rmax <= 30
    modes = {r.l_shipmode for r in spark.sql(
        "SELECT DISTINCT l_shipmode FROM lineitem_x").collect()}
    assert modes == {"REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"}
    instr = {r.l_shipinstruct for r in spark.sql(
        "SELECT DISTINCT l_shipinstruct FROM lineitem_x").collect()}
    assert instr == {"DELIVER IN PERSON", "COLLECT COD", "NONE",
                     "TAKE BACK RETURN"}


def test_customer_phone_country_code_recovers_nation(spark):
    """substr(c_phone, 1, 2) must invert to 10 + c_nationkey for every
    customer — Q22's grouping depends on it."""
    register_ext_views(spark, SF_ORACLE)
    bad = spark.sql(
        """SELECT COUNT(*) AS n FROM customer_x
           WHERE CAST(substr(c_phone, 1, 2) AS INT) <> 10 + c_nationkey"""
    ).collect()[0].n
    assert bad == 0


def test_tpch_queries_nondegenerate_at_oracle_sf(spark):
    """Every round-5 TPC-H shape returns rows at sf0.01 — a predicate
    calibration drifting to an empty result would keep the oracle green
    (both engines agree on nothing) while gutting the test."""
    from spark_streaming_clustering_spark.operators.registry import QUERIES

    for key in ("sql_tpch_q2", "sql_tpch_q4", "sql_tpch_q9", "sql_tpch_q11",
                "sql_tpch_q12", "sql_tpch_q16", "sql_tpch_q19", "sql_tpch_q20",
                "sql_tpch_q21", "sql_tpch_q22"):
        assert QUERIES[key](spark, SF_ORACLE).count() > 0, key


def test_funnel_attribution_boundary_semantics(spark):
    """Hand-built event stream pinning the three attribution edges the
    fixture can't isolate: (a) a purchase with NO preceding touch is
    'direct'; (b) a touch at EXACTLY the 24 h bound attributes (<=,
    not <); (c) one microsecond past the bound is 'direct'; (d) the
    most RECENT touch wins over earlier ones."""
    import datetime as dt

    from spark_streaming_clustering_spark.operators.analytics_surface import (
        ATTRIB_WINDOW_US,
        funnel_attribution,
    )
    from spark_streaming_clustering_spark.sources import tables as tables_mod

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    day = dt.timedelta(microseconds=ATTRIB_WINDOW_US)
    rows = [
        # user 1: purchase first (no touch) -> direct
        (10, 1, t0, "purchase", 1.0, "{}"),
        # user 2: click exactly 24h before purchase -> attributes
        (20, 2, t0, "click", 1.0, "{}"),
        (21, 2, t0 + day, "purchase", 1.0, "{}"),
        # user 3: view 24h+1us before purchase -> direct
        (30, 3, t0, "view", 1.0, "{}"),
        (31, 3, t0 + day + us, "purchase", 1.0, "{}"),
        # user 4: click then later view -> most recent (view) wins
        (40, 4, t0, "click", 1.0, "{}"),
        (41, 4, t0 + dt.timedelta(minutes=5), "view", 1.0, "{}"),
        (42, 4, t0 + dt.timedelta(minutes=10), "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string"
    )
    orig = tables_mod.load_table
    try:
        tables_mod.load_table = lambda s, d, n: df if n == "events" else orig(s, d, n)
        import spark_streaming_clustering_spark.operators.analytics_surface as an
        orig_an = an.load_table
        an.load_table = tables_mod.load_table
        try:
            got = {r.purchase_id: r for r in funnel_attribution(spark, SF_SMOKE).collect()}
        finally:
            an.load_table = orig_an
    finally:
        tables_mod.load_table = orig
    assert got[10].channel == "direct" and got[10].touch_id is None
    assert got[21].channel == "click" and got[21].touch_id == 20
    assert got[21].lag_us == ATTRIB_WINDOW_US
    assert got[31].channel == "direct"
    assert got[42].channel == "view" and got[42].touch_id == 41


def test_gopher_rules_python_recompute(spark):
    """quality_gopher_rules vs a pure-python recompute on hand-built
    hostile documents (repetition-dominated, one-word, long-word,
    stopword-free) — the fixture corpus never hits most rule
    boundaries."""
    from spark_streaming_clustering_spark.operators.corpus_surface import (
        GOPHER_MAX_MEANLEN,
        GOPHER_MAX_WORDLEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEANLEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_TOP_SHARE_DEN,
        quality_gopher_rules,
    )
    from spark_streaming_clustering_spark.operators._idioms import STOPWORDS
    from spark_streaming_clustering_spark.sources import tables as tables_mod

    docs = [
        (1, "the spam spam spam spam spam of light"),  # repetition fail
        (2, "word"),  # too few words
        (3, "the of " + " ".join(f"w{i}" for i in range(10))),  # passes
        (4, "the of " + "x" * 30 + " tail words here now"),  # long word
        (5, "alpha beta gamma delta epsilon zeta"),  # no stopwords
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def py_rules(text):
        toks = text.split(" ")
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        max_len = max(len(t) for t in toks)
        from collections import Counter
        cnt = Counter(toks)
        max_cnt = max(cnt.values())
        n_stop = sum(1 for t, c in cnt.items() if t in STOPWORDS)
        r = dict(
            r_words=GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS,
            r_meanlen=GOPHER_MIN_MEANLEN * n <= sum_len <= GOPHER_MAX_MEANLEN * n,
            r_stop=n_stop >= GOPHER_MIN_STOPWORDS,
            r_maxword=max_len <= GOPHER_MAX_WORDLEN,
            r_repeat=GOPHER_TOP_SHARE_DEN * max_cnt <= n,
        )
        r["passes"] = all(r.values())
        return r

    orig = tables_mod.load_table
    try:
        tables_mod.load_table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        import spark_streaming_clustering_spark.operators._idioms as idioms
        orig_i = idioms.load_table
        idioms.load_table = tables_mod.load_table
        try:
            got = {r.doc_id: r.asDict() for r in
                   quality_gopher_rules(spark, SF_SMOKE).collect()}
        finally:
            idioms.load_table = orig_i
    finally:
        tables_mod.load_table = orig

    for doc_id, text in docs:
        want = py_rules(text)
        have = {k: got[doc_id][k] for k in want}
        assert have == want, f"doc {doc_id}: {have} != {want}"
    assert not got[1]["r_repeat"]
    assert not got[2]["r_words"]
    assert got[3]["passes"]
    assert not got[4]["r_maxword"]
    assert not got[5]["r_stop"]
