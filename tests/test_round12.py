"""Round-12 batch: bounded-state streaming dedup (DDWW), append-mode
finalized window aggregation, weighted shortest path.  Oracle equality
runs in scripts/selfcheck.py; these tests pin the semantic invariants
and the fixture preconditions the oracles rely on."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_streaming_clustering_spark.operators.streaming_surface import (
    streaming_dedup_watermark,
    streaming_window_append_final,
)
from tests.util_oracle import compare, duck_con
from spark_streaming_clustering_spark.operators.registry import ORACLES


def test_events_ts_monotone_in_event_id_all_fixtures():
    """PRECONDITION of every append-mode oracle: the ntile-by-event_id
    replay produces no late rows because ts is strictly monotone in
    event_id — at EVERY committed fixture scale (a new fixture must
    re-establish this or the append-mode sums go incomplete)."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.connect().execute(
            f"""
            WITH t AS (SELECT ts, lag(ts) OVER (ORDER BY event_id) AS pts
                       FROM read_parquet('/root/testdata/{sf}/events.parquet'))
            SELECT COUNT(*) FROM t WHERE ts < pts
            """
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} ts inversions break the no-late-rows claim"


def test_append_final_emits_each_window_once_and_drops_tail(spark, sf_dir):
    """Append-mode invariants: (a) every (window, event_type) emitted
    at most once; (b) the trailing open windows are NOT emitted (the
    contract is load-bearing: batch agg has strictly more windows);
    (c) emitted windows all end at or before max_ts - delay."""
    got = streaming_window_append_final(spark, sf_dir).collect()
    keys = [(r.w_start, r.event_type) for r in got]
    assert len(keys) == len(set(keys))  # exactly-once per window
    con = duck_con(sf_dir)
    max_ts, n_all = con.execute(
        """SELECT MAX(ts),
                  COUNT(DISTINCT (time_bucket(INTERVAL 1 HOUR, ts), event_type))
           FROM events"""
    ).fetchone()
    assert len(got) < n_all  # open tail windows withheld
    import datetime

    cutoff = max_ts - datetime.timedelta(minutes=37)
    assert all(
        r.w_start + datetime.timedelta(hours=1) <= cutoff for r in got
    )


def test_ddww_emission_multiset_matches_oracle(spark, sf_dir):
    """Driver-shaped oracle compare for the DDWW key (rows + schema +
    values), mirroring CORRECTNESS — plus the TTL invariant: at least
    one key is emitted TWICE (eviction actually happened; a vacuous
    fixture would collapse to streaming_dedup's DISTINCT)."""
    df = streaming_dedup_watermark(spark, sf_dir)
    rows = df.collect()
    compare(df, duck_con(sf_dir), ORACLES["streaming_dedup_watermark"],
            "streaming_dedup_watermark")
    keys = [(r.uid_bucket, r.event_type) for r in rows]
    assert len(keys) > len(set(keys)), "no re-emission: TTL never fired"


def test_wsp_oracle_compare(spark, sf_dir):
    """Driver-shaped oracle compare for the weighted-shortest-path key."""
    from spark_streaming_clustering_spark.operators.analytics_surface import (
        graph_weighted_shortest_path,
    )

    compare(
        graph_weighted_shortest_path(spark, sf_dir),
        duck_con(sf_dir),
        ORACLES["graph_weighted_shortest_path"],
        "graph_weighted_shortest_path",
    )


def test_join_ivm_delta_self_consistency(spark, sf_dir):
    """Every row's merged view equals the from-scratch recompute, the
    delta terms are non-empty (both fact- and dim-side inserts really
    contribute), and the oracle compare mirrors CORRECTNESS."""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        join_ivm_delta,
    )

    df = join_ivm_delta(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.ivm_equals_recompute for r in rows)
    assert any(r.n_delta > 0 for r in rows)
    assert all(r.n_after == r.n_base + r.n_delta for r in rows)
    compare(df, duck_con(sf_dir), ORACLES["join_ivm_delta"], "join_ivm_delta")
