"""Round-4 regression tests.

Covers the two defect families the round-3 judge/advisor surfaced:

1. Oracle TYPE drift (DuckDB HUGEINT -> float64 vs Spark int64) that a
   Python-value comparison cannot see — the selfcheck must now be red
   on any uncast integer SUM oracle (VERDICT r3 "What's wrong" #1/#2).
2. The short-document shingle hazard: ``sequence(1, 0)`` is DESCENDING
   in Spark, so unguarded shingle/gram builders emit spurious rows for
   docs with < k tokens and throw INVALID_ARRAY_INDEX under ANSI mode
   (ADVICE r3, _text.py / quality_surface.py).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_ORACLE

pd = pytest.importorskip("pandas")


# ---------------------------------------------------------------------------
# selfcheck type gate
# ---------------------------------------------------------------------------


def _run_check(spark, fn, sql):
    from scripts.selfcheck import check_key
    from tests.util_oracle import duck_con

    os.environ["SELFCHECK_SF_DIR"] = SF_ORACLE
    con = duck_con(SF_ORACLE)
    return check_key(spark, con, fn, sql, "test")


def test_selfcheck_red_on_uncast_hugeint_oracle(spark):
    """An uncast SUM(<integer>) oracle (DuckDB HUGEINT -> pandas float64)
    against a Spark BIGINT must FAIL the type gate even though every
    value is identical — exactly the drift that shipped 12 bad oracles
    as self-green in round 3."""
    fn = lambda s, d: s.sql("SELECT CAST(5 AS BIGINT) AS s")  # noqa: E731
    rec = _run_check(spark, fn, "SELECT SUM(1) AS s FROM region")
    assert rec["type_match"] is False, rec
    assert rec["hash_match"] is False, rec
    assert "dtype drift" in (rec["err"] or ""), rec


def test_selfcheck_green_on_cast_bigint_oracle(spark):
    """The same oracle CAST to BIGINT is green: values AND dtypes agree."""
    fn = lambda s, d: s.sql("SELECT CAST(5 AS BIGINT) AS s")  # noqa: E731
    rec = _run_check(spark, fn, "SELECT CAST(SUM(1) AS BIGINT) AS s FROM region")
    assert rec["type_match"] is True, rec
    assert rec["hash_match"] is True, rec


def test_selfcheck_tolerates_driver_equivalent_widths(spark):
    """int32 vs int64 and date-object vs datetime64 pairs hash-PASSED the
    driver in round 3 (ntile_q, ann rank columns, gapfill_series), so the
    type gate must NOT flag them — only numeric KIND drift is real."""
    fn = lambda s, d: s.sql("SELECT CAST(5 AS INT) AS s")  # noqa: E731
    rec = _run_check(spark, fn, "SELECT CAST(5 AS BIGINT) AS s")
    assert rec["type_match"] is True, rec
    assert rec["hash_match"] is True, rec

    fn = lambda s, d: s.sql("SELECT DATE '2024-01-03' AS d")  # noqa: E731
    rec = _run_check(spark, fn, "SELECT TIMESTAMP '2024-01-03 00:00:00' AS d")
    assert rec["type_match"] is True, rec
    assert rec["hash_match"] is True, rec


# ---------------------------------------------------------------------------
# short-document shingle/gram guard
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def short_docs_dir(tmp_path_factory):
    """A documents table whose texts include the degenerate lengths the
    sf corpora never exercise: empty, 1 token, 2 tokens, exactly 3."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (0, "", "en", "t", 0),
        (1, "hello", "en", "t", 5),
        (2, "hello world", "en", "t", 11),
        (3, "one two three", "en", "t", 13),
        (4, "a b c d e f", "en", "t", 11),
        (5, "solo", "fr", "t", 4),  # singleton lang group for z-score
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("short_docs")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_shingles_empty_for_short_docs(spark, short_docs_dir):
    from spark_streaming_clustering_spark.operators._text import _shingles

    rows = _shingles(spark, short_docs_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.sh))
    # docs 0-2 have < 3 tokens: NO shingles (not spurious [1,0] rows)
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc, by_doc
    assert by_doc[3] == [(1, "one two three")]
    assert len(by_doc[4]) == 4  # 6 tokens -> 4 shingles


def test_quality_repetition_short_docs_no_crash(spark, short_docs_dir):
    """<2-token docs produce no grams and are excluded by the inner-join
    semantics; nothing throws under ANSI mode."""
    from spark_streaming_clustering_spark.operators.quality_surface import (
        quality_repetition,
    )

    out = {r.doc_id: r for r in quality_repetition(spark, short_docs_dir).collect()}
    # only docs with BOTH 2-grams and 3-grams survive (oracle inner join)
    assert set(out) == {3, 4}, out
    assert out[3].n2 == 2 and out[4].n2 == 5


def test_grouped_map_normalize_singleton_group_is_null(spark, short_docs_dir):
    """Singleton lang group: sample stddev undefined -> z is NULL (the SQL
    semantics), not 0.0 (ADVICE r3)."""
    from spark_streaming_clustering_spark.operators.analytics_surface import (
        grouped_map_normalize,
    )

    rows = {r.doc_id: r for r in grouped_map_normalize(spark, short_docs_dir).collect()}
    assert rows[5].z is None
    assert rows[0].z is not None  # the 5-doc en group normalizes fine


# ---------------------------------------------------------------------------
# round-4 new operators: zorder_layout / dedup_keep_best
# ---------------------------------------------------------------------------


def test_zorder_envelopes_are_narrow(spark):
    """The point of the z-order layout: every z-range's min/max envelope
    is narrow in BOTH dimensions.  With 8-bit dims and 16 z-ranges, each
    range fixes the top 2 bits of x AND y, so both envelopes span <= 64
    of 256 — a predicate on either column prunes ~3/4 of the "files"
    from stats alone (a single-column sort leaves the other dimension's
    envelope at full width)."""
    from spark_streaming_clustering_spark.operators.scale_surface import (
        zorder_layout,
    )

    rows = zorder_layout(spark, SF_ORACLE).collect()
    assert len(rows) > 4  # the curve actually spreads across ranges
    for r in rows:
        assert r.x_max - r.x_min <= 63, r
        assert r.y_max - r.y_min <= 63, r


def test_dedup_keep_best_picks_max_quality_member(spark):
    """The kept doc is a real member of its component with the maximal
    (integer-micro) quality; component membership totals agree with CC."""
    from spark_streaming_clustering_spark.operators.pipeline_surface import (
        dedup_connected_components,
        dedup_keep_best,
        text_quality_score,
    )
    from tests.conftest import SF_SMOKE

    comp = {
        r.doc_id: r.component
        for r in dedup_connected_components(spark, SF_SMOKE).collect()
    }
    qual = {
        r.doc_id: r.quality_micro
        for r in text_quality_score(spark, SF_SMOKE).collect()
    }
    kept = dedup_keep_best(spark, SF_SMOKE).collect()
    assert sum(r.n_members for r in kept) == len(comp)
    for r in kept:
        assert comp[r.kept_doc] == r.component
        members = [d for d, c in comp.items() if c == r.component]
        assert len(members) == r.n_members
        assert r.kept_quality_micro == max(qual[d] for d in members)
