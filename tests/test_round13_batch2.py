"""Round-13 second batch: sorted-neighborhood dedup (the sort-based
candidate-generation class) and exact multi-quantile selection by
value-domain bisection (the selection-without-sort execution class).
Oracle equality runs in scripts/selfcheck.py; these tests pin each key
against an INDEPENDENT replication (all-pairs ground truth / Python
sorted-selection) and the r13 feasibility-probe facts the contracts
rest on."""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.util_oracle import compare, duck_con
from spark_streaming_clustering_spark.operators.registry import ORACLES

SFS = ("sf0.001", "sf0.01", "sf0.1")


# --------------------------------------------------------------------------
# dedup_sorted_neighborhood
# --------------------------------------------------------------------------


def _ground_truth_pairs(sf: str, jt: float = 0.5):
    """ALL-PAIRS >= jt Jaccard ground truth via the shared-shingle
    join — no window, no blocking, independent of the SNM machinery
    (only the shingle definition is shared, by contract)."""
    return {
        (a, b)
        for a, b, _ in duckdb.connect().execute(
            f"""
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
                         FROM read_parquet('/root/testdata/{sf}/documents.parquet')),
            idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM tok),
            sh AS (SELECT DISTINCT doc_id,
                          ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh FROM idx),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
                      FROM sh a JOIN sh b USING (sh)
                      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT da, db, ni * 1.0 / (sa.n + sb.n - ni) AS j
            FROM inter JOIN sizes sa ON da = sa.doc_id
                       JOIN sizes sb ON db = sb.doc_id
            WHERE ni * 1.0 / (sa.n + sb.n - ni) >= {jt}
            """
        ).fetchall()
    }


@pytest.mark.parametrize("sf", SFS)
def test_snm_probe_facts_block_and_window(sf):
    """The r13 probe facts the W=3 / plen=8 knobs rest on, re-checked
    at EVERY fixture: each ground-truth pair shares its first-8-chars
    block AND sits within rank distance <= 3 of its partner under the
    within-block (text, doc_id) order.  A new fixture must re-establish
    both or SNM recall silently drops (the events-ts-monotone
    precedent)."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet("
        f"'/root/testdata/{sf}/documents.parquet')"
    ).fetchall()
    txt = dict(docs)
    by_blk: dict[str, list] = {}
    for doc_id, text in docs:
        by_blk.setdefault(text[:8], []).append((text, doc_id))
    rank = {}
    for blk, rows in by_blk.items():
        for i, (_, doc_id) in enumerate(sorted(rows)):
            rank[doc_id] = (blk, i)
    gt = _ground_truth_pairs(sf)
    assert gt, sf  # fixture non-degeneracy: near-dups exist
    for a, b in gt:
        assert txt[a][:8] == txt[b][:8], (sf, a, b)
        assert abs(rank[a][1] - rank[b][1]) <= 3, (sf, a, b)


@pytest.mark.parametrize("sf", SFS)
def test_snm_exact_ground_truth_equality(spark, sf):
    """SNM returns EXACTLY the all-pairs >= 0.5-Jaccard ground truth
    at every fixture: precision 1 by construction (exact verify) and
    measured recall 100% — the windowed method loses nothing on these
    corpora, at ~W*n candidates instead of n*(n-1)/2."""
    from spark_streaming_clustering_spark.operators.pipeline_surface import (
        dedup_sorted_neighborhood,
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_sorted_neighborhood(
            spark, f"/root/testdata/{sf}"
        ).collect()
    }
    assert got == _ground_truth_pairs(sf), sf


def test_snm_oracle_compare(spark, sf_dir):
    """Driver-shaped oracle compare (rows + schema + dtypes + values),
    mirroring CORRECTNESS at the smoke fixture."""
    from spark_streaming_clustering_spark.operators.pipeline_surface import (
        dedup_sorted_neighborhood,
    )

    compare(
        dedup_sorted_neighborhood(spark, sf_dir),
        duck_con(sf_dir),
        ORACLES["dedup_sorted_neighborhood"],
        "dedup_sorted_neighborhood",
    )


# --------------------------------------------------------------------------
# exact_quantile_bisect
# --------------------------------------------------------------------------


def _cents(sf: str) -> list[int]:
    """Integer cents computed INDEPENDENTLY in Python (floor(x*100+0.5)
    == HALF_UP for positive doubles) from the raw parquet column."""
    vals = duckdb.connect().execute(
        f"SELECT o_totalprice FROM read_parquet("
        f"'/root/testdata/{sf}/orders.parquet')"
    ).fetchall()
    return sorted(int(math.floor(v * 100 + 0.5)) for (v,) in vals)


@pytest.mark.parametrize("sf", SFS)
def test_eqb_matches_independent_sorted_selection(spark, sf):
    """Value-for-value pin at every fixture: the domain-bisection
    returns EXACTLY the k-th smallest a Python sort selects, for all
    five quantiles — and the domain-bound round count the docstring
    claims (B-bucket histogram: ceil(logB(hi-lo)) <= 3) holds at this
    fixture's domain.  (History: 2-way bisection took 26 rounds, the
    r13 4-way CASE-chain cut 13; the r14 histogram rewrite reaches
    2-3 rounds with CONSTANT per-row work — one integer divide — so
    the round/width trade-off that killed the 8/16-way CASE variants
    no longer applies.)"""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        _EQB_BUCKETS,
        exact_quantile_bisect,
    )

    cents = _cents(sf)
    n = len(cents)
    rows = exact_quantile_bisect(spark, f"/root/testdata/{sf}").collect()
    assert len(rows) == 5, sf
    for r in rows:
        k = max(1, (n * r.pct) // 100)
        assert r.k == k, (sf, r.pct)
        assert r.exact_cents == cents[k - 1], (sf, r.pct)
    assert _EQB_BUCKETS >= 1024  # keeps the round bound below
    assert math.ceil(math.log(cents[-1] - cents[0], _EQB_BUCKETS)) <= 3, sf


def test_eqb_kth_invariant_under_ties():
    """Tie semantics at sf0.1 (the fixture WITH duplicate values):
    the selected v is the smallest value whose <=-count reaches k —
    count(<= v) >= k and count(<= v-1) < k — checked definitionally,
    independent of any ordering.  Also pins that ties genuinely exist,
    so the <=-count semantics are load-bearing, not vacuous."""
    import bisect

    cents = _cents("sf0.1")
    n = len(cents)
    assert len(set(cents)) < n  # duplicate cents values exist
    for pct in (25, 50, 75, 90, 99):
        k = max(1, (n * pct) // 100)
        v = cents[k - 1]
        assert bisect.bisect_right(cents, v) >= k
        assert bisect.bisect_right(cents, v - 1) < k


def test_eqb_probe_naive_model_disproved(spark):
    """The r13 probe fact the key's existence rests on: Spark's
    default-accuracy ``approx_percentile`` is NOT exact at sf0.01
    (p25 off by 14386 cents when probed) — so the exactness guarantee
    is a real contract, not a restatement of the sketch keys."""
    from pyspark.sql import functions as F

    cents = _cents("sf0.01")
    n = len(cents)
    ap = (
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
        )
        .agg(*[
            F.expr(f"approx_percentile(c, {p / 100})").alias(f"p{p}")
            for p in (25, 50, 75, 90, 99)
        ])
        .collect()[0]
    )
    exact = {p: cents[max(1, (n * p) // 100) - 1] for p in (25, 50, 75, 90, 99)}
    assert any(ap[f"p{p}"] != exact[p] for p in exact)


def test_eqb_oracle_compare(spark, sf_dir):
    """Driver-shaped oracle compare (rows + schema + dtypes + values),
    mirroring CORRECTNESS at the smoke fixture."""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        exact_quantile_bisect,
    )

    compare(
        exact_quantile_bisect(spark, sf_dir),
        duck_con(sf_dir),
        ORACLES["exact_quantile_bisect"],
        "exact_quantile_bisect",
    )


# --------------------------------------------------------------------------
# ols_normal_equations
# --------------------------------------------------------------------------


def _doc_xy(sf: str):
    """(x1, x2, y) rows computed INDEPENDENTLY in Python from raw
    parquet text (only the feature DEFINITION is shared, by
    contract)."""
    rows = duckdb.connect().execute(
        f"SELECT n_chars, text FROM read_parquet("
        f"'/root/testdata/{sf}/documents.parquet')"
    ).fetchall()
    out = []
    for n_chars, text in rows:
        toks = text.split(" ")
        out.append((int(n_chars), len(toks), len(set(toks))))
    return out


@pytest.mark.parametrize("sf", SFS)
def test_ols_matches_independent_fraction_elimination(spark, sf):
    """Value-for-value pin at every fixture: the Cramer/truncating-
    division solve equals an INDEPENDENT exact solve by Gaussian
    elimination over Python Fractions, micro-truncated toward zero —
    a different algorithm over the same exact rationals."""
    from fractions import Fraction

    from spark_streaming_clustering_spark.operators.extras_surface import (
        ols_normal_equations,
    )

    xy = _doc_xy(sf)
    n = len(xy)
    a = [[Fraction(0)] * 3 for _ in range(3)]
    b = [Fraction(0)] * 3
    for x1, x2, y in xy:
        v = (1, x1, x2)
        for i in range(3):
            for j in range(3):
                a[i][j] += v[i] * v[j]
            b[i] += v[i] * y
    # Gaussian elimination with exact rationals
    m = [row + [rhs] for row, rhs in zip(a, b)]
    for c in range(3):
        p = next(r for r in range(c, 3) if m[r][c] != 0)
        m[c], m[p] = m[p], m[c]
        for r in range(3):
            if r != c and m[r][c] != 0:
                f = m[r][c] / m[c][c]
                m[r] = [mv - f * cv for mv, cv in zip(m[r], m[c])]
    betas = [m[i][3] / m[i][i] for i in range(3)]

    def trunc_micro(fr: Fraction) -> int:
        v = 1_000_000 * fr
        q = abs(v.numerator) // abs(v.denominator)
        return q if v >= 0 else -q

    row = ols_normal_equations(spark, f"/root/testdata/{sf}").collect()[0]
    assert row.n == n, sf
    got = (row.beta0_micro, row.beta1_micro, row.beta2_micro)
    assert got == tuple(trunc_micro(bb) for bb in betas), sf


def test_ols_probe_marginal_slope_model_disproved():
    """The r13 probe fact the key rests on: the JOINT beta for each
    feature differs from its MARGINAL regr_slope by far more than
    rounding — the features are collinear, so per-feature regr_*
    aggregates (regression_agg_q's class) cannot substitute for the
    joint solve.  Checked at every fixture with exact integers."""
    for sf in SFS:
        xy = _doc_xy(sf)
        n = len(xy)
        s1 = sum(x1 for x1, _, _ in xy)
        s2 = sum(x2 for _, x2, _ in xy)
        s11 = sum(x1 * x1 for x1, _, _ in xy)
        s22 = sum(x2 * x2 for _, x2, _ in xy)
        s12 = sum(x1 * x2 for x1, x2, _ in xy)
        sy = sum(y for _, _, y in xy)
        s1y = sum(x1 * y for x1, _, y in xy)
        s2y = sum(x2 * y for _, x2, y in xy)
        det = (
            n * (s11 * s22 - s12 * s12)
            - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)
        )
        assert det != 0, sf  # fit precondition (singular -> raise)
        # int128 headroom for the oracle's HUGEINT arithmetic: the
        # largest intermediate is 1e6 * det_i
        det1 = (
            n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2)
        )
        assert abs(1_000_000 * det1) < 2**127, sf
        joint_b1 = (1_000_000 * det1) // det  # positive here: // == div
        marginal_b1 = (1_000_000 * (n * s1y - s1 * sy)) // (n * s11 - s1 * s1)
        assert abs(joint_b1 - marginal_b1) > 10_000, sf  # > 0.01/char


def test_ols_oracle_compare(spark, sf_dir):
    """Driver-shaped oracle compare (rows + schema + dtypes + values),
    mirroring CORRECTNESS at the smoke fixture."""
    from spark_streaming_clustering_spark.operators.extras_surface import (
        ols_normal_equations,
    )

    compare(
        ols_normal_equations(spark, sf_dir),
        duck_con(sf_dir),
        ORACLES["ols_normal_equations"],
        "ols_normal_equations",
    )
