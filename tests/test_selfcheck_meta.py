"""Meta-tests for the correctness checker itself (scripts/selfcheck.py).

A checker that silently passes on wrong results is worse than no
checker; these tests feed check_key deliberately-broken pairs and
assert each gate trips.  (Motivated by the round-3 incident where 12
dtype-drifted keys shipped as 'self-green' because the then-checker
compared at the Python-value layer.)"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_SC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "scripts", "selfcheck.py")
spec = importlib.util.spec_from_file_location("selfcheck_mod", _SC)
sc = importlib.util.module_from_spec(spec)
sys.modules["selfcheck_mod"] = sc
spec.loader.exec_module(sc)

from tests.conftest import SF_ORACLE  # noqa: E402
from tests.util_oracle import duck_con  # noqa: E402


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_ORACLE)


def _run(spark, con, fn, sql):
    os.environ["SELFCHECK_SF_DIR"] = SF_ORACLE
    return sc.check_key(spark, con, fn, sql, "meta")


def test_checker_passes_on_identical(spark, con):
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT CAST(1 AS BIGINT) AS a, 'x' AS b"),
               "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b")
    assert rec["hash_match"] and rec["err"] is None


def test_checker_trips_on_row_count(spark, con):
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT 1 AS a UNION ALL SELECT 2"),
               "SELECT 1 AS a")
    assert rec["rows_match"] is False


def test_checker_trips_on_column_name(spark, con):
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT 1 AS a"),
               "SELECT 1 AS b")
    assert rec["schema_match"] is False


def test_checker_trips_on_dtype_kind_drift(spark, con):
    """int64 vs float64 (the HUGEINT hazard class) must FAIL even when
    every value is numerically identical."""
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT CAST(7 AS BIGINT) AS a"),
               "SELECT CAST(7 AS DOUBLE) AS a")
    assert rec["type_match"] is False
    assert rec["hash_match"] is False


def test_checker_trips_on_value_drift(spark, con):
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT CAST(7 AS BIGINT) AS a"),
               "SELECT CAST(8 AS BIGINT) AS a")
    assert rec["hash_match"] is False
    assert "mismatch" in (rec["err"] or "")


def test_checker_tolerates_int_width_drift(spark, con):
    """int32 vs int64 PASSES (driver-calibrated equivalence; r3
    evidence: ntile/ann rank keys hash-passed with width drift)."""
    rec = _run(spark, con,
               lambda s, d: s.sql("SELECT CAST(7 AS INT) AS a"),
               "SELECT CAST(7 AS BIGINT) AS a")
    assert rec["type_match"] is True
    assert rec["hash_match"] is True


def test_checker_rejects_list_cells(spark, con):
    """Sequence-typed result cells are unhashable by the driver and
    must be rejected loudly (check_key raises; main() records the
    traceback as a FAIL), never silently compared."""
    with pytest.raises(TypeError, match="unhashable"):
        _run(spark, con,
             lambda s, d: s.sql("SELECT array(1, 2) AS a"),
             "SELECT [1, 2] AS a")
