"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 for the sf0.01 DuckDB-oracle correctness gate.

Key ordering: the round driver records CORRECTNESS rows for only the
FIRST 50 keys of ``queries()`` (observed: each CORRECTNESS_r0N.json
contains exactly the first 50 registry keys in dict order; the live
registry size is ``len(QUERIES)`` — see ``CORRECTNESS_SELF.json``'s
``_meta.n_keys`` for the last verified count, ALL oracle-backed).
To hard-verify the whole surface
across rounds, ``queries()`` returns keys ordered so that keys WITHOUT a
green row in any committed ``CORRECTNESS_r*.json`` come first
(oracle-backed before rows-only) and already-verified keys last — the
union of per-round driver files then converges to full coverage, and
``scripts/selfcheck.py`` re-verifies ALL keys with the same protocol
every round (committed as ``CORRECTNESS_SELF.json``).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path (importlib / runpy) from any
# cwd; make the sibling package importable regardless.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from spark_streaming_clustering_spark.operators.registry import ORACLES, QUERIES
from spark_streaming_clustering_spark.operators.flagship import flagship_revenue

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _driver_green_rounds() -> dict[str, int]:
    """Per key, the LATEST round number with a fully-green driver row.

    A key counts as green only while its MOST RECENT driver row is green:
    if a newer round recorded a mismatch/err for the key, the key is
    demoted back to the pending queue (ADVICE r11 — previously an old
    green row shadowed a newer red one forever).
    """
    latest_green: dict[str, int] = {}
    latest_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            rnd = 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for key, rec in data.items():
            if not isinstance(rec, dict):
                continue
            latest_seen[key] = max(latest_seen.get(key, 0), rnd)
            if rec.get("err") not in (None, "no_oracle"):
                continue
            if rec.get("rows_match") and (
                rec.get("hash_match") or key not in ORACLES
            ):
                latest_green[key] = max(latest_green.get(key, 0), rnd)
    return {
        k: r for k, r in latest_green.items() if r >= latest_seen.get(k, 0)
    }


def _ordered_keys() -> list[str]:
    green = _driver_green_rounds()
    pending_oracle = [k for k in QUERIES if k not in green and k in ORACLES]
    pending_rows = [k for k in QUERIES if k not in green and k not in ORACLES]
    # Already-green keys: STALEST first (earliest last-green round), so a
    # fully-green registry rotates the 50-slot driver window onto the keys
    # longest without re-verification (VERDICT r10 item 6) instead of
    # handing newer keys third confirmations.  Ties keep registry order.
    reg_pos = {k: i for i, k in enumerate(QUERIES)}
    done = sorted(
        (k for k in QUERIES if k in green),
        key=lambda k: (green[k], reg_pos[k]),
    )
    return pending_oracle + pending_rows + done


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {k: QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return {k: ORACLES[k] for k in _ordered_keys() if k in ORACLES}
