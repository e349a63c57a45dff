"""Plan-drift gate over the shuffle-heaviest keys (VERDICT r6 item 5).

``scripts/plan_audit.py --prev PLANS.json`` sweeps the full surface at
close-out; this test makes the regression directions fail CI the moment
they land, not at freeze: it re-fingerprints the 25 shuffle-heaviest
keys (derived from the committed PLANS.json, so the list tracks the
artifact) and fails if any key GAINED a shuffle exchange, lost a
broadcast to a sort-merge join, re-scans a table, or acquired a
cartesian product.

Cache discipline: the committed sweep runs every key cold
(``_meta.totals.in_memory_scans == 0``), so the shared persisted
relations (tf, signatures, quality stats) are cleared here first —
otherwise a pytest ordering that happens to warm them would hide real
plan nodes behind InMemoryTableScans and diff against the artifact.

Improvements (fewer shuffles/scans) do NOT fail; regenerate PLANS.json
via ``python scripts/plan_audit.py`` to ratchet them in.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

from spark_streaming_clustering_spark.operators.registry import PLAN_PROXIES, QUERIES
from spark_streaming_clustering_spark.plans import formatted_plan
from tests.conftest import SF_ORACLE
from tests.test_plans import EAGER

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_HEAVIEST = 25


def _plan_audit_module():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(_HERE, "scripts", "plan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _clear_shared_caches() -> None:
    from spark_streaming_clustering_spark.operators import pipeline_surface
    from spark_streaming_clustering_spark.operators._idioms import clear_sig_cache
    from spark_streaming_clustering_spark.operators._simhash import (
        clear_simhash_cache,
    )
    from spark_streaming_clustering_spark.operators._text import clear_tf_cache
    from spark_streaming_clustering_spark.operators.extras_surface import (
        clear_iso_cache,
        clear_kmv_cache,
        clear_merkle_cache,
        clear_ppj_cache,
        clear_stats_rel_caches,
        clear_vopt_cache,
    )

    clear_sig_cache()
    clear_simhash_cache()
    clear_tf_cache()
    clear_ppj_cache()
    clear_vopt_cache()
    clear_merkle_cache()
    clear_iso_cache()
    clear_kmv_cache()
    clear_stats_rel_caches()
    for df in pipeline_surface._QSTATS_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    pipeline_surface._QSTATS_CACHE.clear()


def _committed():
    path = os.path.join(_HERE, "PLANS.json")
    if not os.path.exists(path):
        pytest.skip("no committed PLANS.json")
    with open(path) as fh:
        return json.load(fh)["keys"]


def test_shuffle_heaviest_keys_have_not_regressed(spark):
    audit = _plan_audit_module()
    committed = _committed()
    heavy = [
        k
        for k, _ in sorted(
            committed.items(),
            key=lambda kv: (-kv[1]["shuffle_exchanges"], kv[0]),
        )
        if k in QUERIES and k not in EAGER
    ][:N_HEAVIEST]
    assert len(heavy) == N_HEAVIEST

    _clear_shared_caches()
    regressions = []
    for k in heavy:
        builder = PLAN_PROXIES.get(k, QUERIES[k])
        fp = audit.fingerprint(formatted_plan(builder(spark, SF_ORACLE)))
        for field, direction in audit.WORSE.items():
            prev = committed[k].get(field, 0)
            if (fp[field] - prev) * direction > 0:
                regressions.append((k, field, prev, fp[field]))
    assert regressions == [], (
        "plan regression vs committed PLANS.json (gained shuffle / lost "
        "broadcast / extra scan / cartesian). If intentional, regenerate "
        f"with `python scripts/plan_audit.py`: {regressions}"
    )
