"""Parquet table loaders for the driver-generated test tables.

Mirrors the reference's batch scan entry point (A1,
batchStreamRun.scala:37 reads the init file with ``sc.textFile``) in
Spark-native form: columnar parquet scans with Catalyst predicate
pushdown and column pruning — at 100 TB these scans are where most of
the win comes from, so every query selects columns explicitly and
filters as early as possible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region /
# nation are fixed-cardinality; customer/supplier/part grow with SF but stay
# far below fact-table size — still broadcastable at sf<=1; at 100 TB the
# planner's autoBroadcastJoinThreshold makes the call via AQE runtime stats).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a session without this
        # conf fails the scan outright ([PARQUET_TYPE_ILLEGAL]).  It is a
        # runtime SQL conf, so set it defensively — the driver harness
        # builds its own session and may not have it.  Same for the UTC
        # session timezone: the ts column is rebuilt with
        # timestamp_micros() (TIMESTAMP_LTZ), so collect()ed values must
        # render in UTC to match the tz-naive DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (spark.sql.legacy.parquet.nanosAsLong);
        # floor-divide to micros == DuckDB's nanos->micros truncation.
        from pyspark.sql import functions as F

        # integer div, not '/': nanos ~1.7e18 exceed double's 53-bit mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def source_fingerprint(sf_dir: str, name: str) -> str:
    """Size+mtime tag of a source parquet file, for keying derived
    on-disk layouts.  A cached layout keyed only on the sf_dir STRING
    silently reuses stale data if the fixture at that path is ever
    regenerated; folding the source fingerprint into the cache path
    invalidates it instead (review finding, round 4)."""
    st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
    return f"{st.st_size}_{st.st_mtime_ns}"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- bounded /tmp discipline for derived on-disk layouts ----------------
#
# Every key that materializes a derived layout (partitioned rewrite,
# bucketed warehouse table, CTAS location) keys the path on
# (appId, sf tag, source fingerprint) so concurrent sessions and
# regenerated fixtures never collide — but that very keying means each
# NEW session writes a fresh copy and the old one leaks forever (review
# finding, round 5: the exact leak once fixed for sql_ddl_roundtrip,
# reintroduced one level up).  Two complementary fixes, both here so
# every call site shares them:
#
# * ``derived_layout_path`` prunes SIBLING directories (same prefix +
#   sf tag, different appId/fingerprint) at path-computation time —
#   stale copies from dead sessions are reclaimed the next time any
#   session derives that layout.  Safe in this repo because Spark
#   sessions are never run concurrently (bench/selfcheck house rule);
#   a concurrent-session deployment would key the prune on dir age.
# * every path (and every ``scratch_dir`` mkdtemp) is registered for
#   atexit removal, so even a single session leaves /tmp clean.

_SESSION_TMP_PATHS: set[str] = set()
_FLAT_SCHEME_SWEPT = False


def _sweep_old_flat_layouts(live_app_id: str) -> None:
    """One-time reclaim of layouts that PRE-DATE the per-prefix nesting
    (review finding r7): earlier sessions wrote directly under the tmp
    root as ``{prefix}_{appId}_{sfTag}[_{fingerprint}]``, which the
    nested prune never visits, so they leak until tmp cleanup.  The
    match is anchored on the local-mode appId core (``local-<millis>``)
    plus an sf tag — the two components every flat-scheme name carried —
    and skips the live session's own appId for safety.  An mtime age
    guard (>1h) limits reclamation to genuinely stale layouts: the
    appId check only protects THIS process, so without it a concurrent
    session still on the pre-nesting code could lose live layouts
    mid-run (ADVICE r8; single-host sequential usage is the documented
    protocol, the guard makes the blast radius zero either way)."""
    import re
    import shutil
    import tempfile
    import time

    global _FLAT_SCHEME_SWEPT
    if _FLAT_SCHEME_SWEPT:
        return
    _FLAT_SCHEME_SWEPT = True
    root = tempfile.gettempdir()
    flat_re = re.compile(r"^\w+_local-\d{10,}_\w*sf\d\w*$")
    min_age_sec = 3600.0
    now = time.time()
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if not (os.path.isdir(p) and flat_re.match(name) and live_app_id not in name):
            continue
        try:
            age = now - os.path.getmtime(p)
        except OSError:
            continue
        if age > min_age_sec:
            shutil.rmtree(p, ignore_errors=True)


def _cleanup_session_tmp() -> None:
    import shutil

    for p in list(_SESSION_TMP_PATHS):
        shutil.rmtree(p, ignore_errors=True)


def _track_tmp(path: str) -> str:
    import atexit

    if not _SESSION_TMP_PATHS:
        atexit.register(_cleanup_session_tmp)
    _SESSION_TMP_PATHS.add(path)
    return path


def sf_tag(sf_dir: str) -> str:
    """Filesystem-safe tag of an sf directory (single owner of the
    spelling — three operator modules used to inline it)."""
    return "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))


def derived_layout_path(
    spark: SparkSession, prefix: str, sf_dir: str, table: str | None
) -> str:
    """Deterministic per-(session, sf, fixture) path for a derived
    on-disk layout, with leak control: stale siblings pruned, own path
    atexit-cleaned.  ``table=None`` drops the fingerprint component
    (for layouts rewritten from scratch on every call, e.g. CTAS)."""
    import re
    import shutil
    import tempfile

    tag = sf_tag(sf_dir)
    # Each prefix family lives in its own subdirectory so pruning for
    # prefix X can never touch a layout of any OTHER prefix, even one
    # spelled as a "_"-extension of X (review finding r6: a flat
    # "{prefix}_*" glob plus a greedy appId slot would let an "events"
    # prune rmtree a live "events_by_day_..." layout; appIds themselves
    # may contain underscores on YARN, so anchoring that slot is not
    # delimiter-safe either).
    _sweep_old_flat_layouts(spark.sparkContext.applicationId)
    fam_dir = os.path.join(tempfile.gettempdir(), "spark_graft_layouts", prefix)
    os.makedirs(fam_dir, exist_ok=True)
    parts = [spark.sparkContext.applicationId, tag]
    if table is not None:
        parts.append(source_fingerprint(sf_dir, table))
    out = os.path.join(fam_dir, "_".join(parts))
    # Exact-tag match (not substring): sf tags can be prefixes of each
    # other ("sf0_1" vs "sf0_12"), so a glob-only prune could reclaim a
    # LIVE layout of a different scale factor.
    sib_re = re.compile(rf"^.+_{re.escape(tag)}(_\d+_\d+)?$")
    for name in os.listdir(fam_dir):
        sib = os.path.join(fam_dir, name)
        if sib != out and sib_re.match(name):
            shutil.rmtree(sib, ignore_errors=True)
    return _track_tmp(out)


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit — per-invocation
    scratch for sink/source round-trip keys (each used to leak one
    directory per call across a long driver session)."""
    import tempfile

    return _track_tmp(tempfile.mkdtemp(prefix=prefix))
