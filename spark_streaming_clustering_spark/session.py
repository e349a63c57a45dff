"""SparkSession factory.

Single place where execution configuration lives so tests, the driver
contract (``__spark_entry__``) and ``bench.py`` all run with the same,
scale-aware settings.

Design notes for cluster scale (the real target is ~100 TB on O(1000)
executors; local[32] only verifies correctness):

* AQE on — runtime coalescing + skew-join splitting replace hand-tuned
  partition counts when data sizes move by 1000x.
* ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a real cluster this would be ~2-3x total cores.
* Arrow on — every Pandas UDF / ``toPandas`` boundary is Arrow-batched.
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark-streaming-clustering-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` (when given) is passed through verbatim — a CLI user
    handing us ``spark://...`` or ``yarn`` gets exactly that cluster,
    not a silent local fallback.  For ``local[n]`` masters the thread
    count also sizes ``spark.sql.shuffle.partitions``.
    """
    if master is not None:
        if master.startswith("local") and "[" in master:
            inner = master[master.index("[") + 1 : -1]
            if cpus is None and inner not in ("*", ""):
                cpus = int(inner)
        master_url = master
        cpus = cpus or DEFAULT_CPUS
    else:
        cpus = cpus or DEFAULT_CPUS
        master_url = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master_url)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long then convert
        # (tables.load_table) — Spark has no native nanos timestamp type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
