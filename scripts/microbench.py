#!/usr/bin/env python
"""Isolated per-key micro-bench for optimization work (guide §1).

Times individual registry keys with the same methodology as bench.py
(noop sink, warm session, N samples) without paying for the full
headline sweep.  Usage::

    python scripts/microbench.py key1,key2 [--n 5] [--sf-dir DIR] [--plans OUTDIR]

With ``--plans`` it also writes each key's ``explain("formatted")``
(the registered plan proxy for driver-paced keys, plus the final
result plan where the key is a single lazy plan) to
``OUTDIR/<key>.txt``.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_clustering_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None)
    args = ap.parse_args()

    from spark_streaming_clustering_spark.operators.registry import QUERIES
    from spark_streaming_clustering_spark.operators.registry import PLAN_PROXIES

    spark = get_spark("microbench")
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm JVM + python worker pool exactly like bench.py.
    _force(QUERIES["flagship_revenue"](spark, args.sf_dir))
    _force(spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long"))

    def _steal():
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return None

    out = {}
    for key in keys:
        samples = []
        # Per-sample job counts (ADVICE r13: a single overwritten value
        # silently misreports when warm-up/caching changes the count
        # across samples — e.g. a session-cached relation's first build).
        jobs_per_sample: list[int] = []
        st0 = _steal()
        for i in range(args.n):
            grp = f"mb_{key}_{i}"
            spark.sparkContext.setJobGroup(grp, f"microbench:{key}")
            t0 = time.monotonic()
            _force(QUERIES[key](spark, args.sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
            ids = spark.sparkContext.statusTracker().getJobIdsForGroup(grp)
            jobs_per_sample.append(len(ids))
        st1 = _steal()
        med = sorted(samples)[len(samples) // 2]
        njobs = jobs_per_sample[-1] if jobs_per_sample else None
        out[key] = {"median": med, "samples": samples, "jobs": njobs,
                    "jobs_per_sample": jobs_per_sample,
                    "steal_ticks": (st1 - st0) if st0 is not None else None}
        print(
            f"{key}: median={med} jobs={njobs} steal={out[key]['steal_ticks']}"
            f" samples={samples} jobs_per_sample={jobs_per_sample}",
            flush=True,
        )
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{key}.txt"), "w") as f:
                for label, fn in (
                    ("plan proxy (iteration shape)", PLAN_PROXIES.get(key)),
                    ("result plan", QUERIES[key]),
                ):
                    if fn is None:
                        continue
                    buf = io.StringIO()
                    try:
                        with redirect_stdout(buf):
                            fn(spark, args.sf_dir).explain("formatted")
                    except Exception as exc:  # noqa: BLE001
                        buf.write(f"<explain failed: {exc}>\n")
                    f.write(f"== {label} ==\n{buf.getvalue()}\n")
                    if label.startswith("plan proxy"):
                        # driver-paced keys: the result plan is a
                        # createDataFrame/checkpoint stub; proxy is the
                        # load-bearing shape, still print both.
                        pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
