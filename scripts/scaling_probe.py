"""Empirical scaling probe: run representative keys at all three fixture
scale factors and report the ELASTICITY of each key's wall-clock in its
driving table's row count — measured evidence for SCALE.md's claims.

elasticity = log(t_hi / t_lo) / log(n_hi / n_lo) over the sf0.01 ->
sf0.1 step (the small step is fixed-overhead-dominated at local scale
and is reported but not judged):

- ~1.0  linear in data (scan/agg-bound: the expected plateau)
- <1.0  sublinear (fixed overhead still amortizing — typical locally)
- >>1.0 superlinear — a pair expansion or shuffle blow-up; the probe's
  red flag (threshold 1.5 allows scheduling jitter on sub-second keys)

Rewrites the probe table inside SCALE.md's scaling-probe markers
(single authoritative scaling doc) and prints one JSON line.

Usage: python scripts/scaling_probe.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SFS = ["0.001", "0.01", "0.1"]

# key -> driving table (for row normalization; fixture tables scale
# unevenly: documents is flat 0.001->0.01, embeddings scales 4x at 0.1)
PROBE = {
    "flagship_revenue": "lineitem",
    "groupby_agg_sums": "lineitem",
    "sql_tpch_q9": "lineitem",
    "sql_tpch_q21": "lineitem",
    "orderby_limit": "lineitem",
    "window_tumbling": "events",
    "sessionize_events": "events",
    "cdc_apply": "events",
    "dedup_exact": "documents",
    "dedup_minhash_lsh": "documents",
    "dedup_incremental": "documents",
    "tf_idf_topk": "documents",
    "ann_ivf_topk": "embeddings",
    "embed_pq_codes": "embeddings",
    "skyline_pareto": "part",  # r6: bucket-parallel dominance sweep
    # r6 plan fixes — re-measured after the rewrites
    "cms_sketch_q": "events",
    "lang_id_ngram": "documents",
    "ngram_counts": "documents",
    # r8 additions (VERDICT r7 item 3): lag-window matrix + driver
    # iteration, cross-write histogram rollup (post-first-call = the
    # read-merge path), A-ES top-k, recursive BOM closure
    "markov_transitions": "events",
    "markov_steady_state": "events",
    "quantile_sketch_rollup": "orders",
    "weighted_reservoir_sample": "documents",
    "bom_rollup": "part",
    "auc_rank_metric": "events",
    "calibration_buckets": "events",
    # r9 additions (VERDICT r8 item 3): the three r8 second-batch keys
    # the probe table did not yet carry
    "funnel_attribution_linear": "events",
    "rendezvous_resharding": "documents",
    "concurrent_intervals": "orders",
    # r9 new keys (probed from birth)
    "ppjoin_set_similarity": "documents",
    "table_content_checksum": "orders",
    "join_size_estimate": "lineitem",
    "subset_containment_join": "documents",
    "agg_ivm_delta": "events",
    "equi_depth_histogram": "orders",
    "ks_two_sample": "events",
    "join_key_skew_profile": "lineitem",
    # r10 new keys (probed from birth)
    "v_optimal_histogram": "orders",
    "merkle_partition_diff": "orders",
    "cusum_changepoint": "events",
    "largest_remainder_alloc": "customer",
    "interval_union_measure": "orders",
    "zone_map_skip_stats": "orders",
    "theil_sen_trend": "orders",
    "isotonic_calibration": "events",
    "holt_linear_smoothing": "events",
    "bitemporal_pit_query": "orders",
    "kmv_distinct_sketch": "events",
    "benford_digit_audit": "orders",
    # r10 batches 6-12 (probed from birth)
    "temporal_join_sql2011": "orders",
    "kmv_set_ops": "events",
    "mann_whitney_u": "events",
    "chi_square_independence": "events",
    "gini_concentration": "orders",
    "acf_autocorrelation": "events",
    "assoc_rules_lift": "lineitem",
    "reciprocal_rank_fusion": "documents",
    "mann_kendall_trend": "orders",
    "time_weighted_average": "events",
    "winsorized_robust_mean": "orders",
    "runs_test_randomness": "events",
    "capture_recapture_estimate": "events",
    "anova_oneway": "events",
    "temporal_agg_sql2011": "orders",
    "psi_drift_vintages": "orders",
    "misra_gries_topk": "events",
    "interval_coalesce_pack": "orders",
    "ewma_control_chart": "events",
    # r11 new keys (probed from birth)
    "graph_kcore_richclub": "orders",
    "bitemporal_temporal_join": "orders",
    "graph_label_propagation": "orders",
    "dedup_mis_max_retention": "documents",
    "graph_coreness_decomposition": "orders",
    # r12 new keys (probed from birth); streaming_dedup_watermark's
    # wall is replay-harness-paced (4 micro-batches over a key-sized
    # fixture), so near-zero elasticity is the expected, honest answer
    "graph_weighted_shortest_path": "orders",
    "streaming_dedup_watermark": "events",
    "streaming_window_append_final": "events",
    "join_ivm_delta": "orders",
    "spearman_corr": "documents",
    "ohlc_resample": "events",
    "kcenter_diversity_select": "embeddings",
    "greedy_set_cover": "documents",
    "gram_matrix_embeddings": "embeddings",
    # r13 new key (probed from birth): iterative Borůvka — rounds are
    # log-bounded (2/3/4 at the three sfs), per-round scans shrink
    "boruvka_msf_trade": "lineitem",
    # r13 batch 2 (probed from birth): sort-blocked window + bounded
    # verify join; 26 domain-bound counting rounds; one sufficient-
    # statistics aggregate
    "dedup_sorted_neighborhood": "documents",
    "exact_quantile_bisect": "orders",
    "ols_normal_equations": "documents",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from spark_streaming_clustering_spark.session import get_spark
    from spark_streaming_clustering_spark.operators.registry import QUERIES

    spark = get_spark("scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = {
        sf: {
            t: pq.read_metadata(
                f"/root/testdata/sf{sf}/{t}.parquet"
            ).num_rows
            for t in set(PROBE.values())
        }
        for sf in SFS
    }

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm JVM + python workers once
    force(QUERIES["flagship_revenue"](spark, "/root/testdata/sf0.001"))
    force(spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long"))

    results: dict[str, dict] = {}
    for key, table in PROBE.items():
        times = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = float("inf")
            for _ in range(args.runs + 1):  # first run warms the plan
                t0 = time.monotonic()
                force(QUERIES[key](spark, sf_dir))
                best = min(best, time.monotonic() - t0)
            times[sf] = round(best, 3)
        n_lo, n_hi = rows["0.01"][table], rows["0.1"][table]
        t_lo, t_hi = times["0.01"], times["0.1"]
        if n_hi > n_lo and t_lo > 0:
            elast = round(math.log(t_hi / t_lo) / math.log(n_hi / n_lo), 2)
        else:
            elast = None  # driving table does not grow on this step
        results[key] = {
            "table": table,
            "t": times,
            "rows_step": f"{n_lo}->{n_hi}",
            "elasticity": elast,
        }
        print(f"{key:28s} {times} elast={elast}", file=sys.stderr)

    lines = [
        "| key | driving table | t(0.001) s | t(0.01) s | t(0.1) s | rows 0.01->0.1 | elasticity |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, r in results.items():
        e = "n/a" if r["elasticity"] is None else f"{r['elasticity']:.2f}"
        lines.append(
            f"| {key} | {r['table']} | {r['t']['0.001']} | {r['t']['0.01']} |"
            f" {r['t']['0.1']} | {r['rows_step']} | {e} |"
        )
    flagged = [
        k for k, r in results.items()
        if r["elasticity"] is not None and r["elasticity"] > 1.5
    ]
    lines += [
        "",
        f"Superlinear flags (> 1.5): {flagged if flagged else 'none'}.",
    ]
    # One authoritative scaling doc (VERDICT r6 item 7): splice the
    # table into SCALE.md's marked span instead of a separate SCALING.md.
    scale_md = os.path.join(_HERE, "SCALE.md")
    start, end = "<!-- scaling-probe:start -->", "<!-- scaling-probe:end -->"
    with open(scale_md) as f:
        doc = f.read()
    if start not in doc or end not in doc:
        raise SystemExit(f"markers {start}/{end} missing from SCALE.md")
    head, rest = doc.split(start, 1)
    _, tail = rest.split(end, 1)
    with open(scale_md, "w") as f:
        f.write(head + start + "\n" + "\n".join(lines) + "\n" + end + tail)

    print(json.dumps({"metric": "scaling_elasticity", "results": results,
                      "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
