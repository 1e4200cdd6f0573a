#!/usr/bin/env python
"""Headline-query benchmark (BASELINE.md protocol).

Runs the headline SURVEY §2 keys at $SPARK_GRAFT_SF_DIR (default sf0.1) on a
warm local[$SPARK_GRAFT_CPUS] session, median AND min of 5 interleaved runs
per query, full plan execution via the no-op sink (no driver collect skew).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from week3_2_practice_big_data__spark import REGISTRY, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    # relational core
    "agg_groupby_multi",
    "join_inner_equi",
    "join_range_theta",
    "sort_orderby",
    "win_conv1d_frame",
    # generative pipeline
    "filt_point_in_polygon",
    "filt_pip_scanline",
    "win_conv2d_separable",
    "sort_composite_order",
    "gen_poster_full",
    "gen_poster_shadow",
    "proj_resample_bilinear",
    # round-4 additions: caption-stamped composite, 7:10 aspect composite
    "gen_poster_caption",
    "gen_poster_aspect",
    # scale patterns
    "join_bucketed_colocated",
    "join_q3_shipping_priority",
    "join_q5_region_volume",
    # round-2 additions: deeper TPC-H star join, batch kNN, recursive CTE
    "join_q7_volume_shipping",
    "ns_ann_knn_join",
    "qry_recursive_cte",
    # NORTH-STAR LLM-pipeline ops
    "ns_dedup_exact",
    "ns_dedup_minhash",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
    "ns_dedup_embed_cosine",
    "ns_dedup_cluster",
    "ns_sim_topk",
    "ns_sim_ann_lsh",
    "ns_text_tfidf",
    # round-3 additions: semantic dedup, LM-quality scoring, span dedup
    "ns_semdedup",
    "ns_text_perplexity",
    "ns_dedup_substring",
    "iter_pagerank_tokens",
    # event-time windows
    "stream_tumbling_agg",
    "stream_session_window",
    # round-5 additions: hierarchical global-window scale paths and the
    # oracle-ized streaming keys (no PREV baseline yet — first recorded
    # medians seed the r6 standing baseline)
    "win_islands_blocked",
    "win_ntile_blocked",
    "stream_watermark_late",
    "stream_custom_state",
    # round-6 addition: the corpus-tier key now on the blocked
    # decomposition (first recorded median seeds the r7 baseline).
    # stream_unbounded_socket is deliberately NOT benched: its wall is
    # dominated by the driver-thread broker feeding the TCP socket.
    "ns_sample_importance",
    # round-6 second-session additions: the two sketch-accelerated-exact
    # plans (first recorded medians seed the r7 baseline).
    "ns_decontaminate_bloom",
    "agg_sketch_cms_heavy",
    "win_event_pattern_cep",
    # round-7 additions: corpus-wide BPE application, the
    # persist-and-probe index lifecycle, the pushdown-benchmark scan and
    # the deepest star join (first recorded medians seed the r8
    # baseline).
    "ns_bpe_encode",
    "ns_dedup_incremental_persist",
    "agg_q6_forecast_revenue",
    "join_q8_market_share",
    # round-7 second session: the Q9 profit star (heaviest of the four
    # closing TPC-H shapes) and the blocked global training-order
    # permutation (first recorded medians seed the r8 baseline).
    "join_q9_product_profit",
    "ns_global_shuffle",
    # round-7 third session: path-statistic window, summary-sized ACF,
    # and the graph node-similarity key (first medians seed r8).
    "ts_max_drawdown",
    "ts_autocorr",
    "graph_bipartite_jaccard",
    "ts_cross_corr",
    # round-7 fourth session: weighted common-neighbor link prediction,
    # greedy integer-cents allocation, and the PSI drift monitor (first
    # medians seed the r8 baseline).
    "graph_resource_alloc",
    "win_budget_allocation",
    "dq_distribution_drift",
    "agg_sketch_kmv_intersect",
    # round-7 fifth session: BM25 ranked retrieval over the shared token
    # stream, clustering coefficient, kNN classification, and the
    # histogram decision stump (first medians seed the r8 baseline).
    "ns_text_bm25",
    "graph_clustering_coeff",
    "ml_knn_classify",
    "ml_decision_stump",
    "win_attribution",
    "graph_degree_distribution",
    "ml_lift_gains",
    "dq_freshness",
    "dq_rowcount_anomaly",
    "iter_als_rank2",
    "win_markov_transitions",
    "win_survival_km",
    # round-8: the rebuilt FULL composed pipeline (url canon → dedup
    # cluster → quality classifier → perplexity tercile → bloom decontam →
    # pack → blocked global shuffle → mixture epochs) and the multi-source
    # BFS frontier loop; first medians seed the r9 baseline.
    "ns_pipeline_e2e",
    "iter_bfs_sssp",
    "win_pareto_abc",
    "ns_curriculum_order",
    "stream_chained_join_agg",
    "ts_rollup_multires",
    "ml_gbt_boost2",
]


# Standing per-query baseline: rolled each round from the latest QUIET
# run only (r6 discipline — a noisy shared-VM artifact would compound
# drift into the baseline). Currently the r7 final-validation run
# (BENCH_full_r07.json, sf0.1, local[32], 5 interleaved passes, 39/47
# keys <15% median/min spread; it measured 0.857× geomean vs the r06
# quiet baseline with zero regressions, so rolling tightens the bar).
# EVERY entry below is a measured median from that run — reconstructed
# values stay banned (ADVICE r5 item 4; `baseline_src` in the output
# records the provenance).
PREV_ROUND = "r07"
BASELINE_SRC = "BENCH_full_r07.json (measured, quiet final-validation run after all r7 changes; 39/47 keys <15% median/min spread)"
PREV_MEDIANS = {
    "agg_groupby_multi": 0.982,
    "agg_q6_forecast_revenue": 0.2096,
    "agg_sketch_cms_heavy": 1.0523,
    "filt_pip_scanline": 0.9322,
    "filt_point_in_polygon": 1.3416,
    "gen_poster_aspect": 1.7276,
    "gen_poster_caption": 0.1711,
    "gen_poster_full": 2.4652,
    "gen_poster_shadow": 1.7038,
    "iter_pagerank_tokens": 1.5656,
    "join_bucketed_colocated": 0.6634,
    "join_inner_equi": 0.7168,
    "join_q3_shipping_priority": 0.7698,
    "join_q5_region_volume": 1.0597,
    "join_q7_volume_shipping": 0.799,
    "join_q8_market_share": 0.9679,
    "join_range_theta": 0.3993,
    "ns_ann_knn_join": 0.8774,
    "ns_bpe_encode": 2.0272,
    "ns_decontaminate_bloom": 0.8939,
    "ns_dedup_cluster": 1.2388,
    "ns_dedup_embed_cosine": 1.8618,
    "ns_dedup_exact": 0.2906,
    "ns_dedup_incremental_persist": 0.7162,
    "ns_dedup_minhash": 0.7616,
    "ns_dedup_ngram_jaccard": 1.6446,
    "ns_dedup_simhash": 0.9063,
    "ns_dedup_substring": 0.6729,
    "ns_sample_importance": 0.4141,
    "ns_semdedup": 2.7577,
    "ns_sim_ann_lsh": 0.2469,
    "ns_sim_topk": 0.3353,
    "ns_text_perplexity": 0.4197,
    "ns_text_tfidf": 0.7566,
    "proj_resample_bilinear": 0.3578,
    "qry_recursive_cte": 1.3653,
    "sort_composite_order": 1.8021,
    "sort_orderby": 0.5456,
    "stream_custom_state": 5.22,
    "stream_session_window": 0.7527,
    "stream_tumbling_agg": 0.45,
    "stream_watermark_late": 5.3905,
    "win_conv1d_frame": 0.887,
    "win_conv2d_separable": 1.6585,
    "win_event_pattern_cep": 1.0579,
    "win_islands_blocked": 0.3033,
    "win_ntile_blocked": 0.8472,
}


# Keys whose ratio vs the standing median reflects deliberate FUNCTIONAL
# GROWTH, not a plan regression — carried in the output so a >1.3× entry
# is read with its cause (VERDICT r2 §What's wrong).
GROWTH_NOTES = {
    "sort_composite_order": "r2 widened the key from bbox-only to "
    "full-canvas compositing with themed backgrounds; r1 ratio 1.91x was "
    "functional growth, baseline now reset to the wide form",
    "ns_dedup_substring": "r5 added the rep-collapse stage (spans indexed "
    "over exact-dup representatives + member expansion): ~1.25x at sf0.1 "
    "buys the df-cap recall fix under duplication and drops the 10x-dup "
    "wall from 2.3x to ~1.1x",
    "ns_text_perplexity": "r6 replaced the corpus-sized global ntile(3) "
    "sort with the blocked hierarchical decomposition (VERDICT r5 item "
    "3): ~1.4x at sf0.1 from extra exchange stages at tiny scale, vs "
    "9.8x instead of 89x at 100x — the scale path is the point",
}


def run_once(spark, key: str) -> float:
    builder = REGISTRY[key].builder
    start = time.perf_counter()
    df = builder(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    spark = get_spark("w32bd-bench")
    spark.sparkContext.setLogLevel("ERROR")
    keys = [k for k in HEADLINE if k in REGISTRY]
    # Warm the JVM/codegen/file-listing paths once before timing.
    for key in keys:
        run_once(spark, key)
    # Five PASS-INTERLEAVED timed runs (not 5 back-to-back per key): the
    # host VM's throughput drifts over minutes, and interleaving spreads
    # that drift evenly across keys instead of loading it onto whichever
    # keys run last.
    samples = {key: [] for key in keys}
    for _ in range(5):
        for key in keys:
            samples[key].append(run_once(spark, key))
    per_query = {
        key: round(statistics.median(vals), 4) for key, vals in samples.items()
    }
    # Noise floor (VERDICT r3 item 10): the per-key MINIMUM is the best
    # observed wall — on a noisy shared VM the median of sub-second keys
    # moves ±30% run to run while the min is far more stable, so
    # regressions at the 0.1 s scale are judged against BOTH.
    per_query_min = {
        key: round(min(vals), 4) for key, vals in samples.items()
    }
    total = round(sum(per_query.values()), 4)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    vs_prev = {
        k: round(per_query[k] / PREV_MEDIANS[k], 2)
        for k in per_query
        if k in PREV_MEDIANS and PREV_MEDIANS[k] > 0
    }
    regressions = sorted(k for k, r in vs_prev.items() if r > 2.0)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n": 5,  # r4: 5 interleaved timed passes (median + min reported)
        "queries": per_query,
        "queries_min": per_query_min,
        "sf": sf,
        "prev_round": PREV_ROUND,
        "baseline_src": BASELINE_SRC,
        "vs_prev": vs_prev,
        "regressions": regressions,
        "growth_notes": {
            k: v for k, v in GROWTH_NOTES.items() if k in per_query
        },
    }
    # Persist the COMPLETE output in-repo (VERDICT r4 item 3): the
    # driver's BENCH_r{N}.json artifact keeps only a 2000-char tail,
    # which has twice truncated away medians/queries_min the next
    # round's standing baseline needed. Best-effort: benching from a
    # read-only checkout must not break the stdout contract.
    round_tag = os.environ.get("SPARK_GRAFT_ROUND", "r08")
    try:
        full = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_full_{round_tag}.json",
        )
        with open(full, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
