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
]


# Standing per-query baseline: the round-6 QUIET-BOX rerun
# (BENCH_full_r06quiet.json, sf0.1, local[32], 5 interleaved passes) —
# VERDICT r5 item 7: r5's recorded bench drifted a uniform ~1.16× on a
# noisy shared VM (the quiet rerun landed back at 0.86–1.15× of r04
# across the board, confirming noise, and the suspected
# gen_poster_caption creep vanished: 0.383 s vs its 0.300 s r04
# median), so the baseline is rolled from a run whose median/min spread
# is <15% on 33/39 keys rather than from the noisy in-round artifact.
# EVERY entry below is a measured median from that run — the r04
# era's seven reconstructed values are fully retired (ADVICE r5 item 4;
# `baseline_src` in the output records the provenance).
PREV_ROUND = "r06q"
BASELINE_SRC = "BENCH_full_r06quiet.json (measured, quiet-box rerun before r6 changes)"
PREV_MEDIANS = {
    "agg_groupby_multi": 1.0081,
    "filt_pip_scanline": 1.0418,
    "filt_point_in_polygon": 1.4628,
    "gen_poster_aspect": 1.9201,
    "gen_poster_caption": 0.3827,
    "gen_poster_full": 2.833,
    "gen_poster_shadow": 2.056,
    "iter_pagerank_tokens": 2.0809,
    "join_bucketed_colocated": 0.6983,
    "join_inner_equi": 0.7653,
    "join_q3_shipping_priority": 0.7549,
    "join_q5_region_volume": 1.249,
    "join_q7_volume_shipping": 0.8344,
    "join_range_theta": 0.4246,
    "ns_ann_knn_join": 0.9404,
    "ns_dedup_cluster": 1.3989,
    "ns_dedup_embed_cosine": 2.216,
    "ns_dedup_exact": 0.3203,
    "ns_dedup_minhash": 0.7777,
    "ns_dedup_ngram_jaccard": 1.8289,
    "ns_dedup_simhash": 1.0659,
    "ns_dedup_substring": 0.8226,
    "ns_semdedup": 3.0958,
    "ns_sim_ann_lsh": 0.2865,
    "ns_sim_topk": 0.3343,
    "ns_text_perplexity": 1.031,
    "ns_text_tfidf": 0.9222,
    "proj_resample_bilinear": 0.4787,
    "qry_recursive_cte": 1.5239,
    "sort_composite_order": 2.0245,
    "sort_orderby": 0.6304,
    "stream_custom_state": 6.336,
    "stream_session_window": 0.8378,
    "stream_tumbling_agg": 0.5013,
    "stream_watermark_late": 6.3863,
    "win_conv1d_frame": 0.9153,
    "win_conv2d_separable": 1.8064,
    "win_islands_blocked": 0.3397,
    "win_ntile_blocked": 0.9659,
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
    round_tag = os.environ.get("SPARK_GRAFT_ROUND", "r07")
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
