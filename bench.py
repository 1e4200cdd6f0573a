#!/usr/bin/env python
"""Headline-query benchmark (BASELINE.md protocol).

Runs the headline SURVEY §2 keys at $SPARK_GRAFT_SF_DIR (default sf0.1) on a
warm local[$SPARK_GRAFT_CPUS] session, median of 3 runs per query, full plan
execution via the no-op sink (no driver collect skew). Prints ONE JSON line.
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
    # scale patterns
    "join_bucketed_colocated",
    # NORTH-STAR LLM-pipeline ops
    "ns_dedup_exact",
    "ns_dedup_minhash",
    "ns_dedup_ngram_jaccard",
    "ns_sim_topk",
    "ns_text_tfidf",
    "iter_pagerank_tokens",
    # event-time windows
    "stream_tumbling_agg",
    "stream_session_window",
]


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
    per_query = {}
    for key in keys:
        per_query[key] = round(statistics.median(run_once(spark, key) for _ in range(3)), 4)
    total = round(sum(per_query.values()), 4)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
