"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementation lives in ``week3_2_practice_big_data__spark`` (see
SURVEY.md §2 for the key inventory); this module only adapts the engine's
query REGISTRY to the driver's three-function surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from week3_2_practice_big_data__spark import REGISTRY  # noqa: E402
from week3_2_practice_big_data__spark.session import ensure_session_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "agg_groupby_multi"

# Keys already hash-verified by the driver (CORRECTNESS_r01 + r02, all
# green). The driver checks a bounded prefix (~50 keys) of `queries()`, so
# keys NOT yet driver-verified are emitted first; these proven keys go to
# the back.
#
# ROUND-4 ORDERING NOTE (do this when rotating after r3): fold
# CORRECTNESS_r03's green keys into _R03_VERIFIED below, empty and then
# repopulate _CHANGED_THIS_ROUND with round-4 work, and keep the remaining
# never-verified oracle keys (≈48 after r3 — the statml/timeseries/
# iterative/fn tail of _PENDING_PRIORITY; all were pre-flighted green at
# sf0.01 against DuckDB this round, so the rotation is de-risked) at the
# front of the pending block, followed by the rows-only pending keys. Any
# key whose implementation changes in r4 re-enters _CHANGED_THIS_ROUND even
# if verified here — no key ships two rounds unverified.
_R01_VERIFIED = frozenset({
    "agg_groupby_multi", "agg_extent", "agg_centroid_mean",
    "agg_sum_normalize", "agg_count_distinct", "agg_rollup_cube",
    "agg_cube", "agg_salted_skew", "agg_percentile", "agg_corr_moments",
    "agg_mode", "udaf_weighted_quantity", "agg_grouping_sets",
    "join_cross_meshgrid", "join_broadcast_params", "join_inner_equi",
    "join_outer", "join_semi_anti", "join_range_theta", "join_asof",
    "join_bucketed_colocated", "join_salted_skew",
    "win_conv1d_frame", "win_rank_order", "win_lead_lag",
    "win_running_agg", "win_ntile", "win_range_frame", "win_first_last",
    "win_percent_rank",
    "sort_orderby", "limit_topk", "limit_topk_per_group",
    "set_union", "set_intersect", "set_except",
    "filt_range_pred", "filt_dict_dispatch",
    "reshape_pivot", "reshape_unpivot", "merge_upsert",
    "proj_dist_radial", "proj_dot_light", "proj_minmax_norm",
    "proj_shade_affine", "proj_color_scale", "proj_trig_polar",
    "proj_wobble", "proj_gauss_exp",
})

# CORRECTNESS_r02.json: 50/50 green (rows + schema + hash).
_R02_VERIFIED = frozenset({
    "agg_approx_distinct", "agg_cohort_retention", "agg_conditional",
    "agg_sketch_hll_merge", "agg_sketch_kll_quantile", "filt_mask_apply",
    "filt_pip_scanline", "filt_point_in_polygon", "fn_bitwise_ops",
    "fn_datetime_math", "fn_hsv_to_rgb", "fn_json_extract", "fn_string_fmt",
    "gen_poster_param", "gen_poster_shadow", "join_interval_bucketed",
    "join_q3_shipping_priority", "join_q5_region_volume", "ns_decontaminate",
    "ns_dedup_cluster", "ns_dedup_embed_cosine", "ns_dedup_exact",
    "ns_dedup_minhash", "ns_dedup_ngram_jaccard", "ns_dedup_simhash",
    "ns_pack_sequences", "ns_pipeline_e2e", "ns_sample_stratified",
    "ns_sim_ann_ivf", "ns_sim_ann_lsh", "ns_sim_topk", "ns_split_train_val",
    "ns_text_clean", "ns_text_fingerprint", "ns_text_langid",
    "ns_text_quality", "ns_text_stats", "ns_text_tfidf", "ns_text_tokens",
    "proj_cond_guard", "proj_mod_cycle", "proj_resample_bilinear",
    "set_except_all", "set_intersect_all", "sink_display",
    "sort_composite_order", "src_orc_roundtrip", "win_cume_dist",
    "win_funnel_conversion", "win_sessionize_gaps",
})

_VERIFIED = _R01_VERIFIED | _R02_VERIFIED


# Keys whose implementation CHANGED in round 3 (new or rewritten): their
# prior verification status is stale, so they lead the window.
_CHANGED_THIS_ROUND = [
    # LSH band width is now scale-derived (⌈log₂ n⌉) and the pair dedup
    # moved past the cosine filter — the whole banded-signature family
    # re-enters the window.
    "ns_dedup_embed_cosine",
    "ns_sim_ann_lsh",
    # degenerate-width guard (ADVICE r2)
    "agg_histogram",
    # LEFT JOIN + zero-token sentinel weight (ADVICE r2)
    "ns_domain_mix",
    # new: second shadow-blur oracle point past the σ floor
    "gen_poster_shadow_blur",
    # new LLM-pipeline operators (SemDeDup / CCNet-perplexity / importance
    # sampling); ns_sim_ann_ivf re-enters via the shared IVF CTE refactor
    "ns_semdedup",
    "ns_text_perplexity",
    "ns_sample_importance",
    "ns_dedup_substring",
    "ns_sample_reservoir",
    "iter_bpe_merges",
    "src_text_lines",
    "ts_resample_fill",
    "ns_pii_scrub",
    "graph_triangle_count",
    "ml_naive_bayes",
    "agg_t_test",
    "win_cusum_changepoint",
    "ts_downsample_lttb",
    "agg_chi2_independence",
    "ml_pca_power",
    "agg_bootstrap_poisson",
    "agg_anova_oneway",
    "ns_sim_ann_ivf",
    # degenerate-input guards (NULL on zero-variance / rank-floor): output
    # is unchanged on real data, but the text changed → re-window
    "agg_corr_moments",
    "agg_sketch_kll_quantile",
    # scratch builds are now race-safe (build-to-tmp + atomic rename);
    # same results, changed build path
    "join_dpp_partitioned",
    # rows-only keys that changed/appeared this round (driver still catches
    # errors + row-count/schema drift on them):
    "sink_binary_export_tiled",
    "stream_tumbling_file_rate",
    "stream_sink_parquet",
    "stream_rate_source",
    "ns_mm_image_phash",
    "ns_mm_scene_cut",
    "src_csv_malformed",
    "src_binary_files",
]


# Never-driver-verified oracle keys, priority-ordered for the r3 window:
# SURVEY §2 CONTRACT keys first (sources, batch event-time windows, UDF/
# UDTF surface, conv2d), then subqueries/TPC-H, then the llmprep/statml/
# timeseries/partitioned/iterative tail. Keys not listed here sort after
# the listed ones in registration order.
_PENDING_PRIORITY = [
    # §2 contract
    "src_range_gen", "src_sequence", "src_param_lookup", "src_parquet_scan",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
    "udf_rowwise_lambda", "udf_geom_contains", "udtf_explode_gen",
    "win_conv2d_separable",
    # subqueries + TPC-H
    "qry_scalar_subquery", "qry_correlated_scalar", "qry_exists_correlated",
    "qry_in_null_semantics", "qry_lateral_topk", "qry_recursive_cte",
    "join_q4_order_priority", "join_q7_volume_shipping",
    "join_q10_returned_item", "agg_q14_promo_share", "agg_q16_supplier_cnt",
    "agg_q18_large_orders",
    # sources/sinks tail
    "sink_partitioned_write", "src_csv_roundtrip", "src_json_roundtrip",
    "src_table_stats", "src_partition_prune_static",
    # llmprep NS tail
    "ns_repetition_filter", "ns_text_pmi", "ns_decontaminate_ngram",
    "ns_dedup_incremental", "ns_dedup_paragraph", "ns_embed_quantize",
    "ns_ann_knn_join", "ns_bpe_pair_stats",
    # statml / analytics / timeseries
    "agg_skew_kurt", "ml_linreg_closed", "agg_market_basket",
    "win_rolling_corr", "agg_gini_revenue", "agg_ohlc_bars",
    "agg_mad_robust", "agg_entropy", "dq_constraint_check", "merge_scd2",
    "win_moving_zscore", "win_interpolate_gaps", "agg_bitmap_distinct",
    "win_islands_ranges", "join_spatial_grid", "join_asof_forward",
    "join_asof_nearest", "win_ewma_smooth", "win_distinct_rolling",
    "join_dpp_partitioned",
    # iterative
    "iter_pagerank_tokens", "iter_connected_components", "iter_kmeans_points",
    "iter_gd_logreg", "iter_kcore",
    # streaming joins
    "stream_stream_join", "stream_static_join",
    # scalar-function tail
    "fn_array_ops", "fn_regex_extract", "fn_null_semantics", "fn_map_ops",
    "fn_string_similarity", "fn_variant_json", "fn_url_parse",
    "agg_string_listagg", "fn_try_arith",
]


def _ordered_keys() -> list[str]:
    """Registry keys ordered for the driver's bounded correctness window:
    changed-this-round keys with an oracle first (stale verification AND
    strong signal), then driver-unverified oracle keys (§2 contract keys
    leading, per _PENDING_PRIORITY), then changed rows-only keys (error/
    row-count signal only), then unverified rows-only keys, then proven
    keys (registration order within unlisted groups)."""
    changed = [k for k in _CHANGED_THIS_ROUND if k in REGISTRY]
    changed_set = set(changed)
    changed_oracle = [k for k in changed if REGISTRY[k].oracle is not None]
    changed_rows_only = [k for k in changed if REGISTRY[k].oracle is None]
    rest = [k for k in REGISTRY if k not in changed_set]
    prio = {k: i for i, k in enumerate(_PENDING_PRIORITY)}
    pending_oracle = sorted(
        (
            k for k in rest
            if k not in _VERIFIED and REGISTRY[k].oracle is not None
        ),
        key=lambda k: prio.get(k, len(prio)),
    )
    pending_rows_only = [
        k for k in rest
        if k not in _VERIFIED and REGISTRY[k].oracle is None
    ]
    proven = [k for k in rest if k in _VERIFIED]
    return (
        changed_oracle
        + pending_oracle
        + changed_rows_only
        + pending_rows_only
        + proven
    )


def _tuned(builder: Callable[[SparkSession, str], DataFrame]):
    """Apply runtime session confs (timezone, ns-parquet, AQE, shuffle
    partitions) before building — the driver hands us its own session."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_session_confs(spark)
        return builder(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY §7.1 M1) on sf0.001."""
    return _tuned(REGISTRY[FLAGSHIP].builder)(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return {key: _tuned(REGISTRY[key].builder) for key in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per key (omitted → rows-only check)."""
    return {
        key: REGISTRY[key].oracle
        for key in _ordered_keys()
        if REGISTRY[key].oracle is not None
    }
