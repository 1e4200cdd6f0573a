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

# Keys already hash-verified by the driver (CORRECTNESS_r01/r02/r03, all
# green). The driver checks a bounded prefix (~50 keys) of `queries()`, so
# keys NOT yet driver-verified are emitted first; these proven keys go to
# the back.
#
# ROUND-5 ORDERING NOTE (when rotating after r4): fold CORRECTNESS_r04's
# green keys into _R04_VERIFIED below, repopulate _CHANGED_THIS_ROUND with
# round-5 work, and lead the pending block with the 19 oracle keys the r4
# window could not fit (the asof/window/iterative/streaming-join/fn tail
# of _PENDING_PRIORITY — all sf0.01-sweep-green this round), followed by
# the 24 never-verified ROWS-ONLY keys (sink_binary_export,
# udf_grouped_map_render, ns_multimodal_*, stream_watermark_late,
# stream_dedup_state, …). 19 + 24 = 43: one window with room for
# proven-key re-verification.
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

# CORRECTNESS_r03.json: 49/50 green; the one red row (udf_geom_contains)
# was a DuckDB HUGEINT→float64 oracle-type artifact, fixed in r4 and
# re-windowed via _CHANGED_THIS_ROUND.
_R03_VERIFIED = frozenset({
    "agg_anova_oneway", "agg_bootstrap_poisson", "agg_chi2_independence",
    "agg_corr_moments", "agg_histogram", "agg_q14_promo_share",
    "agg_q16_supplier_cnt", "agg_q18_large_orders",
    "agg_sketch_kll_quantile", "agg_t_test", "gen_poster_shadow_blur",
    "graph_triangle_count", "iter_bpe_merges", "join_dpp_partitioned",
    "join_q10_returned_item", "join_q4_order_priority",
    "join_q7_volume_shipping", "ml_naive_bayes", "ml_pca_power",
    "ns_dedup_embed_cosine", "ns_dedup_substring", "ns_domain_mix",
    "ns_pii_scrub", "ns_sample_importance", "ns_sample_reservoir",
    "ns_semdedup", "ns_sim_ann_ivf", "ns_sim_ann_lsh",
    "ns_text_perplexity", "qry_correlated_scalar", "qry_exists_correlated",
    "qry_in_null_semantics", "qry_lateral_topk", "qry_recursive_cte",
    "qry_scalar_subquery", "src_param_lookup", "src_parquet_scan",
    "src_range_gen", "src_sequence", "src_text_lines",
    "stream_session_window", "stream_sliding_agg", "stream_tumbling_agg",
    "ts_downsample_lttb", "ts_resample_fill", "udf_rowwise_lambda",
    "udtf_explode_gen", "win_conv2d_separable", "win_cusum_changepoint",
})

_VERIFIED = _R01_VERIFIED | _R02_VERIFIED | _R03_VERIFIED


# Keys whose implementation CHANGED in round 4 (new or rewritten): their
# prior verification status is stale, so they lead the window.
_CHANGED_THIS_ROUND = [
    # r3's one red row: oracle sum(CASE…) now CAST to BIGINT (DuckDB
    # HUGEINT→float64 hash artifact, VERDICT r3 item 2)
    "udf_geom_contains",
    # ADVICE r3: sum(v6·v6) window accumulates as DECIMAL(38,0) — same
    # values at test scale, overflow-proof at 100 TB event cardinality
    "win_cusum_changepoint",
    # ADVICE r3: per-token log-likelihoods + prior q6-quantized to BIGINT
    # micro-units BEFORE summation — argmax now summation-order-proof
    "ml_naive_bayes",
    # ADVICE r3: covariance cells / matvec / Rayleigh quotient rebuilt on
    # exact-integer accumulation (DECIMAL(38,0) cross sums)
    "ml_pca_power",
    # NEW r4: coolwarm/Wistia literal-anchor colormap background
    # (VERDICT r3 item 4)
    "gen_poster_bg_colormap",
    # NEW r4: seed-caption 5×7 glyph layer over the composite
    # (VERDICT r3 item 7)
    "gen_poster_caption",
    # NEW r4: 7:10 figure-aspect composite (VERDICT r3 item 9)
    "gen_poster_aspect",
    # NEW r4: Z-order layout-clustering analytic (portable Morton code +
    # per-z-range locality spans)
    "agg_zorder_clustering",
    # r4: span join key is now a 62-bit integer hash (8-byte shuffle keys
    # instead of ~50-byte strings; result verified identical)
    "ns_dedup_substring",
    # NEW r4: temperature-scaled domain mixing (p ∝ share^τ) and
    # Kneser-Ney bigram smoothing
    "ns_domain_temperature",
    "ns_kn_bigram",
    # r4 adversarial-values hardening (see SURVEY §9): keys whose result
    # formulas changed structurally re-enter the window. (The q6/sat
    # guards also changed EVERY oracle's text globally — that change is
    # value-identical on in-domain data and is carried by this round's
    # full 198-key sf0.01 sweep + 534-test suite, both green; the window
    # can't hold 198 keys.)
    "agg_conditional",      # composite argmax key: sat gate + sign offset
    "win_rolling_corr",     # sat gate, frame-width-derived bound
    "win_moving_zscore",    # sat gate
    "ns_text_quality",      # empty-text divisor floor
    "ns_text_fingerprint",  # empty-string polyhash branch
    "ns_embed_quantize",    # zero-scale nullif+coalesce
    "ns_sim_topk",          # zero-norm nullif
    "ns_dedup_embed_cosine",
    "ns_semdedup",
    "ns_sim_ann_lsh",
    "ns_sim_ann_ivf",
    "ns_ann_knn_join",
    # r4 late audit: rep-collapse applied to SimHash too (12.2× → 0.77×
    # at 10× duplication; pair set proven identical)
    "ns_dedup_simhash",
    # r4: rep-collapse (exact-dup representatives before shingling/banding,
    # VERDICT r3 item 5) — pair set proven identical to the vector-level
    # plan at the fixed 4×4 banding; cluster consumes the same pair SQL
    "ns_dedup_minhash",
    "ns_dedup_cluster",
    # rows-only keys changed in r4 (origin-lower scanline flip + caption
    # in the PNG exports; scratch stamp revision) — driver catches
    # err/row-count/schema on them, full pixel checks are pytest-pinned:
    "sink_binary_export",
    "sink_binary_export_hires",
    "sink_binary_export_tiled",
    "udf_grouped_map_render",
    "src_binary_files",
]


# Never-driver-verified oracle keys, priority-ordered for the r4 window
# (≈46 slots after the changed keys): the §2-adjacent source/sink and
# llmprep families first, then statml/timeseries/iterative, streaming
# joins, and the scalar-function tail last (lowest driver risk — pure
# row-wise expressions with no shuffle). Keys not listed here sort after
# the listed ones in registration order.
_PENDING_PRIORITY = [
    # sources/sinks
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
