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

# Keys already hash-verified by the driver in round 1 (CORRECTNESS_r01.json).
# The driver checks a bounded prefix of `queries()`, so keys NOT yet
# driver-verified are emitted first; these proven keys go to the back.
# (`agg_approx_distinct` had a row but only `no_oracle`; its contract gained
# an oracle this round, so it is deliberately left OUT of this set to be
# re-checked inside the window.)
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


# Keys whose implementation CHANGED this round (new or rewritten): these are
# the ones whose prior verification status is stale, so they lead the window.
_CHANGED_THIS_ROUND = [
    "agg_approx_distinct",
    "ns_sim_ann_lsh",
    "ns_dedup_embed_cosine",
    "ns_dedup_simhash",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_minhash",
    "ns_dedup_cluster",
    "ns_text_clean",
    "gen_poster_param",
    "gen_poster_shadow",
    "proj_resample_bilinear",
    "sort_composite_order",
    "sink_display",
    "filt_mask_apply",
    "ns_dedup_exact",
    "agg_sketch_hll_merge",
    "agg_sketch_kll_quantile",
    "join_q3_shipping_priority",
    "join_q5_region_volume",
    "ns_pack_sequences",
    "ns_split_train_val",
    "win_sessionize_gaps",
    "win_funnel_conversion",
    "agg_cohort_retention",
    "src_orc_roundtrip",
    "set_intersect_all",
    "set_except_all",
    "win_cume_dist",
    "agg_conditional",
    "fn_bitwise_ops",
    "join_interval_bucketed",
    "ns_decontaminate",
    "ns_pipeline_e2e",
    # rows-only keys that changed/appeared this round (driver can still
    # catch errors + row-count/schema drift on them):
    "gen_poster_full",
    "sink_binary_export",
    "sink_binary_export_hires",
    "ns_mm_resize",
    "ns_mm_frame_sample",
]


def _ordered_keys() -> list[str]:
    """Registry keys ordered for the driver's bounded correctness window:
    changed-this-round keys with an oracle first (stale verification AND
    strong signal), then driver-unverified oracle keys, then changed
    rows-only keys (error/row-count signal only), then unverified rows-only
    keys, then round-1-proven keys (registration order within groups)."""
    changed = [k for k in _CHANGED_THIS_ROUND if k in REGISTRY]
    changed_set = set(changed)
    changed_oracle = [k for k in changed if REGISTRY[k].oracle is not None]
    changed_rows_only = [k for k in changed if REGISTRY[k].oracle is None]
    rest = [k for k in REGISTRY if k not in changed_set]
    pending_oracle = [
        k for k in rest
        if k not in _R01_VERIFIED and REGISTRY[k].oracle is not None
    ]
    pending_rows_only = [
        k for k in rest
        if k not in _R01_VERIFIED and REGISTRY[k].oracle is None
    ]
    proven = [k for k in rest if k in _R01_VERIFIED]
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
