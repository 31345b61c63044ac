from .joins import (
    equi_join,
    broadcast_join,
    semi_join,
    anti_join,
    cross_join,
    range_join,
    banded_range_join,
    asof_join,
    fuzzy_string_join,
    qgram_array,
    qgram_array_sql,
)
from .aggregates import (
    group_agg,
    rollup_agg,
    cube_agg,
    distinct_agg,
    approx_distinct,
    approx_quantiles,
    dedup_exact,
    collect_sorted,
)
from .windows import ranked, top_k_per_group, running, shifted, window_spec
from .setops import union_all, union_distinct, intersect, difference
from .sorts import sort, top_k
from .reshape import pivot_agg, unpivot_metrics, grouping_sets_agg
from .sampling import (
    hash_sample,
    hash_sample_sql,
    stratified_sample,
    weighted_sample_topn,
)
from .graph import connected_components, pagerank, triangle_counts
from .windows import sessionize, change_intervals
from .udfs import cogrouped_apply, cogrouped_apply_bucketed, position_tokens_udtf
from .timeseries import time_grid_fill
from .merge import merge_upsert
from .diagnostics import bucket_stats, drop_hot_buckets, join_size_stats, profile_table

__all__ = [
    "equi_join", "broadcast_join", "semi_join", "anti_join", "cross_join",
    "range_join", "banded_range_join", "asof_join",
    "fuzzy_string_join", "qgram_array", "qgram_array_sql",
    "group_agg", "rollup_agg", "cube_agg", "distinct_agg", "approx_distinct",
    "approx_quantiles", "dedup_exact", "collect_sorted",
    "ranked", "top_k_per_group", "running", "shifted", "window_spec",
    "union_all", "union_distinct", "intersect", "difference",
    "sort", "top_k",
    "pivot_agg", "unpivot_metrics", "grouping_sets_agg",
    "hash_sample", "hash_sample_sql", "stratified_sample", "weighted_sample_topn",
    "connected_components", "pagerank", "triangle_counts",
    "sessionize", "cogrouped_apply", "cogrouped_apply_bucketed",
    "change_intervals", "position_tokens_udtf", "time_grid_fill", "merge_upsert",
    "bucket_stats", "drop_hot_buckets", "join_size_stats", "profile_table",
]
