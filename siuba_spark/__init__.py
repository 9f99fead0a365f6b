"""siuba_spark — a PySpark-native analytics engine with the query
capabilities of machow/siuba (dplyr-style pipeable verbs + lazy column
expressions), re-expressed Spark-first.

    from siuba_spark import _, tbl, group_by, summarize, collect

    tbl(spark, "/data/lineitem.parquet") \
        >> filter(_.l_shipdate <= "1998-09-02") \
        >> group_by(_.l_returnflag, _.l_linestatus) \
        >> summarize(sum_qty=_.l_quantity.sum()) \
        >> collect()

Everything lowers to DataFrame operations — Catalyst/Tungsten/AQE do the
planning; the engine adds only expression lowering, verb mapping, and
pandas/dplyr semantics shims (SURVEY.md §4).
"""

from .siu.calls import Lam, Lazy, Symbolic
from .siu.format import explain
from .functions.lowering import TranslationError
from .plans.tbl import (
    SparkTbl, tbl, collect, show_query, write_parquet, write_csv,
    write_shards, repartition, coalesce_partitions, cluster_by, cache,
    release_all_pins,
    lint_plan, pull, glimpse,
)
from .plans.pipe import Pipe, Pipeable, pipe, verb
from .operators.core import (
    select, rename, rename_with, relocate, mutate, transmute, filter, arrange, distinct, head, top_n,
    qcut, slice_head, slice_tail, slice_min, slice_max, slice_sample,
)
from .operators.grouping import (
    group_by, ungroup, summarize, summarise, reframe, count, add_count,
    tally, add_tally,
    sample_frac, sample_n, hash_split, corr_matrix, describe,
)
from .operators.across import across, Fx, Across, if_any, if_all
from .functions.udf import call, py_func, group_apply
from .operators.joins import (
    join, inner_join, left_join, right_join, full_join, semi_join, anti_join,
    asof_join, interval_join, salted_join,
    union, union_all, intersect, setdiff, cross_join, nest_join,
)
from .operators.rows import (
    rows_insert, rows_append, rows_update, rows_patch, rows_upsert,
    rows_delete,
)
from .operators.reshape import (
    uncount, pack, unpack, chop, unchop,
    gather, spread, separate, separate_rows, unite, extract, nest, unnest,
    unnest_longer, unnest_wider, hoist, expand, complete,
    separate_wider_delim, separate_wider_position, separate_wider_regex,
    separate_longer_delim, separate_longer_position,
    fill_na_directional as fill, drop_na, replace_na,
    pivot_longer, pivot_wider, bind_rows, one_hot, crosstab,
    build_longer_spec, pivot_longer_spec, build_wider_spec, pivot_wider_spec,
)
from .functions.vector import (
    row_number, min_rank, dense_rank, percent_rank, cume_dist, ntile,
    lead, lag, consecutive_id, n, n_distinct, approx_n_distinct, approx_quantile,
    nth, first, last, coalesce, na_if, between,
    if_else, case_when, case_match, sql_raw, symbolic_dispatch, desc, str_c,
    floor_date, ceil_date, json_extract,
    near, cut,
    rolling_mean, rolling_sum, rolling_min, rolling_max,
    rolling_std, rolling_var, rolling_median, rolling_count,
    cumall, cumany, cummean,
)
from .functions.forcats import (
    fct_lump, fct_recode, fct_collapse, fct_rev, fct_infreq, fct_inorder,
    fct_reorder,
)

_ = Symbolic()

__version__ = "0.1.0"

__all__ = [
    "_", "Symbolic", "SparkTbl", "tbl", "collect", "pull", "glimpse", "show_query",
    "release_all_pins",
    "write_parquet", "write_csv", "write_shards", "lint_plan", "Pipe", "Pipeable", "pipe", "verb", "TranslationError",
    "repartition", "coalesce_partitions", "cluster_by", "cache",
    "select", "rename", "rename_with", "relocate", "mutate", "transmute", "filter", "arrange",
    "distinct", "head", "top_n", "qcut",
    "slice_head", "slice_tail", "slice_min", "slice_max", "slice_sample",
    "group_by", "ungroup", "summarize", "summarise", "reframe", "count", "add_count",
    "tally", "add_tally",
    "sample_frac", "sample_n", "hash_split", "corr_matrix", "describe",
    "join", "inner_join", "left_join", "right_join", "full_join",
    "semi_join", "anti_join", "asof_join", "interval_join", "salted_join",
    "union", "union_all", "intersect", "setdiff", "cross_join", "nest_join", "across", "Fx", "if_any", "if_all", "call", "py_func", "group_apply",
    "rows_insert", "rows_append", "rows_update", "rows_patch", "rows_upsert", "rows_delete",
    "gather", "spread", "separate", "separate_rows", "unite", "extract",
    "nest", "unnest", "unnest_longer", "unnest_wider", "hoist",
    "fill", "drop_na", "replace_na",
    "separate_wider_delim", "separate_wider_position", "separate_wider_regex",
    "separate_longer_delim", "separate_longer_position",
    "expand", "complete", "pivot_longer", "pivot_wider", "bind_rows", "uncount", "pack", "unpack", "chop", "unchop",
    "one_hot", "crosstab",
    "build_longer_spec", "pivot_longer_spec", "build_wider_spec", "pivot_wider_spec",
    "row_number", "min_rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile", "lead", "lag", "consecutive_id", "n", "n_distinct", "approx_n_distinct",
    "approx_quantile", "nth", "first", "last",
    "coalesce", "na_if", "between", "near", "if_else", "case_when", "case_match", "sql_raw",
    "symbolic_dispatch", "Lam", "Lazy", "explain", "desc", "str_c", "cut",
    "floor_date", "ceil_date", "cumall", "cumany", "cummean", "json_extract",
    "rolling_mean", "rolling_sum", "rolling_min", "rolling_max",
    "rolling_std", "rolling_var", "rolling_median", "rolling_count",
    "fct_lump", "fct_recode", "fct_collapse", "fct_rev", "fct_infreq",
    "fct_inorder", "fct_reorder",
]
