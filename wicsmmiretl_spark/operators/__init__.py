from wicsmmiretl_spark.operators.filters import RangeFilter, apply_filters, clamp_max
from wicsmmiretl_spark.operators.joins import (
    attach,
    keep_successes,
    drop_failures,
    asof_join,
    range_join,
)
from wicsmmiretl_spark.operators.aggregates import (
    column_stats,
    grouped_stats_matrix,
    null_count,
)
from wicsmmiretl_spark.operators.sampling import (
    deterministic_shuffle,
    deterministic_sample,
    train_test_split,
)
from wicsmmiretl_spark.operators.sets import union_checked

__all__ = [
    "RangeFilter",
    "apply_filters",
    "clamp_max",
    "attach",
    "keep_successes",
    "drop_failures",
    "asof_join",
    "range_join",
    "column_stats",
    "grouped_stats_matrix",
    "null_count",
    "deterministic_shuffle",
    "deterministic_sample",
    "train_test_split",
    "union_checked",
]
