from apde_etl_spark.operators.profile import (
    categorical_freq,
    classify_columns,
    date_stats,
    distinct_counts,
    missingness_profile,
    numeric_stats,
    top_k_with_other,
)
from apde_etl_spark.operators.reshape import melt_long, template_complete

__all__ = [
    "classify_columns",
    "distinct_counts",
    "missingness_profile",
    "numeric_stats",
    "date_stats",
    "categorical_freq",
    "top_k_with_other",
    "melt_long",
    "template_complete",
]
