from apde_etl_spark.functions.core import (
    change_flag_abs,
    change_flag_rel,
    null_scrub,
    round_half_away,
)

__all__ = ["round_half_away", "change_flag_abs", "change_flag_rel", "null_scrub"]
