from apde_etl_spark.streaming.profile_stream import (
    windowed_categorical_freq,
    windowed_missingness,
)

__all__ = ["windowed_missingness", "windowed_categorical_freq"]
