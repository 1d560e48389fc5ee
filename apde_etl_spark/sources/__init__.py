from apde_etl_spark.sources.config import resolve_config
from apde_etl_spark.sources.readers import read_delimited, read_lake_file, schema_from_config

__all__ = ["read_delimited", "read_lake_file", "schema_from_config", "resolve_config"]
