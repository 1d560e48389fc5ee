"""apde_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the PHSKC-APDE/apde.etl R package.

The reference (an R + generated-T-SQL ETL/QA toolkit) is re-expressed here
as idiomatic Spark DataFrame programs: declarative plans that Catalyst
optimizes (predicate pushdown, column pruning, broadcast joins) instead of
hand-generated SQL text. See SURVEY.md for the operator-by-operator map.

Layout
------
- ``functions``  : scalar column helpers (rounding, change flags, text).
- ``operators``  : relational building blocks (profile aggregations,
                   reshape, dedup, similarity).
- ``plans``      : end-to-end pipelines (the QA profiling pipeline).
- ``sources``    : readers/writers + config hierarchy resolution.
- ``streaming``  : Structured Streaming wrappers (extension, not a port).
"""

__version__ = "0.1.0"
