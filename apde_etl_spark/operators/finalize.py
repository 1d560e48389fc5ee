"""Final-results layer (SURVEY.md §3.1 step 4; reference
``etl_qa_final_results``, R/etl_qa_run_pipeline.R:1527-1650).

Takes the initial profile tables and produces the reference's exported
contracts:

- ``missingness(time_period, varname, nrow, proportion, abs_change)``
- ``values(time_period, vartype, varname, value, mean, median, min, max,
  median_date, min_date, max_date, count, proportion,
  abs_proportion_change, rel_mean_change, rel_median_change)``

All inputs here are *already aggregated* (rows ~= years x varnames
[x top-9 values]) — driver-scale data, so window functions over tiny
partitions and broadcast template joins are free regardless of raw size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import change_flag_abs, change_flag_rel, null_scrub, round_half_away


def complete_grid(actuals: DataFrame, fill_zero: dict[str, object] | None = None,
                  value_dim: bool = False) -> DataFrame:
    """Dense (time_period x varname [x value]) completion
    (CJ(...) :1578-1582,1608-1612; SURVEY §2.10.7: the value dimension
    expands only (varname, value) pairs observed in *some* period).
    """
    # actuals feeds THREE subtrees (times, dims, the join probe); without
    # a cache boundary each one re-computes the whole upstream
    # aggregation — 3 base-table scans instead of 1. The frame is tiny
    # (already aggregated), so persisting is O(years x varnames).
    actuals = actuals.persist()
    times = actuals.select("time_period").distinct()
    if value_dim:
        dims = actuals.select("varname", "value").distinct()
    else:
        dims = actuals.select("varname").distinct()
    grid = times.crossJoin(dims)
    keys = grid.columns
    out = grid.join(actuals, on=keys, how="left")
    for c, v in (fill_zero or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def finalize_missingness(miss: DataFrame, abs_threshold: float = 3.0,
                         digits_prop: int = 3) -> DataFrame:
    """Template-complete, add lag-1 abs_change flag (:1535-1539), round."""
    dense = complete_grid(miss, fill_zero={"nrow": 0, "proportion": 0.0})
    w = Window.partitionBy("varname").orderBy("time_period")
    out = dense.withColumn(
        "abs_change",
        change_flag_abs(F.col("proportion"), F.lag("proportion").over(w), abs_threshold),
    )
    return out.select(
        "time_period", "varname", F.col("nrow").cast("long").alias("nrow"),
        round_half_away(null_scrub("proportion"), digits_prop).alias("proportion"),
        "abs_change",
    ).orderBy("varname", "time_period")


def finalize_continuous(stats: DataFrame, rel_threshold: float = 10.0,
                        digits_mean: int = 2) -> DataFrame:
    """Rel-change flags on mean and median (:1585-1596), half-away
    rounding (:1597-1600), NaN/Inf scrub (:1641-1642)."""
    w = Window.partitionBy("varname").orderBy("time_period")
    out = (
        stats
        .withColumn("rel_mean_change",
                    change_flag_rel(F.col("mean"), F.lag("mean").over(w), rel_threshold))
        .withColumn("rel_median_change",
                    change_flag_rel(F.col("median"), F.lag("median").over(w), rel_threshold))
    )
    for c in ("mean", "median", "min", "max"):
        out = out.withColumn(c, round_half_away(null_scrub(c), digits_mean))
    return out


def finalize_categorical(freq_top: DataFrame, abs_threshold: float = 3.0,
                         digits_prop: int = 3) -> DataFrame:
    """Per (varname, value) completion across periods with zero-fill, then
    abs-proportion-change flags over time (:1549-1568)."""
    dense = complete_grid(freq_top, fill_zero={"count": 0, "proportion": 0.0}, value_dim=True)
    w = Window.partitionBy("varname", "value").orderBy("time_period")
    out = dense.withColumn(
        "abs_proportion_change",
        change_flag_abs(F.col("proportion"), F.lag("proportion").over(w), abs_threshold),
    )
    return out.select(
        "time_period", "varname", "value", F.col("count").cast("long").alias("count"),
        round_half_away(null_scrub("proportion"), digits_prop).alias("proportion"),
        "abs_proportion_change",
    )


def stack_values(categorical: DataFrame | None, continuous: DataFrame | None,
                 date: DataFrame | None) -> DataFrame:
    """U3 — stack the three profile tables into one ``values`` relation
    with a ``vartype`` tag, padding absent columns with NULL
    (rbindlist fill=TRUE, :1625-1636) via unionByName."""
    parts = []
    if categorical is not None:
        parts.append(categorical.withColumn("vartype", F.lit("Categorical")))
    if continuous is not None:
        parts.append(continuous.withColumn("vartype", F.lit("Continuous")))
    if date is not None:
        parts.append(date.withColumn("vartype", F.lit("Date")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def all_missing_vars(miss: DataFrame) -> DataFrame:
    """A11 — varnames 100% missing in every period -> exclusion list
    (:1724-1731)."""
    return (
        miss.groupBy("varname")
        .agg(F.min("proportion").alias("_minp"))
        .filter(F.col("_minp") >= 1.0)
        .select("varname")
    )


def check_standards(observed: DataFrame, standard: DataFrame) -> DataFrame:
    """J8 — the chi_standards conformance table: indicator full-outer join
    of the observed (varname, group) domain against the standard domain,
    0/1 presence flags, ``problem='*'`` on any one-sided row
    (R/etl_qa_run_pipeline.R:766-801, 951-982, 1620-1622).

    ``observed``/``standard``: (varname, group) relations; both sides are
    distinct'd here. The standard side is a tiny dimension — broadcast.
    """
    ob = observed.select("varname", "group").distinct().alias("ob")
    st = standard.select("varname", "group").distinct().alias("st")
    j = ob.join(
        F.broadcast(st),
        (F.col("ob.varname") == F.col("st.varname"))
        & (F.col("ob.group").eqNullSafe(F.col("st.group"))),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("ob.varname"), F.col("st.varname")).alias("varname"),
        F.coalesce(F.col("ob.group"), F.col("st.group")).alias("group"),
        F.when(F.col("ob.varname").isNull(), 0).otherwise(1).alias("your_data"),
        F.when(F.col("st.varname").isNull(), 0).otherwise(1).alias("chi"),
        F.when(
            F.col("ob.varname").isNull() | F.col("st.varname").isNull(), F.lit("*")
        ).otherwise(F.lit(None).cast("string")).alias("problem"),
    )
