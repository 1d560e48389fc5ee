"""Declarative data-quality expectations — the dbt-test / Delta-Live-
-Tables-expectations shape, run as ONE conditional-aggregate pass.

The reference's QA ethos (row-count checks `qa_load_row_count`, domain
conformance against CHI standards, all-missing detection) generalized to
a declarative runner: the caller states row predicates, uniqueness keys,
and referential targets; the engine folds every row predicate and every
uniqueness key into a single groupBy-less aggregate over one scan of the
table (conditional sums — map-side combined, no melt), and adds one
anti-join count per referential check. Output is the audit table
(check_name, n_violations, passed).

At 100 TB: N row checks cost exactly one table scan regardless of N;
each foreign-key check is a broadcast or shuffled anti-join on the key
column only (column-pruned scan of both sides).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """A row-level expectation: the row PASSES when ``predicate`` is
    TRUE; NULL and FALSE both count as violations (SQL three-valued
    logic made explicit, so a NULL in a checked column is a finding,
    not a silent pass)."""

    name: str
    predicate: Column


def expectations_report(
    df: DataFrame,
    row_checks: list[Expectation] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Run all expectations and return (check_name, n_violations, passed).

    - ``row_checks``: violation = rows where the predicate is not TRUE.
    - ``unique_keys``: {check_name: [cols]} — violations = count(*) -
      count(distinct cols): the number of surplus rows beyond one per
      key. Rows with a NULL key column are excluded from the distinct
      count and therefore surface as violations (a NULL "key" cannot
      claim a slot).
    - ``foreign_keys``: {check_name: (parent_df, child_col, parent_col)}
      — violations = child rows whose key has no parent (anti-join).

    All row + uniqueness checks share ONE aggregate over one scan; each
    foreign key adds one anti-join count. The result is a tiny frame
    (one row per check) unioned driver-free.

    Check names must be identifier-shaped (``[A-Za-z0-9_]+``): they pass
    through a generated ``stack`` expression, and rejecting exotic names
    up front beats an AnalysisException out of the SQL parser. An empty
    table reports 0 violations for every check (an empty-but-valid load
    passes its gate); calling with no checks at all raises."""
    import re as _re

    def _checked_name(n: str) -> str:
        if not _re.fullmatch(r"[A-Za-z0-9_]+", n):
            raise ValueError(
                f"expectations_report: check name {n!r} must match "
                "[A-Za-z0-9_]+ (it is interpolated into a stack() "
                "expression)"
            )
        return n

    if not (row_checks or unique_keys or foreign_keys):
        raise ValueError("expectations_report: no checks given")

    aggs: list[Column] = []
    names: list[str] = []
    for e in row_checks or []:
        aggs.append(
            # coalesce: sum over ZERO rows is NULL, but an empty table
            # has zero violations, not unknown ones
            F.coalesce(
                F.sum(F.when(e.predicate, 0).otherwise(1)), F.lit(0)
            ).cast("long").alias(_checked_name(e.name))
        )
        names.append(e.name)
    for name, cols in (unique_keys or {}).items():
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long")
            .alias(_checked_name(name))
        )
        names.append(name)
    for name in (foreign_keys or {}):
        _checked_name(name)
    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        parts.append(
            wide.selectExpr(
                f"stack({len(names)}, {stack}) AS (check_name, n_violations)"
            )
        )
    for name, (parent, child_col, parent_col) in (foreign_keys or {}).items():
        orphans = (
            df.select(F.col(child_col))
            .join(
                parent.select(F.col(parent_col).alias(child_col)),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
