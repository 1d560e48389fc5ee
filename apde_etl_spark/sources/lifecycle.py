"""Table-lifecycle operations (SURVEY.md §2.1 S3/S5/S9, §2.5 A9, §3.2/3.3).

The reference manages SQL Server tables: existence probes, CREATE TABLE
synthesis from INFORMATION_SCHEMA, cross-server duplication via BCP,
truncate-and-reload, row-count QA. On Spark these become catalog calls,
``schema.toDDL()``, and DataFrame writes; the drop-index/re-add dance
around bulk loads is replaced by partitioning choices at write time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_exists(spark: SparkSession, name: str) -> bool:
    """S3 — existence probe (dbExistsTable, etl_qa_run_pipeline.R:879-884)."""
    return spark.catalog.tableExists(name)


def synthesize_ddl(df: DataFrame, name: str) -> str:
    """S5 — DDL synthesis. The reference reads INFORMATION_SCHEMA.COLUMNS
    and CONCATs a column list (table_duplicate.R:281-309,
    external_table_check.R:48-72); Spark's schema carries the same
    information natively."""
    return f"CREATE TABLE {name} ({df.schema.toDDL()}) USING parquet"


@dataclass
class SchemaDiff:
    missing_in_target: list[str]
    extra_in_target: list[str]
    type_mismatches: list[tuple[str, str, str]]

    @property
    def identical(self) -> bool:
        return not (self.missing_in_target or self.extra_in_target or self.type_mismatches)


def compare_schemas(source: DataFrame, target: DataFrame) -> SchemaDiff:
    """Structure comparison used before duplicate/overwrite decisions
    (table_duplicate.R:236-243 pulls both tables and dplyr::all_equal's
    them; comparing schemas avoids moving data)."""
    s = {f.name: f.dataType.simpleString() for f in source.schema.fields}
    t = {f.name: f.dataType.simpleString() for f in target.schema.fields}
    return SchemaDiff(
        missing_in_target=sorted(set(s) - set(t)),
        extra_in_target=sorted(set(t) - set(s)),
        type_mismatches=sorted((c, s[c], t[c]) for c in set(s) & set(t) if s[c] != t[c]),
    )


def duplicate_table(
    spark: SparkSession,
    source: DataFrame,
    dest: str,
    structure_only: bool = False,
    confirm: bool = True,
) -> None:
    """S9/§3.3 — table duplication. The reference round-trips
    server -> R -> TSV -> bcp -> server with all columns cast to character
    (table_duplicate.R:318); a distributed writer needs neither the
    string cast nor 50k-row chunking."""
    df = source.limit(0) if structure_only else source
    df.write.mode("overwrite").saveAsTable(dest)


def row_count_check(a: DataFrame, b: DataFrame) -> tuple[bool, int, int]:
    """A9 — COUNT(*) equality QA between archive and stage
    (load_table_from_sql.R:327-336)."""
    ca, cb = a.count(), b.count()
    return ca == cb, ca, cb


def date_split_reload(
    archive: DataFrame, new: DataFrame, date_col: str, cutpoint=None
) -> DataFrame:
    """U2/A12 — date-split reload: ``archive WHERE d < cut UNION new WHERE
    d >= cut`` with UNION dedup semantics (load_table_from_sql.R:274-276,
    383-393). ``cutpoint=None`` auto-derives MAX(date) from the archive
    (A12) — rows after the archive's high-water mark come from ``new``."""
    if cutpoint is None:
        cutpoint = archive.agg(F.max(date_col)).first()[0]
    merged = archive.filter(F.col(date_col) < F.lit(cutpoint)).unionByName(
        new.filter(F.col(date_col) >= F.lit(cutpoint))
    )
    return merged.distinct()
