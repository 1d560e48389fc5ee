"""Custom connector via the Python Data Source API (Spark 4).

The reference's "function-sourced dataset" (SURVEY.md §2.1 S8:
``getFromNamespace(function_name, 'apde.data')(year, cols, ...)``,
R/etl_qa_run_pipeline.R:856-861) dispatches to a named data-access
function at plan time. The Spark-native modernization is a *registered
data source*: ``spark.read.format("apde_synthetic_events")`` with
options, planned and executed like any other source — partitioned
parallel reads on executors, not a driver-side materialization.

The shipped source generates deterministic synthetic events from a
content hash of the row index, so an independent engine can reproduce
every row from the same formula — which is exactly how the DuckDB
oracle checks it (``catalog_r2.pyds_synthetic_events_agg``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

#: event-type alphabet, indexed by hash byte
EVENT_TYPES = ("view", "purchase", "signup", "error")


def synth_row(i: int) -> tuple[int, str, int, float]:
    """Deterministic row derivation shared (by formula) with the oracle:
    every field is arithmetic on the md5 hex digest of the row index.
    value_cents stays integral so cross-engine sums are exact."""
    import hashlib

    h = hashlib.md5(str(i).encode()).hexdigest()
    etype = EVENT_TYPES[int(h[:2], 16) % len(EVENT_TYPES)]
    cents = int(h[2:10], 16) % 10000
    return (i, etype, cents, cents / 100.0)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        super().__init__((start, end))
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("partitions", "8"))

    def partitions(self) -> Sequence[InputPartition]:
        # contiguous row ranges — each executor task generates its slice
        # independently; no driver materialization, no shuffle
        n, parts = self.rows, max(1, self.num_partitions)
        step = -(-n // parts)
        return [
            _RangePartition(lo, min(lo + step, n)) for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("apde_synthetic_events")``
    ``.option("rows", N).option("partitions", P).load()``"""

    @classmethod
    def name(cls) -> str:
        return "apde_synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, event_type string, value_cents bigint, value double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are plain row indices,
    each micro-batch emits the next ``batch_rows`` rows of the identical
    deterministic sequence (so the streamed table content equals the
    batch read — the unified-API oracle). ``readBetweenOffsets`` replays
    a committed range exactly, which is what checkpoint recovery
    requires of a source."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batchRows", "250"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.batch_rows, self.rows)
        return iter([synth_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["index"], end["index"])])


def register_synthetic_source(spark) -> None:
    """Idempotent registration (the session keeps a name -> class map)."""
    spark.dataSource.register(SyntheticEventsDataSource)
