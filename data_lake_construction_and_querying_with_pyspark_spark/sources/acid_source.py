"""Spark Python Data Source for the ACID transactional table
(:mod:`..acid`) — Spark 4's ``pyspark.sql.datasource`` API, so the
table is readable as a first-class format::

    spark.dataSource.register(AcidTableDataSource)
    spark.read.format("acid_table").option("path", root).load()
    spark.readStream.format("acid_table").option("path", root).load()

Batch read scans the current snapshot (one input partition per live
data file — Spark parallelizes across them like any file source).

The STREAMING read turns the commit log into an exactly-once
micro-batch source: offsets ARE commit versions, each trigger covers
the commit range ``(start, end]``, and every append commit's files are
emitted exactly once. This is the idiomatic lakehouse pattern (the
Delta streaming-source design): the transaction log already totally
orders commits, so no extra bookkeeping is needed — a crash replays
from the checkpointed version, and file immutability makes the replay
identical.

Rewrite commits (merge / delete / update / overwrite / compact) are
NOT expressible as pure appends; by default the stream RAISES when it
meets one (fail-loud, like Delta without ``ignoreChanges``). With
``.option("ignore_changes", "true")`` rewrite commits are skipped
entirely — appends-only tailing — which is exact for tables whose
rewrites only remove or reorganize rows already emitted (dedup
compaction, retention deletes). Row-accurate CDC for rewrites is
``TransactionalTable.changes()``.

Executor-side ``read`` goes straight to pyarrow: files whose columns
match the committed schema stream as Arrow record batches (zero-copy
into Spark); files predating a schema evolution fall back to row
tuples with NULLs for the missing columns.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from data_lake_construction_and_querying_with_pyspark_spark.acid import (
    _PAD,
    LOG_DIR,
    TransactionalTable,
)


@dataclass
class _FilePartition(InputPartition):
    path: str  # absolute parquet path
    columns: tuple  # committed schema field names, in order


def _read_file(partition: _FilePartition):
    import pyarrow.parquet as pq

    table = pq.read_table(partition.path)
    names = list(partition.columns)
    if set(table.column_names) >= set(names):
        # fast path: Arrow batches, columns pruned + reordered to schema
        yield from table.select(names).to_batches()
        return
    # pre-evolution file: tuple fallback with NULLs for missing columns
    for row in table.to_pylist():
        yield tuple(row.get(n) for n in names)


def _table_schema(root: str) -> StructType:
    snap = TransactionalTable(root).snapshot()
    if snap.schema is None:
        raise ValueError(
            f"acid_table at {root!r} has no committed schema "
            "(empty table, or written by a pre-schema version) — "
            "append through the TransactionalTable API first"
        )
    return StructType.fromJson(snap.schema)


class _AcidBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.columns = tuple(schema.fieldNames())
        self._prune: dict = {}
        self._prune_eq: dict = {}

    def pushFilters(self, filters):
        """Translate pushed comparison filters into log-level file
        skipping: equalities feed the bloom + stats point check,
        range comparisons tighten per-column [lo, hi] intervals
        (inclusive bounds even for strict comparisons — pruning must
        stay a SUPERSET). Every filter is returned as a residual:
        Spark still applies it row-level, exactly as parquet's own
        row-group pruning composes with post-scan filters — so a
        plain ``df.filter("k = 202")`` on ``format("acid_table")``
        never opens files whose bloom proves 202 absent, with zero
        API surface for the user to hold."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        def tighten(col, lo=None, hi=None):
            cur_lo, cur_hi = self._prune.get(col, (None, None))
            if lo is not None and (cur_lo is None or lo > cur_lo):
                cur_lo = lo
            if hi is not None and (cur_hi is None or hi < cur_hi):
                cur_hi = hi
            self._prune[col] = (cur_lo, cur_hi)

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col, val = attr[0], getattr(f, "value", None)
            if val is None:
                continue
            if isinstance(f, EqualTo):
                self._prune_eq[col] = val
                tighten(col, lo=val, hi=val)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                tighten(col, lo=val)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                tighten(col, hi=val)
        return iter(filters)  # all residual: row-level truth is Spark's

    def partitions(self):
        from data_lake_construction_and_querying_with_pyspark_spark.acid import (
            _file_may_match,
        )

        snap = TransactionalTable(self.root).snapshot()
        return [
            _FilePartition(os.path.join(self.root, f), self.columns)
            for f in snap.files
            if _file_may_match(snap.meta.get(f), self._prune, self._prune_eq)
        ]

    def read(self, partition):
        yield from _read_file(partition)


class _AcidStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType, options: dict):
        self.root = root
        self.columns = tuple(schema.fieldNames())
        self.start_version = int(options.get("starting_version", 0))
        self.ignore_changes = str(options.get("ignore_changes", "false")).lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": TransactionalTable(self.root).snapshot().version}

    def partitions(self, start: dict, end: dict):
        log_path = os.path.join(self.root, LOG_DIR)
        parts = []
        for v in range(start["version"] + 1, end["version"] + 1):
            entry_path = os.path.join(log_path, f"{v:0{_PAD}d}.json")
            if not os.path.exists(entry_path):
                continue
            with open(entry_path) as fh:
                entry = json.load(fh)
            if entry.get("remove"):
                if self.ignore_changes:
                    continue
                op = entry.get("op", {}).get("op", "?")
                raise ValueError(
                    f"acid_table stream hit a rewrite commit (version {v}, "
                    f"op={op!r}); pass .option('ignore_changes', 'true') to "
                    "skip rewrites, or consume TransactionalTable.changes() "
                    "for row-accurate CDC"
                )
            parts.extend(
                _FilePartition(os.path.join(self.root, a["file"]), self.columns)
                for a in entry.get("add", [])
                if a.get("rows")
            )
        # a trigger with no new files still needs ≥0 partitions; Spark
        # handles an empty list as an empty micro-batch
        return parts

    def read(self, partition):
        yield from _read_file(partition)

    def commit(self, end: dict) -> None:
        # the streaming checkpoint owns progress; nothing to persist here
        pass


class AcidTableDataSource(DataSource):
    """``format("acid_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "acid_table"

    def schema(self) -> StructType:
        return _table_schema(self.options["path"])

    def reader(self, schema: StructType) -> DataSourceReader:
        return _AcidBatchReader(self.options["path"], schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _AcidStreamReader(self.options["path"], schema, dict(self.options))


def register_acid_source(spark) -> None:
    """Idempotent registration of the ``acid_table`` format. Also
    enables Python-data-source filter pushdown (a runtime SQL conf,
    off by default in Spark 4.1) so ``pushFilters`` participates —
    without it Spark REFUSES to plan a reader that implements the
    hook."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AcidTableDataSource)
