"""Spark 4 Python DataSource exposing the versioned table format as a
first-class reader: ``spark.read.format("vtable").load(path)`` with
``version`` / ``asOfTimestampMs`` options for time travel — the same
snapshot resolution as :meth:`VersionedTable.read`, but usable from
pure SQL (``CREATE TEMPORARY VIEW ... USING vtable``) and from any
session that only knows the format name.

Scale/robustness notes:

- Snapshot resolution (log replay) happens ONCE on the driver in
  :meth:`partitions`; executors receive a plain file list — one input
  partition per immutable data file, so parallelism tracks file count
  exactly like the native reader.
- Batches flow through Arrow (``iter_batches`` → Spark's Arrow path),
  never per-row Python objects.
- Evolved schemas: files written before a column existed are conformed
  batch-by-batch with NULL arrays — same semantics as the native
  explicit-schema parquet scan.
- This reader trades the JVM parquet scan's codegen for format-name
  ergonomics; pipelines on the hot path should keep using
  ``VersionedTable.read``. The value here is interop (SQL-only
  clients, catalogs listing a format name), not raw throughput.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from pandas_rust_algos_spark.sources.table_format import VersionedTable

__all__ = ["VTableDataSource", "register_vtable_source"]


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _resolve(options) -> tuple[VersionedTable, int | None, int | None]:
    path = options.get("path")
    if not path:
        raise ValueError("vtable reader requires a path")
    version = options.get("version")
    as_of = options.get("asoftimestampms")
    return (
        VersionedTable(spark=None, path=path),
        int(version) if version is not None else None,
        int(as_of) if as_of is not None else None,
    )


class VTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vtable"

    def schema(self):
        tbl, version, as_of = _resolve(self.options)
        snap = tbl._snapshot(version, as_of)
        committed = tbl.table_schema(snap.version)
        if committed is not None:
            return committed
        # pre-schema-tracking table: derive from one footer
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        first = sorted(snap.files)[0]
        return from_arrow_schema(
            pq.ParquetFile(os.path.join(tbl.path, first)).schema_arrow
        )

    def reader(self, schema: StructType) -> "VTableReader":
        return VTableReader(self.options, schema)


class VTableReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self.options = options
        self.schema = schema

    def partitions(self):
        tbl, version, as_of = _resolve(self.options)
        snap = tbl._snapshot(version, as_of)
        return [
            _FilePartition(os.path.join(tbl.path, rel))
            for rel in sorted(snap.files)
        ]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        want = [f.name for f in target]
        present = [n for n in want if n in have]
        for batch in pf.iter_batches(columns=present):
            cols = []
            for field in target:
                if field.name in have:
                    col = batch.column(batch.schema.get_field_index(field.name))
                    if col.type != field.type:
                        col = col.cast(field.type)
                else:
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
                    continue
                cols.append(col)
            yield pa.RecordBatch.from_arrays(cols, schema=target)


def register_vtable_source(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(VTableDataSource)
