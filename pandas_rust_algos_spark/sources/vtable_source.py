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

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from pandas_rust_algos_spark.sources.table_format import VersionedTable

__all__ = ["VTableDataSource", "VTableArrowWriter", "VTableStreamReader",
           "register_vtable_source"]


class _FilePartition(InputPartition):
    def __init__(self, path: str, dv: list[int] | None = None) -> None:
        self.path = path
        #: merge-on-read deletion vector: absolute row positions within
        #: this file (over ALL row groups) that are tombstoned
        self.dv = dv


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

    def writer(self, schema: StructType, overwrite: bool):
        return VTableArrowWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType) -> "VTableStreamReader":
        return VTableStreamReader(self.options, schema)


class VTableReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self.options = options
        self.schema = schema
        self._pushed: list = []

    def pushFilters(self, filters):
        """Stats-based file skipping: comparison filters on columns
        with committed footer min/max stats prune whole files in
        :meth:`partitions` — the DataSource face of the same pruning
        the table's MERGE/DELETE use. Every filter is also returned as
        residual (Spark re-applies it row-level), so pruning can only
        skip files the stats PROVE empty — never wrong, only faster."""
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual,
            LessThan, LessThanOrEqual,
        )

        supported = (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual)
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1:
                self._pushed.append(f)
            yield f  # all filters stay residual — see docstring

    @staticmethod
    def _excluded(stats: dict, f) -> bool:
        """True iff the file's stats prove NO row can match the filter
        (missing stats → cannot exclude): [min, max] interval logic for
        comparisons, plus a Bloom-filter probe for EqualTo on columns
        that committed one — the point-lookup path where a
        high-cardinality key's range stats prune nothing."""
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual,
            LessThan, LessThanOrEqual,
        )

        from pandas_rust_algos_spark.sources.table_format import (
            bloom_might_contain,
        )

        s = stats.get(f.attribute[0])
        if not s:
            return False
        v = f.value
        # Trust a bloom miss only for int/str probe values: those are
        # the types whose str() canonical form provably agrees between
        # the write path (pyarrow to_pylist) and this Spark-pushed
        # value (write side now validates too; this guards legacy
        # tables written before that check). Other types fall through
        # to min/max, where a wrong answer is impossible.
        if isinstance(f, EqualTo) and "bloom" in s \
                and isinstance(v, (int, str)) \
                and not bloom_might_contain(s["bloom"], v):
            return True
        lo, hi = s.get("min"), s.get("max")
        if lo is None or hi is None:
            return False
        try:
            if isinstance(f, EqualTo):
                return v < lo or v > hi
            if isinstance(f, GreaterThan):
                return hi <= v
            if isinstance(f, GreaterThanOrEqual):
                return hi < v
            if isinstance(f, LessThan):
                return lo >= v
            if isinstance(f, LessThanOrEqual):
                return lo > v
        except TypeError:  # incomparable types: never exclude
            return False
        return False

    def partitions(self):
        tbl, version, as_of = _resolve(self.options)
        snap = tbl._snapshot(version, as_of)
        return [
            _FilePartition(os.path.join(tbl.path, rel),
                           snap.dvs.get(rel))
            for rel, action in sorted(snap.files.items())
            if not any(
                self._excluded(action.get("stats", {}), f)
                for f in self._pushed
            )
        ]

    def _surviving_row_groups(self, pf) -> list[int] | None:
        """Second pruning tier, applied executor-side per file: the
        same interval exclusion as :meth:`partitions`, but against each
        ROW GROUP's footer min/max — a fat file whose range spans a
        point filter still skips all but the matching stripes. Returns
        None when nothing was pushed (read everything, no stats walk)."""
        if not self._pushed:
            return None
        meta = pf.metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}
        wanted = {f.attribute[0] for f in self._pushed}
        keep = []
        for rg in range(meta.num_row_groups):
            stats: dict[str, dict] = {}
            for name in wanted:
                if name not in idx:
                    continue
                s = meta.row_group(rg).column(idx[name]).statistics
                if s is not None and s.has_min_max:
                    stats[name] = {"min": s.min, "max": s.max}
            if not any(self._excluded(stats, f) for f in self._pushed):
                keep.append(rg)
        return keep

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        import numpy as np

        target = to_arrow_schema(self.schema)
        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        want = [f.name for f in target]
        present = [n for n in want if n in have]
        row_groups = self._surviving_row_groups(pf)
        if row_groups == []:
            return
        meta = pf.metadata
        if row_groups is None:
            row_groups = list(range(meta.num_row_groups))
        # absolute start offset of each row group within the FILE —
        # deletion-vector positions are file-absolute (they come from
        # Spark's _metadata.row_index), so with row-group pruning the
        # skipped groups' rows must still count toward offsets
        starts = [0] * meta.num_row_groups
        for i in range(1, meta.num_row_groups):
            starts[i] = starts[i - 1] + meta.row_group(i - 1).num_rows
        dv = np.asarray(sorted(partition.dv), dtype=np.int64) \
            if partition.dv else None
        for rg in row_groups:
            offset = starts[rg]
            for batch in pf.iter_batches(columns=present, row_groups=[rg]):
                if dv is not None:
                    pos = np.arange(offset, offset + batch.num_rows)
                    keep = ~np.isin(pos, dv)
                    if not keep.all():
                        batch = batch.filter(pa.array(keep))
                offset += len(pos) if dv is not None else batch.num_rows
                if batch.num_rows == 0:
                    continue
                cols = []
                for field in target:
                    if field.name in have:
                        col = batch.column(
                            batch.schema.get_field_index(field.name))
                        if col.type != field.type:
                            col = col.cast(field.type)
                    else:
                        cols.append(
                            pa.nulls(batch.num_rows, type=field.type))
                        continue
                    cols.append(col)
                yield pa.RecordBatch.from_arrays(cols, schema=target)


def register_vtable_source(spark) -> None:
    """Idempotently register the format with a session. Python-side
    filter pushdown is opt-in in Spark 4 — a reader that implements
    ``pushFilters`` FAILS planning with the flag off, so registration
    enables it (runtime-settable SQL conf, no restart)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VTableDataSource)


# ------------------------------------------------------------- writer


class _AddMessage(WriterCommitMessage):
    def __init__(self, adds: list, rels: list) -> None:
        self.adds = adds
        self.rels = rels


class VTableArrowWriter(DataSourceArrowWriter):
    """Atomic multi-task writes through the format face:
    ``df.write.format("vtable").mode("append"|"overwrite").save(path)``.

    Each task streams its Arrow batches into ONE immutable parquet
    file under ``data/`` and returns the add-action (footer stats
    included) as its commit message; the DRIVER then claims a single
    commit in the table's action log — the same all-or-nothing
    contract as the native write path, now speaking Spark's
    DataSourceWriter protocol (task retries write orphan files that
    the commit never references and VACUUM later removes; ``abort``
    deletes them eagerly)."""

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vtable writer requires a path")
        kc = options.get("keycols")
        self.key_cols = [c.strip() for c in kc.split(",")] if kc else []
        bc = options.get("bloomcols")
        self.bloom_cols = [c.strip() for c in bc.split(",")] if bc else []
        self.merge_schema = (
            str(options.get("mergeschema", "false")).lower() == "true"
        )
        self.schema = schema
        self.overwrite = overwrite
        self.token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _AddMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pandas_rust_algos_spark.sources.table_format import (
            _DATA_DIR, file_add_action,
        )

        batches = list(iterator)
        if not batches or sum(b.num_rows for b in batches) == 0:
            return _AddMessage([], [])
        out_dir = os.path.join(self.path, _DATA_DIR, self.token)
        os.makedirs(out_dir, exist_ok=True)
        fpath = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches), fpath)
        add = file_add_action(self.path, fpath, self.key_cols,
                              self.bloom_cols)
        return _AddMessage([add], [add["path"]])

    def _table(self) -> VersionedTable:
        return VersionedTable(spark=None, path=self.path,
                              key_cols=self.key_cols,
                              bloom_cols=self.bloom_cols)

    def commit(self, messages) -> None:
        tbl = self._table()
        adds = [a for m in messages if m is not None for a in m.adds]
        existing = tbl.latest_version()
        if existing is None:
            tbl._commit("create", adds, [], None,
                        schema_json=self.schema.json())
            return
        if self.overwrite:
            snap = tbl._snapshot()
            tbl._commit("overwrite", adds, list(snap.files), snap.version,
                        schema_json=self.schema.json())
        else:
            schema_json = tbl._evolved_schema(self.schema, self.merge_schema)
            tbl._commit("append", adds, [], None, schema_json=schema_json)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for rel in m.rels:
                try:
                    os.unlink(os.path.join(self.path, rel))
                except OSError:
                    pass


# ------------------------------------------------------ stream reader


class VTableStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("vtable")`` — the table's commit log
    AS a streaming source (the lakehouse pattern that lets one table
    serve batch backfills and incremental tails from the same storage).

    Offsets are log versions: ``{"version": N}`` = "everything through
    commit N is processed", so recovery replays exact version ranges —
    deterministic offsets ⇒ exactly-once into checkpointed sinks.
    APPEND-ONLY by contract: a merge/overwrite/delete inside the read
    range raises (rewritten files would re-emit survivors as phantom
    inserts); ``ignoreChanges=true`` opts into Delta-style relaxed
    semantics (emit rewritten files' rows, caller dedups downstream).

    This is the *Simple* (driver-read) protocol — rows flow through
    the driver per micro-batch, the right trade for commit-sized
    increments. A partition-parallel ``DataSourceStreamReader`` is the
    drop-in upgrade path if single commits reach executor scale.

    Retention contract: replaying offsets past VACUUMed history FAILS
    loudly (missing data file) rather than emitting a partial batch —
    size ``vacuum(retain_last=...)`` to cover the longest checkpoint
    gap any consumer can have (pinned in
    tests/test_table_format.py::test_vacuum_breaks_stream_replay_loudly).
    """

    def __init__(self, options, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vtable stream reader requires a path")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        # startingVersion = first commit the stream INCLUDES. The
        # backfill+tail pattern: batch-read the snapshot at version V,
        # then stream with startingVersion=V+1 — batch ∪ stream covers
        # the table exactly once for an append-only history.
        self.starting_version = int(options.get("startingversion", 0))
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def _tbl(self) -> VersionedTable:
        return VersionedTable(spark=None, path=self.path)

    def _rows_between(self, v_from: int, v_to: int) -> list:
        """All rows added by commits in (v_from, v_to], conformed to
        the reader schema (pre-evolution files yield NULL for new
        columns), in deterministic (version, path, row) order. Returns
        a LIST — the Simple protocol pickles the prefetched rows into
        the micro-batch plan, so the result must be materialized (and
        is commit-sized by construction, the premise of this tier)."""
        import json as _json

        import pyarrow.parquet as pq

        tbl = self._tbl()
        names = [f.name for f in self.schema.fields]
        out: list = []
        for v in range(v_from + 1, v_to + 1):
            with open(tbl._log_path(v)) as fh:
                commit = _json.load(fh)
            if commit["op"] not in ("create", "append") \
                    and not self.ignore_changes:
                raise ValueError(
                    f"vtable stream: commit {v} is op={commit['op']!r} "
                    f"(not append-only); rewritten files would re-emit "
                    f"rows, and deletion-vector commits (delete_mor) "
                    f"remove rows an append-only tail cannot retract. "
                    f"Set option ignoreChanges=true to accept relaxed "
                    f"(at-least-once per key, deletions invisible) "
                    f"semantics."
                )
            for add in sorted(commit["add"], key=lambda a: a["path"]):
                t = pq.read_table(os.path.join(self.path, add["path"]))
                cols = {
                    n: (t.column(n).to_pylist() if n in t.column_names
                        else [None] * t.num_rows)
                    for n in names
                }
                out.extend(
                    tuple(cols[n][i] for n in names)
                    for i in range(t.num_rows)
                )
        return out

    def read(self, start: dict):
        latest = self._tbl().latest_version()
        end = {"version": latest if latest is not None else -1}
        if end["version"] <= start["version"]:
            return iter(()), start
        return iter(self._rows_between(start["version"], end["version"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_between(start["version"], end["version"]))
