"""Incrementally maintained materialized aggregate views over a
:class:`~pandas_rust_algos_spark.sources.table_format.VersionedTable`
— the lakehouse pattern where a 100 TB fact table's rollup is kept
fresh by applying the *change feed* between two versions instead of
recomputing the world.

Why this shape scales
---------------------
A full refresh reads every live file of the base table; an incremental
refresh reads only the two snapshots' diff (one co-partitioned
full-outer join, filtered to changes before leaving the executors) and
joins the per-group deltas against the current view — cost tracks the
CHANGE volume, not the table size. COUNT and SUM are the
self-maintainable aggregates (deltas compose associatively); MIN/MAX
are not (a removed row can strike the current extremum, forcing a
rescan of that group) and are deliberately not offered here.

Exactness: sums are maintained in fixed-point micro-units (long), the
repo-wide deterministic-sum recipe (registry rule 1) — integer deltas
are exact and associative, so an incrementally-maintained view is
BIT-IDENTICAL to a full recompute, which the tests assert. Float
accumulation would drift under delta application order.

Storage: the view itself is a plain parquet snapshot per refresh
(``v{N}/`` subdir) plus a tiny JSON pointer — the same
immutable-files + manifest discipline as the table format, so a
reader pinned to a view version never sees a half-written refresh.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_rust_algos_spark.sources.table_format import VersionedTable

__all__ = ["MaterializedSumView"]

_META = "_view_meta.json"


class MaterializedSumView:
    """COUNT(*) + fixed-point SUM view grouped by ``group_cols``,
    incrementally maintained from the base table's change feed."""

    def __init__(
        self,
        table: VersionedTable,
        path: str,
        group_cols: Sequence[str],
        sum_cols: Sequence[str],
        *,
        scale: int = 6,
    ) -> None:
        if not table.key_cols:
            raise ValueError("base table needs key_cols for a change feed")
        self.table = table
        self.spark: SparkSession = table.spark
        self.path = path
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.k = 10 ** scale
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ meta

    def _meta(self) -> dict | None:
        p = os.path.join(self.path, _META)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.path + "/" + _META)

    # ------------------------------------------------------------ aggs

    def _fx(self, col) -> F.Column:
        # fixed-point micro-units; NULL contributes 0 (SUM-skips-NULL)
        return F.coalesce(
            F.floor(F.col(col).cast("double") * F.lit(self.k)).cast("long"),
            F.lit(0).cast("long"),
        )

    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in self.sum_cols:
            aggs.append(F.sum(self._fx(c)).alias(f"{c}_sum_micro"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    # --------------------------------------------------------- refresh

    def refresh(self) -> int:
        """Bring the view up to the base table's latest version; returns
        that version. First call is a full build; later calls apply the
        change feed only."""
        latest = self.table.latest_version()
        if latest is None:
            raise ValueError("base table has no commits")
        meta = self._meta()
        if meta is None:
            view = self._aggregate(self.table.read(version=latest))
        elif meta["base_version"] == latest:
            return latest
        else:
            view = self._apply_delta(meta["base_version"], latest)
        out_dir = os.path.join(self.path, f"v{latest}")
        view.write.mode("overwrite").parquet(out_dir)
        self._write_meta({"base_version": latest, "dir": f"v{latest}"})
        return latest

    def _apply_delta(self, v_from: int, v_to: int) -> DataFrame:
        diff = self.table.changes(v_from, v_to)
        # a changed row may MOVE between groups: emit a minus-delta at
        # its old group and a plus-delta at its new group
        minus = diff.where(F.col("status").isin("removed", "changed")).select(
            *[F.col(f"old_{g}").alias(g) for g in self.group_cols],
            F.lit(-1).cast("long").alias("dn"),
            *[
                (-self._fx(f"old_{c}")).alias(f"d_{c}")
                for c in self.sum_cols
            ],
        )
        plus = diff.where(F.col("status").isin("added", "changed")).select(
            *[F.col(f"new_{g}").alias(g) for g in self.group_cols],
            F.lit(1).cast("long").alias("dn"),
            *[self._fx(f"new_{c}").alias(f"d_{c}") for c in self.sum_cols],
        )
        delta = (
            minus.unionByName(plus)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("dn").alias("dn"),
                *[F.sum(f"d_{c}").alias(f"d_{c}") for c in self.sum_cols],
            )
        )
        cur = self.read()
        d = delta.select(
            *[F.col(g).alias(f"__g_{g}") for g in self.group_cols],
            "dn", *[f"d_{c}" for c in self.sum_cols],
        )
        # null-safe equi-join: NULL group values must merge, not dup
        cond = None
        for g in self.group_cols:
            e = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
            cond = e if cond is None else cond & e
        merged = cur.join(d, cond, "full_outer")
        zl = F.lit(0).cast("long")
        out_cols = [
            F.coalesce(F.col(g), F.col(f"__g_{g}")).alias(g)
            for g in self.group_cols
        ]
        n = (F.coalesce(F.col("n"), zl) + F.coalesce(F.col("dn"), zl)).alias("n")
        sums = [
            (
                F.coalesce(F.col(f"{c}_sum_micro"), zl)
                + F.coalesce(F.col(f"d_{c}"), zl)
            ).alias(f"{c}_sum_micro")
            for c in self.sum_cols
        ]
        return merged.select(*out_cols, n, *sums).where(F.col("n") > 0)

    # ------------------------------------------------------------ read

    def read(self) -> DataFrame:
        """The current view snapshot (group cols, ``n``, micro-unit
        sums)."""
        meta = self._meta()
        if meta is None:
            raise ValueError("view has never been refreshed")
        return self.spark.read.parquet(os.path.join(self.path, meta["dir"]))

    def read_sums(self) -> DataFrame:
        """Reader-friendly projection: micro-unit sums scaled back to
        doubles (``<col>_sum``)."""
        v = self.read()
        return v.select(
            *self.group_cols,
            "n",
            *[
                (F.col(f"{c}_sum_micro").cast("double") / self.k).alias(
                    f"{c}_sum"
                )
                for c in self.sum_cols
            ],
        )
