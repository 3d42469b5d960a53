"""Declarative data-quality expectations (Great-Expectations-shaped).

A training-data pipeline gates every ingest batch on a validation
report: null fractions, domain membership, value ranges, key
uniqueness, referential integrity. The reference engine has no
validation layer (its inputs arrive as trusted NumPy arrays,
``/root/reference/src/lib.rs:59-63``); at 100 TB validation is a
first-class operator because a bad batch discovered *after* a join
fan-out costs a cluster-day.

Scale design — the whole point of this module:

* Every ROW rule (not-null, range, set, regex) folds into ONE
  aggregation over ONE scan: each rule is a ``SUM(CASE WHEN violation
  THEN 1 END)`` column in the same ``agg``, so 20 rules cost exactly
  one pass with map-side partial aggregation and a 1-row shuffle.
  Never one scan per rule.
* UNIQUENESS rules ride the same single agg as
  ``COUNT(*) - COUNT(DISTINCT struct(cols))``; ``approx=True`` swaps
  in HyperLogLog (``approx_count_distinct``) for the 100 TB path where
  an exact distinct shuffle of a high-cardinality key is the bottleneck
  and "duplicates exist: yes/no, roughly how many" is the question.
* REFERENTIAL rules are each one broadcast LEFT ANTI join against the
  dim's key projection — the dim side ships (keys only), the fact scan
  never shuffles. ``n_fk`` extra scans total, not ``n_fk`` shuffles.
* The report is tiny (one row per rule) — safe to collect, join, or
  alert on.

NULL semantics follow the validation-framework convention: range /
set / regex rules do NOT count NULL values as violations (pair them
with an explicit ``not_null`` rule), and a NULL foreign key is not a
dangling reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class RowRule:
    """One row-level expectation: ``violation`` is a boolean Column
    that is True on rows breaking the rule (NULL counts as False)."""

    rule: str
    target: str
    violation: Column


def not_null(col: str) -> RowRule:
    return RowRule("not_null", col, F.col(col).isNull())


def in_range(col: str, lo, hi) -> RowRule:
    """Violated when the value falls outside ``[lo, hi]`` (inclusive);
    NULLs are not counted (see module docstring)."""
    return RowRule(
        f"in_range[{lo},{hi}]", col, ~F.col(col).between(F.lit(lo), F.lit(hi))
    )


def in_set(col: str, values: Iterable) -> RowRule:
    vals = sorted(values)
    return RowRule(
        "in_set[" + ",".join(str(v) for v in vals) + "]",
        col,
        ~F.col(col).isin(vals),
    )


def matches(col: str, pattern: str) -> RowRule:
    """Violated when the (non-NULL) value does not fully match the
    regex. Spark's ``rlike`` is SUBSTRING matching, so the pattern is
    wrapped as ``^(?:pattern)$`` here to get the full-match semantics
    an expectation implies — ``matches('id', r'\\d{4}')`` must reject
    ``'x12345y'``, which bare rlike would accept."""
    anchored = f"^(?:{pattern})$"
    return RowRule(f"matches[{pattern}]", col, ~F.col(col).rlike(anchored))


@dataclass(frozen=True)
class UniqueRule:
    """Composite-key uniqueness; violations = surplus duplicate rows.
    NULL key fields participate as values (struct equality), matching
    ``COUNT(DISTINCT (a, b))`` over a row-struct in ANSI engines."""

    cols: tuple[str, ...]


def unique(*cols: str) -> UniqueRule:
    return UniqueRule(tuple(cols))


@dataclass(frozen=True)
class ForeignKeyRule:
    """``child[col]`` must exist in ``dim[dim_col]``. Checked with a
    broadcast LEFT ANTI join — dim keys ship, the fact never shuffles."""

    col: str
    dim: DataFrame
    dim_col: str
    name: str = "foreign_key"


def foreign_key(col: str, dim: DataFrame, dim_col: str,
                name: str = "foreign_key") -> ForeignKeyRule:
    return ForeignKeyRule(col, dim, dim_col, name)


def expectations_report(
    df: DataFrame,
    rules: Sequence[RowRule] = (),
    uniques: Sequence[UniqueRule] = (),
    fks: Sequence[ForeignKeyRule] = (),
    approx: bool = False,
) -> DataFrame:
    """Evaluate all expectations and return the long-format report
    ``(rule, target, violations, total, passed)`` — one row per rule.

    One scan covers every row + uniqueness rule (single folded agg);
    each foreign key adds one broadcast-anti-join scan. ``approx=True``
    switches uniqueness to HyperLogLog counting (±~2.3%) for keys whose
    exact distinct would dominate the job at scale; the report is then
    a monitor, not a proof, which is usually the right trade at 100 TB.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum(F.coalesce(r.violation, F.lit(False)).cast("long"))
            .alias(f"__v{i}")
        )
    for j, u in enumerate(uniques):
        key = F.struct(*[F.col(c) for c in u.cols])
        distinct = (
            F.approx_count_distinct(key) if approx else F.count_distinct(key)
        )
        aggs.append(
            (F.count(F.lit(1)) - distinct).cast("long").alias(f"__u{j}")
        )
    one = df.agg(*aggs)

    entries = []
    for i, r in enumerate(rules):
        entries.append(F.struct(
            F.lit(r.rule).alias("rule"),
            F.lit(r.target).alias("target"),
            F.col(f"__v{i}").alias("violations"),
            F.col("__total").alias("total"),
        ))
    for j, u in enumerate(uniques):
        entries.append(F.struct(
            F.lit("unique" + ("~hll" if approx else "")).alias("rule"),
            F.lit(",".join(u.cols)).alias("target"),
            F.col(f"__u{j}").alias("violations"),
            F.col("__total").alias("total"),
        ))
    report = (
        one.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
        if entries
        else None
    )

    for fk in fks:
        dim_keys = fk.dim.select(F.col(fk.dim_col).alias("__k")).distinct()
        dangling = (
            df.where(F.col(fk.col).isNotNull())
            .join(F.broadcast(dim_keys),
                  F.col(fk.col) == F.col("__k"), "left_anti")
        )
        row = df.agg(F.count(F.lit(1)).alias("total")).crossJoin(
            dangling.agg(F.count(F.lit(1)).alias("violations"))
        ).select(
            F.lit(fk.name).alias("rule"),
            F.lit(fk.col).alias("target"),
            F.col("violations"),
            F.col("total"),
        )
        report = row if report is None else report.unionByName(row)

    if report is None:
        raise ValueError("no expectations given")
    return report.withColumn("passed", F.col("violations") == 0)
