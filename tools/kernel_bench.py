"""Kernel-parity microbenchmark: the reference's own bench recipe run
on this engine.

The reference's only committed benchmark is ``bench_group_sum``
(``/root/reference/benches/groupby.rs:9-34``): N=10,000,000 i64 rows,
200 round-robin labels (``i % 200``), one ``group_sum`` call; the
README's ``%timeit`` recipes use the same shape at N=10M/200 groups for
group_sum (``README.md:115-140``) and N=10k/50 groups for the
cumulatives (``README.md:69-101``). This tool reproduces those shapes
so single-node throughput is directly comparable: rows/sec through a
grouped sum (reduction) and a grouped cumsum (ordered transform).

Usage: python tools/kernel_bench.py  (writes KERNEL_BENCH.md)

Input is generated with ``spark.range`` exactly as the reference
generates arrays in-process — this benchmark measures the aggregation
engine, not parquet I/O (bench.py covers the scan-inclusive paths).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_rust_algos_spark.operators import grouped_agg as ga  # noqa: E402
from pandas_rust_algos_spark.operators import grouped_transform as gt  # noqa: E402
from pandas_rust_algos_spark.session import get_spark  # noqa: E402

N_SUM = 10_000_000     # benches/groupby.rs:10-13, README.md:118
G_SUM = 200
N_CUM = 10_000_000     # README's cumsum shape (10k) scaled up so the
G_CUM = 50             # measurement isn't pure fixed overhead


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench(fn, repeat: int = 3) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("pra-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base_sum = (
        spark.range(N_SUM)
        .select((F.col("id") % G_SUM).alias("label"), F.col("id").alias("v"))
    )
    base_cum = (
        spark.range(N_CUM)
        .select((F.col("id") % G_CUM).alias("label"), F.col("id").alias("ord"),
                (F.col("id") % 1000).cast("double").alias("v"))
    )
    # warmup (codegen + JIT)
    _force(ga.group_sum(base_sum, "label", ["v"]))
    _force(gt.group_cumsum(base_cum, "label", ["ord"], ["v"]))

    t_sum = bench(lambda: _force(ga.group_sum(base_sum, "label", ["v"])))
    t_cum = bench(lambda: _force(gt.group_cumsum(base_cum, "label", ["ord"], ["v"])))

    results = {
        "group_sum": {"rows": N_SUM, "groups": G_SUM, "sec": round(t_sum, 3),
                      "rows_per_sec": int(N_SUM / t_sum)},
        "group_cumsum": {"rows": N_CUM, "groups": G_CUM, "sec": round(t_cum, 3),
                         "rows_per_sec": int(N_CUM / t_cum)},
    }
    print(json.dumps(results))

    md = f"""# KERNEL_BENCH — reference-recipe microbenchmarks

The reference's committed benchmark shape (`/root/reference/benches/groupby.rs:9-34`,
`README.md:115-140`): grouped sum over 10M rows / 200 round-robin groups,
single i64 column. Same shape here through the engine's operators on
local[{os.environ.get("SPARK_GRAFT_CPUS", "32")}], input generated in-process
(`spark.range`) so aggregation throughput is measured, not I/O. Best of 3
after a codegen warmup run.

| kernel | rows | groups | sec | rows/sec |
|---|---|---|---|---|
| group_sum (reduction) | {N_SUM:,} | {G_SUM} | {results['group_sum']['sec']} | {results['group_sum']['rows_per_sec']:,} |
| group_cumsum (ordered transform) | {N_CUM:,} | {G_CUM} | {results['group_cumsum']['sec']} | {results['group_cumsum']['rows_per_sec']:,} |

Context: the reference publishes no absolute numbers (BASELINE.md); its
qualitative result is parity-to-33%-slower vs pandas' single-thread Cython
kernels. A Cython `group_sum` at this shape runs on the order of 10⁷-10⁸
rows/sec on one core; the engine's throughput above comes from {os.environ.get("SPARK_GRAFT_CPUS", "32")}
cores plus whole-stage codegen, and — unlike an in-memory kernel — the same
plan scales past RAM and across executors unchanged.
"""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "KERNEL_BENCH.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
