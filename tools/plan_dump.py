"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/plan_dump.py <suffix> name1 [name2 ...]
Writes plans/r12/<name>_<suffix>.txt for each query (suffix in
{before, after}). sf dir from SPARK_GRAFT_SF_DIR (default sf0.1 —
the bench scale, so the plan matches what the bench measures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_rust_algos_spark.plans import registry  # noqa: E402
from pandas_rust_algos_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r12")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("pra-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.environ["PRA_PLAN_PROBES"] = "1"
    for name in names:
        df = registry.get(name).fn(spark, SF_DIR)
        probe = registry.PLAN_PROBES.pop(name, None)
        plan = formatted_plan(probe if probe is not None else df)
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
