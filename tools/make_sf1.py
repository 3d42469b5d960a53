"""Generate the sf1 scale-rehearsal dataset: a 10× replication of the
driver's sf0.1 fixtures with surrogate keys shifted per replica, so
join fan-outs and group cardinalities scale realistically (10× facts,
10× customers/parts/suppliers/orders/docs/vectors; region/nation stay
fixed like real dims).

The driver only ships sf0.001/0.01/0.1; the 2× perf contract is at
sf0.1, but a 10× data point is the cheapest way to catch a plan that
is only accidentally fine at sf0.1 — this is what exposed the
fuzzy-join pair-scan blowup (BENCH_sf1.json, SCALE.md). Writes to
/tmp/sf1 (or argv[1]); run bench against it with
``SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py``.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
R = 10

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# fact-side foreign keys shift by the OWNING table's key offset
FKS = {
    "orders": {"o_custkey": ("customer", "c_custkey")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
}
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    off: dict[tuple[str, str], int] = {}
    for t, ks in KEYS.items():
        for k in ks:
            off[(t, k)] = con.execute(
                f"SELECT MAX({k})+1 FROM {src(t)}"
            ).fetchone()[0]

    for t in TABLES:
        cols = [
            r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM {src(t)}"
            ).fetchall()
        ]
        if t in ("region", "nation"):
            sel, q = ", ".join(cols), f"SELECT * FROM {src(t)}"
        else:
            exprs = []
            for c in cols:
                if c in KEYS.get(t, []):
                    exprs.append(f"{c} + rep*{off[(t, c)]} AS {c}")
                elif c in FKS.get(t, {}):
                    ot, ok = FKS[t][c]
                    exprs.append(f"{c} + rep*{off[(ot, ok)]} AS {c}")
                else:
                    exprs.append(c)
            sel = ", ".join(exprs)
            q = (f"SELECT {sel} FROM {src(t)}, "
                 f"(SELECT UNNEST(range({R})) AS rep)")
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' "
                    "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
