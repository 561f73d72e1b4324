#!/usr/bin/env python
"""TPC-H sf-crossover evidence (VERDICT r8 #5): the headline TPC-H
ratios at sf0.1 (q3/q8/q10/q21 at 9-14x DuckDB) have sub-0.1 s DuckDB
denominators — the claim is they are Spark JOB-FLOOR artifacts, not
plan defects, and the ratio converges toward/below 1 as data grows.
This tool produces the measurement.

No network in the sandbox (DuckDB's tpch extension cannot download), so
larger scale factors are built by KEY-OFFSET REPLICATION of the sf0.1
base: copy k of customer/orders/lineitem/supplier/part adds k*1e8 to
every synthetic key (all BIGINT; 10 copies tops out ~9.06e8, far under
int64), leaving dates, amounts, segments and dims (region/nation)
untouched.  Each copy is key-disjoint, so join fan-outs, filter
selectivities and group cardinalities scale exactly linearly — the same
regime dbgen itself produces (TPC-H data is uniform by construction).
x5 ~ sf0.5, x10 ~ sf1.

Protocol: same pinned steady-state as tools/bench_ratio.py — loadavg
recorded, 1 warmup, median of 3 per engine per scale.

Usage: python tools/tpch_crossover.py [mult ...]   (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_tpch"
OFFSET = 10**8
QUERIES = [
    "q3_shipping_priority",
    "q8_market_share",
    "q10_returned_items",
    "q21_late_sole_suppliers",
]
# Override via env, e.g. the iterative-graph family: key-offset copies
# are key-DISJOINT, so each copy's co-purchase graph is an isomorphic
# image of the base graph — nodes/edges/components scale exactly
# linearly, the iso regime the broadcast-round design must stay linear
# in (copurchase_edges l_partkey offsets keep copies' parts disjoint).
if os.environ.get("TPCH_CROSSOVER_QUERIES"):
    QUERIES = [
        q.strip()
        for q in os.environ["TPCH_CROSSOVER_QUERIES"].split(",")
        if q.strip()
    ]
# (table, key columns to offset); everything else symlinks from base
SCALED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}


def build_dir(mult: int) -> str:
    import duckdb

    out = os.path.join(WORK, f"x{mult}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SCALED.items():
        src = f"{BASE_SF}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if mult == 1:
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
        sel = ", ".join(
            f"{c} + k.k * {OFFSET} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}') "
            f"CROSS JOIN (SELECT unnest(range({mult})) AS k) k) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    for t in ("region", "nation", "events", "documents", "embeddings"):
        src, dst = f"{BASE_SF}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(done, "w") as f:
        f.write("ok")
    return out


# ONE definition of the pinned warmup+median protocol — reuse
# bench_ratio's so the two certified tools cannot drift
def _load_bench_ratio():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_ratio", os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_ratio.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_bench_ratio_median_time = _load_bench_ratio()._median_time


def _median_time(fn, runs: int = 3) -> float:
    return _bench_ratio_median_time(fn, runs)


def main() -> None:
    from erddap2agol_spark.queries import REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark
    from tests.oracle_harness import duckdb_conn

    mults = sorted({int(m) for m in sys.argv[1:]}) or [1, 5, 10]
    load0 = os.getloadavg()[0]
    _load_all()
    spark = get_spark(app_name="tpch_crossover")

    rows = []
    for m in mults:
        d = build_dir(m)
        con = duckdb_conn(d)
        for q in QUERIES:
            spec = REGISTRY[q]
            s = _median_time(lambda: spec.spark(spark, d).count())
            dd = _median_time(lambda: con.execute(spec.oracle).fetchall())
            rows.append((q, m, s, dd))
            print(f"  {q:28s} x{m:<3d} spark {s:7.3f}  duckdb {dd:7.3f}  "
                  f"{s / dd:5.2f}x", flush=True)
        con.close()

    print(f"\n{'query':28s} " + " ".join(f"x{m}:ratio" for m in mults))
    summary: dict[str, dict[int, float]] = {}
    for q in QUERIES:
        rs = {m: s / dd for (qq, m, s, dd) in rows if qq == q}
        summary[q] = {m: round(r, 2) for m, r in rs.items()}
        print(f"{q:28s} " + " ".join(f"{rs[m]:7.2f}" for m in mults))
    print(json.dumps({
        "base": BASE_SF, "mults": mults, "ratios": summary,
        "loadavg_before": round(load0, 2),
        "loadavg_after": round(os.getloadavg()[0], 2),
        "protocol": {"warmups": 1, "runs": 3, "stat": "median"},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
