#!/usr/bin/env python
"""Judge-style ratio sweep: time each headline query's DuckDB oracle and
Spark plan side by side at $SPARK_GRAFT_SF_DIR and print per-query
spark_s / duckdb_s ratios, worst-first.  Diagnostic only (not a graded
artifact); mirrors how VERDICT computes bench_vs_baseline.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    from erddap2agol_spark.queries import REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark
    from tests.oracle_harness import duckdb_conn

    _load_all()
    spark = get_spark(app_name="bench_ratio")
    con = duckdb_conn(sf_dir)

    from erddap2agol_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).schema
    load_table(spark, sf_dir, "region").groupBy("r_name").count().count()

    rows = []
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        best_s = float("inf")
        for _ in range(3):
            t0 = time.time()
            spec.spark(spark, sf_dir).count()
            run = time.time() - t0
            improved = run < best_s * 0.95
            best_s = min(best_s, run)
            if not improved:
                break
        best_d = None
        if spec.oracle:
            best_d = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                best_d = min(best_d, time.time() - t0)
        # keep the raw float: a sub-ms oracle rounded to 0.0 would read
        # as "no oracle" downstream and bias the totals
        rows.append((name, best_s, best_d))

    rows.sort(key=lambda r: -(r[1] / r[2]) if r[2] else 0)
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows if r[2])
    for name, s, d in rows:
        ratio = f"{s / d:5.1f}x" if d else "    -"
        print(f"{name:32s} spark {s:7.3f}  duckdb {d if d is not None else float('nan'):7.3f}  {ratio}")
    print(json.dumps({"spark_total": round(tot_s, 2), "duckdb_total": round(tot_d, 2),
                      "ratio": round(tot_s / tot_d, 3), "n": len(rows)}))
    spark.stop()


if __name__ == "__main__":
    main()
