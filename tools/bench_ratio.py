#!/usr/bin/env python
"""Judge-style ratio sweep: time each headline query's DuckDB oracle and
Spark plan side by side at $SPARK_GRAFT_SF_DIR and print per-query
spark_s / duckdb_s ratios, worst-first.  Diagnostic only (not a graded
artifact); mirrors how VERDICT computes bench_vs_baseline.

PINNED STEADY-STATE PROTOCOL (VERDICT r8 #3 — builder and judge got
2.0x vs 3.2x on the same code because the measurement protocol was
unpinned; both parties run THIS):

- Load gate: the sweep records 1-min loadavg at start and refuses to
  certify (exit code 2, ``"gated": true`` in the JSON line) when it
  exceeds ``--max-load`` (default 4.0) — co-tenant noise, not signal.
- Warmup: per query, ONE untimed run on each engine first (plan
  compile, code cache, file cache), discarded.
- Measurement: the MEDIAN of ``--runs`` (default 3) timed runs per
  engine.  Median, not min: min rewards lucky scheduling, mean is
  tail-sensitive; the median is what a re-run reproduces.
- loadavg is re-read after the sweep and recorded in the JSON line so
  an artifact can be rejected after the fact.

Usage: python tools/bench_ratio.py [--only name ...] [--runs N]
       [--max-load X]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


def _median_time(fn, runs: int) -> float:
    fn()  # warmup, discarded
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return statistics.median(times)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed runs per engine (median reported)")
    ap.add_argument("--max-load", type=float, default=4.0,
                    help="1-min loadavg above this gates the sweep")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    from erddap2agol_spark.queries import REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark
    from tests.oracle_harness import duckdb_conn

    load_before = os.getloadavg()[0]
    gated = load_before > args.max_load
    if gated:
        print(f"WARNING: loadavg {load_before:.2f} > {args.max_load} — "
              "sweep will run but is NOT a certifiable steady-state "
              "measurement (gated=true)")

    _load_all()
    spark = get_spark(app_name="bench_ratio")
    con = duckdb_conn(sf_dir)

    from erddap2agol_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).schema
    load_table(spark, sf_dir, "region").groupBy("r_name").count().count()

    names = args.only if args.only else HEADLINE
    rows = []
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        med_s = _median_time(lambda: spec.spark(spark, sf_dir).count(), args.runs)
        med_d = None
        if spec.oracle:
            med_d = _median_time(lambda: con.execute(spec.oracle).fetchall(),
                                 args.runs)
        rows.append((name, med_s, med_d))

    rows.sort(key=lambda r: -(r[1] / r[2]) if r[2] else 0)
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows if r[2])
    for name, s, d in rows:
        ratio = f"{s / d:5.1f}x" if d else "    -"
        print(f"{name:32s} spark {s:7.3f}  duckdb {d if d is not None else float('nan'):7.3f}  {ratio}")
    load_after = os.getloadavg()[0]
    print(json.dumps({
        "spark_total": round(tot_s, 2), "duckdb_total": round(tot_d, 2),
        "ratio": round(tot_s / tot_d, 3) if tot_d else None, "n": len(rows),
        "protocol": {"warmups": 1, "runs": args.runs, "stat": "median"},
        "loadavg_before": round(load_before, 2),
        "loadavg_after": round(load_after, 2),
        "max_load": args.max_load, "gated": gated,
    }))
    spark.stop()
    return 2 if gated else 0


if __name__ == "__main__":
    raise SystemExit(main())
