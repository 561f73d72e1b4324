#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Writes plans/<tag>/<query>_<suffix>.txt for each requested query —
the optimization-round evidence trail (guide §1: measure first; §7.2:
read the plan).  Iterative queries (pagerank, label propagation, BPE)
run real jobs while BUILDING their DataFrame (probe counts,
checkpoints); their captured plan is the terminal plan, which is what
the judge checks claims against.

Usage: python tools/capture_plans.py --tag r09 --suffix before [names...]
       (no names = the full bench HEADLINE list)
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINE
    from erddap2agol_spark.queries import REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark

    _load_all()
    names = args.names or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{args.tag}")
    jvm = spark.sparkContext._jvm
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}: not in registry")
            continue
        try:
            df = spec.spark(spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            txt = f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
