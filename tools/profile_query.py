#!/usr/bin/env python
"""Per-job/stage profile of one registered query (guide §1: measure
first, at stage granularity).  The Spark UI is disabled in this harness,
so the stage decomposition comes from the event log instead: run the
query under bench.py semantics (same session config, same timed action),
then parse the JSON event log into a per-job table — submit time, wall,
task count, shuffle read/write bytes, and the job's description/call
site.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/profile_query.py <query> [runs] [sf_dir]

Prints one line per job of the LAST run (steady state), then a summary
of per-run walls.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    log_dir = tempfile.mkdtemp(prefix="spark-events-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from erddap2agol_spark.queries import REGISTRY, _load_all
    from erddap2agol_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.compress": "false",
        },
    )
    from erddap2agol_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).schema
    load_table(spark, sf_dir, "region").groupBy("r_name").count().count()

    spec = REGISTRY[name]
    sc = spark.sparkContext
    walls = []
    run_marks = []  # job-id watermark at the start of each run
    for i in range(runs):
        run_marks.append(time.time())
        sc.setJobDescription(f"RUN{i}:{name}")
        t0 = time.time()
        spec.spark(spark, sf_dir).count()
        walls.append(time.time() - t0)
    sc.setJobDescription(None)
    spark.stop()

    # parse the event log; Spark 4 rolling v2 logs are DIRECTORIES of
    # events_* files
    files = []
    for root, _dirs, names in os.walk(log_dir):
        for f in names:
            if "events" in f or f.endswith(".inprogress"):
                files.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"] / 1000.0,
                        "desc": props.get("spark.job.description", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                        "end": None,
                    }
                elif k == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j:
                        j["end"] = ev["Completion Time"] / 1000.0
                elif k == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    acc = {
                        a.get("Name"): a.get("Value")
                        for a in si.get("Accumulables", [])
                    }
                    stages[sid] = {
                        "name": si.get("Stage Name", "")[:60],
                        "tasks": si.get("Number of Tasks"),
                        "sub": si.get("Submission Time", 0) / 1000.0,
                        "done": si.get("Completion Time", 0) / 1000.0,
                        "sh_read": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                        or 0,
                        "sh_write": acc.get(
                            "internal.metrics.shuffle.write.bytesWritten", 0
                        )
                        or 0,
                        "input": acc.get("internal.metrics.input.bytesRead", 0) or 0,
                    }

    last_mark = run_marks[-1]
    print(f"== {name}  sf={sf_dir}  runs: " + " ".join(f"{w:.3f}s" for w in walls))
    print(f"-- jobs of run {runs - 1} (steady state):")
    prev_end = last_mark
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["start"] < last_mark or j["end"] is None:
            continue
        wall = j["end"] - j["start"]
        gap = (j["start"] - prev_end) * 1000
        prev_end = j["end"]
        print(
            f"job {jid:3d}  {wall * 1000:7.0f} ms  gap {gap:6.0f} ms  "
            f"desc={j['desc'][:40]!r}"
        )
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or not s.get("done"):
                continue
            swall = (s["done"] - s["sub"]) * 1000 if s["sub"] else 0
            print(
                f"    stage {sid:3d} {swall:6.0f} ms  {s['tasks']:4d} tasks  "
                f"shW {s['sh_write'] / 1e6:7.2f} MB  in {s['input'] / 1e6:7.2f} MB  "
                f"{s['name']}"
            )
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
