"""Per-query WORK profile: jobs, stages, tasks, shuffle/input bytes.

Wall-clock on this sandbox is polluted by hypervisor CPU steal (see
OPTIMIZATION_r07.md "Measurement environment"), so optimization progress
is tracked with deterministic work metrics instead: the number of Spark
jobs/stages/tasks a query schedules and the bytes it reads/shuffles.
These are invariant to steal and directly map to the guide's levers
(§2 fewer/smaller shuffles, §1.2 fewer passes).

Usage:
    python scripts/workprof.py NAME [NAME...]    # profile queries
Writes one JSON line per query to stdout (prefix WORK) with:
    jobs, stages, tasks, shuffle_read_mb, shuffle_write_mb, input_mb,
    wall_s (noisy, informational only)
Methodology: each query runs TWICE (like bench.py best-of-2); metrics
are for the SECOND run (steady state: shared session state warm).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("KB_CACHE_TABLES", "1")

from kinbaku_spark.queries import QUERIES  # noqa: E402
from kinbaku_spark.session import get_spark  # noqa: E402
from kinbaku_spark.sources.tables import load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def profile(spark, name: str) -> dict:
    sc = spark.sparkContext
    _force(QUERIES[name](spark, SF_DIR))  # warm run (state + codegen)
    group = f"wp_{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    _force(QUERIES[name](spark, SF_DIR))
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = [
        j
        for j in _rest(spark, "/jobs")
        if j.get("jobGroup") == group and j["status"] != "FAILED"
    ]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = _rest(spark, "/stages")
    by_id: dict = {}
    for s in stages:
        # keep the completed attempt with the most tasks per stage id
        sid = s["stageId"]
        if sid in stage_ids and (
            sid not in by_id or s["numCompleteTasks"] > by_id[sid]["numCompleteTasks"]
        ):
            by_id[sid] = s
    mm = 1024 * 1024
    return {
        "query": name,
        "jobs": len(jobs),
        "stages": len(by_id),
        "tasks": sum(s["numCompleteTasks"] for s in by_id.values()),
        "shuffle_read_mb": round(
            sum(s["shuffleReadBytes"] for s in by_id.values()) / mm, 2
        ),
        "shuffle_write_mb": round(
            sum(s["shuffleWriteBytes"] for s in by_id.values()) / mm, 2
        ),
        "input_mb": round(sum(s["inputBytes"] for s in by_id.values()) / mm, 2),
        "wall_s": round(wall, 3),
    }


def profile_jobs(spark, name: str) -> list[dict]:
    """Per-JOB breakdown of one steady-state run — which driver actions /
    broadcast builds an iterative query actually schedules (diagnosis aid
    for the r08 job-floor work; same second-run methodology as profile)."""
    sc = spark.sparkContext
    _force(QUERIES[name](spark, SF_DIR))  # warm run (state + codegen)
    group = f"wpj_{name}"
    sc.setJobGroup(group, name)
    _force(QUERIES[name](spark, SF_DIR))
    sc.setJobGroup(None, None)
    jobs = [
        j
        for j in _rest(spark, "/jobs")
        if j.get("jobGroup") == group and j["status"] != "FAILED"
    ]
    stages = {s["stageId"]: s for s in _rest(spark, "/stages")}
    mm = 1024 * 1024
    out = []
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        ss = [stages[i] for i in j["stageIds"] if i in stages]
        out.append(
            {
                "job": j["jobId"],
                "desc": (j.get("name") or j.get("description") or "")[:110],
                "stages": len(j["stageIds"]),
                "tasks": sum(s["numCompleteTasks"] for s in ss),
                "shuf_mb": round(
                    sum(s["shuffleReadBytes"] for s in ss) / mm, 2
                ),
                "input_mb": round(sum(s["inputBytes"] for s in ss) / mm, 2),
            }
        )
    return out


def main() -> None:
    names = sys.argv[1:]
    per_job = False
    if names and names[0] == "--jobs":
        per_job = True
        names = names[1:]
    spark = get_spark(app_name="kb_workprof", ui_enabled=True)
    load_tables(spark, SF_DIR)
    _force(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    _force(QUERIES["g_counts"](spark, SF_DIR))
    for name in names:
        try:
            if per_job:
                for row in profile_jobs(spark, name):
                    print("JOB " + json.dumps(row), flush=True)
            else:
                print("WORK " + json.dumps(profile(spark, name)), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"WORK {{\"query\": \"{name}\", \"error\": \"{exc!r}\"}}", flush=True)


if __name__ == "__main__":
    main()
