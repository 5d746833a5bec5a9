"""Driver-harness compatibility: the correctness driver builds its OWN
SparkSession (no custom conf, arbitrary cwd). Simulate that in a fresh
subprocess — a plain session from /tmp — and run representative queries
covering every risky surface: nanos-timestamp events, Python-UDF
(mapInPandas) closures, graph-cache ETL, timestamp literals.
"""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver_sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs = e.queries()
sf = "/root/testdata/sf0.001"
out = {}
for name in [
    "q1_pricing_summary",      # timestamp literal filter
    "q_events_tumbling",       # nanos-timestamp events table
    "q_events_sessions",       # unix_micros over converted ts
    "g_counts",                # graph ETL cache path
    "x_multimodal_image",      # mapInPandas closure from foreign cwd
    "x_dedup_minhash",         # full LSH pipeline
    "x_embed_covariance",      # mapInPandas + numpy matmul from foreign cwd
]:
    out[name] = qs[name](spark, sf).count()
entry_rows = e.entry(spark).count()
out["__entry__"] = entry_rows
print("RESULT:" + json.dumps(out))
"""


def test_plain_driver_session_runs_everything():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[0][len("RESULT:") :])
    assert got["__entry__"] == 6
    assert got["q_events_tumbling"] > 0
    assert got["q_events_sessions"] == 15  # 15 users at sf0.001
    assert got["g_counts"] == 1
    assert got["x_multimodal_image"] == 500
    assert got["x_dedup_minhash"] > 0
    assert got["x_embed_covariance"] == 64 * 65 // 2  # upper-tri of d=64
