"""Full-registry timing census: noop-force EVERY registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print the slowest, so hotspots
hiding outside the bench headline list get found (the round-2 hunt that
caught g_hits' 29.6s compounding recompute was exactly this).

Single pass (not min-of-2) — this is a detector, not a benchmark; anything
slow here graduates to a real min-of-2 measurement before optimizing.

Usage: python scripts/census.py [threshold_seconds]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("KB_CACHE_TABLES", "1")

from kinbaku_spark.queries import QUERIES  # noqa: E402
from kinbaku_spark.session import get_spark  # noqa: E402
from kinbaku_spark.sources.tables import load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    spark = get_spark(app_name="kb_census")
    load_tables(spark, SF_DIR)
    # warm the shared derived state outside any timed region
    QUERIES["g_counts"](spark, SF_DIR).count()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # census must finish; record and move on
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"{name}: {timings.get(name, 'ERR')}", flush=True)
    out = {
        "sf_dir": SF_DIR,
        "total_sec": round(sum(timings.values()), 1),
        "n": len(timings),
        "failures": failures,
        "slowest": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:25]),
    }
    with open("/tmp/census_latest.json", "w") as f:
        json.dump({**out, "timings": timings}, f, indent=1)
    print(json.dumps(out, indent=1))
    hot = {k: v for k, v in timings.items() if v >= threshold}
    print(f"\n>= {threshold}s: {json.dumps(dict(sorted(hot.items(), key=lambda kv: -kv[1])), indent=1)}")


if __name__ == "__main__":
    main()
