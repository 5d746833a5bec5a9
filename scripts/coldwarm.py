"""Cold/warm wall split for shared-session-state consumers (VERDICT r07
"What's wrong #4" / next-round #6): for each named query, a FRESH python
process measures

  cold_s: first call in the session — shared-state build included
          (kmeans_state / dedup_state / truss_backbone etc. all cold);
  warm_s: second call in the same session (the steady-state number the
          bench's best-of-2 reports).

Base tables are loaded and the derived graph warmed BEFORE the cold
timing, exactly like bench.py's warm-up — so cold_s isolates the QUERY's
own shared-state build, not table load.

Usage:  python scripts/coldwarm.py NAME [NAME...]
        (the parent spawns one child process per name)
Output: COLDWARM {"query":..., "cold_s":..., "warm_s":...} per query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(name: str) -> None:
    sys.path.insert(0, ROOT)
    os.environ.setdefault("KB_CACHE_TABLES", "1")
    from kinbaku_spark.queries import QUERIES
    from kinbaku_spark.session import get_spark
    from kinbaku_spark.sources.tables import load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"kb_coldwarm_{name}")
    load_tables(spark, sf_dir)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(QUERIES["q1_pricing_summary"](spark, sf_dir))
    force(QUERIES["g_counts"](spark, sf_dir))
    t0 = time.perf_counter()
    force(QUERIES[name](spark, sf_dir))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    force(QUERIES[name](spark, sf_dir))
    warm = time.perf_counter() - t0
    print(
        "COLDWARM "
        + json.dumps(
            {"query": name, "cold_s": round(cold, 3), "warm_s": round(warm, 3)}
        ),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    for name in sys.argv[1:]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True,
            text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("COLDWARM "):
                print(line, flush=True)
                break
        else:
            print(
                f"COLDWARM {{\"query\": \"{name}\", \"error\": {r.returncode}}}",
                flush=True,
            )


if __name__ == "__main__":
    main()
