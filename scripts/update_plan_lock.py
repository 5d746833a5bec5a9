"""Regenerate PLAN_LOCK.json: python scripts_update_plan_lock.py"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.pop("KB_CACHE_TABLES", None)

from kinbaku_spark.plans.signature import plan_signature
from kinbaku_spark.queries import QUERIES
from kinbaku_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="plan_lock", shuffle_partitions=8)
    lock = {}
    for name in sorted(QUERIES):
        # build twice, fingerprint the second: queries that persist shared
        # derived state (pagerank's degree table, SSSP's symmetrized edges)
        # have an invocation-order-dependent first plan; the steady-state
        # plan is the meaningful, order-independent one
        QUERIES[name](spark, SF)
        lock[name] = plan_signature(QUERIES[name](spark, SF))
        print(name, "ok", file=sys.stderr)
    with open(os.path.join(ROOT, "PLAN_LOCK.json"), "w") as f:
        json.dump(lock, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    main()
