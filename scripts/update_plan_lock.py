"""Regenerate PLAN_LOCK.json.

Full regen:        python scripts/update_plan_lock.py
Incremental:       python scripts/update_plan_lock.py q1 q2 ...
                   (recomputes only the named queries, keeps the rest;
                   names not yet in the lock are added)

NOTE on incremental runs: signatures are computed in a session that built
only the named queries, so shared-state markers (InMemoryTableScan after
another query persisted a table) can differ from a full regen. The plan-
lock test rebuilds steady state first, so use incremental mode only for
queries whose plans don't depend on other queries' side effects — verify
with `pytest tests/test_plan_lock.py` afterwards and fall back to a full
regen if it disagrees.
"""
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
    only = set(sys.argv[1:])
    lock = {}
    if only:
        lock_path = os.path.join(ROOT, "PLAN_LOCK.json")
        if os.path.exists(lock_path):
            with open(lock_path) as f:
                lock = json.load(f)
        lock = {k: v for k, v in lock.items() if k in QUERIES}
        unknown = only - set(QUERIES)
        assert not unknown, f"not in QUERIES: {sorted(unknown)}"
    names = sorted(only) if only else sorted(QUERIES)
    for name in names:
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
