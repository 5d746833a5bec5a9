"""Ad-hoc oracle parity check for named queries (dev loop helper).

    python scripts/check_queries.py NAME... [--sf /root/testdata/sf0.01]

Runs each named query on Spark AND its DuckDB oracle, compares with the
same normalization as tests/test_oracle_parity.py, prints PASS/FAIL per
query. Faster than a pytest -k sweep when iterating on one new operator.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb

from kinbaku_spark.queries import ORACLES, QUERIES
from kinbaku_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def _normalize(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    return sorted(
        "|".join(_norm_cell(x) for x in r.tolist())
        for _, r in pdf[cols].iterrows()
    )


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or sorted(QUERIES)
    spark = get_spark(app_name="check_queries", shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    failed = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf).toPandas()
            odf = duck.execute(ORACLES[name]).fetchdf()
            assert sorted(sdf.columns) == sorted(odf.columns), (
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
            s_rows, o_rows = _normalize(sdf), _normalize(odf)
            bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
            assert not bad, f"first mismatches {bad[:3]}"
            print(f"PASS {name} ({len(sdf)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {e}")
    print(f"{len(names) - len(failed)}/{len(names)} green")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
