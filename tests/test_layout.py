"""Z-order layout: the written files must cover disjoint Morton ranges —
tight bounding boxes in BOTH dimensions — which is what lets parquet
min/max stats prune on either predicate after the rewrite."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from kinbaku_spark.sources.layout import ZBITS, morton2, write_zordered
from kinbaku_spark.sources.tables import load_table


def test_zordered_files_cover_disjoint_z_ranges(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="kb_zorder_")
    try:
        write_zordered(orders, f"{d}/orders", "o_custkey", "o_orderkey",
                       n_files=6)
        mask = (1 << ZBITS) - 1
        ranges = []
        for p in sorted(glob.glob(f"{d}/orders/part-*.parquet")):
            pdf = spark.read.parquet(p)
            z = morton2(
                F.col("o_custkey").cast("long").bitwiseAND(F.lit(mask)),
                F.col("o_orderkey").cast("long").bitwiseAND(F.lit(mask)),
            )
            row = pdf.agg(
                F.min(z).alias("lo"), F.max(z).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            if row["n"]:
                ranges.append((row["lo"], row["hi"]))
        assert len(ranges) >= 3, "expected several non-empty files"
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping z ranges: {(lo1, hi1)} vs {(lo2, _hi2)}"
        # total row count preserved
        n_total = spark.read.parquet(f"{d}/orders").count()
        assert n_total == orders.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
