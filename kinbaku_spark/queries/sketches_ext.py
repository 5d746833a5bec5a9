"""Probabilistic-structure operators, round 2: HyperLogLog distinct
estimation and Bloom-filter join pruning — both with EXACT DuckDB replay
(every bit of sketch state is integer arithmetic on the shared 60-bit md5
hash, functions/hashing.py), extending the KMV / count-min family in
temporal.py.

Why these matter at 100 TB:

- HLL is THE mergeable distinct sketch: 256 registers (2 KB) per group
  replace a count-distinct shuffle of the full key set. Here registers are
  built with one groupBy (map-side partial max per register), merged with
  an integer-exact power sum — the same algebra `approx_count_distinct`
  runs inside the JVM; this version is engine-portable and replayable.
- The Bloom build side is one scan of the dim + a 128-row bit_or
  aggregate; probing the fact side is a broadcast of 512 bytes of filter
  state. This is exactly what Spark's runtime row-level filtering
  (spark.sql.optimizer.runtime.bloomFilter.enabled) injects into big
  shuffle joins — materialized here as an explicit, oracle-checkable
  operator, reporting the confusion matrix + measured false-positive rate.

Determinism: register/bit state is pure integer math (shifts ≤ 52 bits,
no int64 overflow on either engine); doubles appear only in the final
estimate expression, written as the identical expression tree on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.operators.rank import prefix_sums
from kinbaku_spark.sources.tables import load_table

# -- HyperLogLog: 256 registers over the 60-bit md5 hash ----------------------

HLL_M = 256  # registers (b=8 index bits); 52 bits of rank material remain
# rho ranges 1..53; sum of 2^(53-rho) over 256 registers < 2^61: exact BIGINT
# numerator alpha_256 * m^2 * 2^53 folded to ONE double literal in Python and
# embedded in e-notation on both sides (a bare decimal literal is DECIMAL in
# DuckDB, and cross-engine constant folding would differ by an ulp)
_HLL_NUM = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * float(1 << 53)


def x_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l_orderkey per l_returnflag: exact count vs a 256-register
    HyperLogLog built from the shared md5 hash. Returns the exact count,
    the integer register power-sum (the full sketch state, checked
    exactly), and the raw HLL estimate with its relative error.

    One groupBy (flag, register) with map-side partial MAX — the sketch
    build never shuffles raw keys, only (group, 256) register rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    h = md5_long(F.col("l_orderkey").cast("string"))
    hashed = li.select(
        "l_returnflag",
        "l_orderkey",
        h.alias("h"),
    ).select(
        "l_returnflag",
        "l_orderkey",
        F.pmod(F.col("h"), F.lit(HLL_M)).cast("int").alias("idx"),
        F.expr("h div 256").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("w")))
    )
    regs = (
        hashed.select("l_returnflag", "idx", rho.alias("rho"))
        .groupBy("l_returnflag", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    sums = regs.groupBy("l_returnflag").agg(
        F.expr(
            "sum(shiftleft(CAST(1 AS BIGINT), 53 - rho))"
            " + (256 - count(1)) * shiftleft(CAST(1 AS BIGINT), 53)"
        ).alias("hll_sum"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_distinct")
    )
    est = F.expr(f"{_HLL_NUM!r} / CAST(hll_sum AS DOUBLE)")
    return (
        exact.join(sums, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            "hll_sum",
            est.alias("hll_est"),
            (
                (est - F.col("exact_distinct")) / F.col("exact_distinct")
            ).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


_H_ORD = sql_md5_long("CAST(l_orderkey AS VARCHAR)")

X_HLL_SQL = f"""
WITH hashed AS (
  SELECT l_returnflag, l_orderkey,
         CAST({_H_ORD} % 256 AS INTEGER) AS idx,
         {_H_ORD} // 256 AS w
  FROM lineitem
),
regs AS (
  SELECT l_returnflag, idx,
         MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
  FROM hashed GROUP BY 1, 2
),
sums AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - rho))
              + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT)
           AS hll_sum
  FROM regs GROUP BY 1
),
exact AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
  FROM lineitem GROUP BY 1
)
SELECT e.l_returnflag, e.exact_distinct, s.hll_sum,
       {_HLL_NUM!r} / CAST(s.hll_sum AS DOUBLE) AS hll_est,
       ({_HLL_NUM!r} / CAST(s.hll_sum AS DOUBLE)
        - e.exact_distinct) / e.exact_distinct AS rel_err
FROM exact e JOIN sums s ON s.l_returnflag = e.l_returnflag
ORDER BY e.l_returnflag
"""


# -- HLL merge across sources: the mergeability property, materialized --------

def x_hll_merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-`source` HLL sketches over distinct document texts, PLUS the
    union sketch obtained by max-merging the per-source registers — no
    rescan of the base data. Shared texts across sources make the merged
    exact-distinct strictly less than the per-source sum; the merged HLL
    tracks the union correctly because register max is the sketch's union
    operator. This is the property that lets 1000 executors (or 1000
    days of partial sketches) aggregate distincts without ever
    re-shuffling raw keys.

    Same register algebra as x_hll_distinct; the merge adds ONE extra
    256-row aggregation on sketch state only.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.col("text"))
    hashed = docs.select(
        "source",
        "text",
        F.pmod(h, F.lit(HLL_M)).cast("int").alias("idx"),
        (h.alias("h")).alias("h"),
    ).select(
        "source",
        "text",
        "idx",
        F.expr("h div 256").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("w")))
    )
    regs_src = (
        hashed.select("source", "idx", rho.alias("rho"))
        .groupBy("source", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    regs_all = regs_src.groupBy("idx").agg(F.max("rho").alias("rho")).select(
        F.lit("__ALL__").alias("source"), "idx", "rho"
    )
    regs = regs_src.unionByName(regs_all)
    sums = regs.groupBy("source").agg(
        F.expr(
            "sum(shiftleft(CAST(1 AS BIGINT), 53 - rho))"
            " + (256 - count(1)) * shiftleft(CAST(1 AS BIGINT), 53)"
        ).alias("hll_sum"),
    )
    exact_src = docs.groupBy("source").agg(
        F.count_distinct("text").alias("exact_distinct")
    )
    exact_all = docs.agg(
        F.count_distinct("text").alias("exact_distinct")
    ).select(F.lit("__ALL__").alias("source"), "exact_distinct")
    exact = exact_src.unionByName(exact_all)
    est = F.expr(f"{_HLL_NUM!r} / CAST(hll_sum AS DOUBLE)")
    return exact.join(sums, "source").select(
        "source",
        "exact_distinct",
        "hll_sum",
        est.alias("hll_est"),
        ((est - F.col("exact_distinct")) / F.col("exact_distinct")).alias(
            "rel_err"
        ),
    )


_H_TXT = sql_md5_long("text")

X_HLL_MERGE_SQL = f"""
WITH hashed AS (
  SELECT source, text,
         CAST({_H_TXT} % 256 AS INTEGER) AS idx,
         {_H_TXT} // 256 AS w
  FROM documents
),
regs_src AS (
  SELECT source, idx,
         MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
  FROM hashed GROUP BY 1, 2
),
regs AS (
  SELECT source, idx, rho FROM regs_src
  UNION ALL
  SELECT '__ALL__' AS source, idx, MAX(rho) AS rho FROM regs_src GROUP BY idx
),
sums AS (
  SELECT source,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - rho))
              + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT)
           AS hll_sum
  FROM regs GROUP BY 1
),
exact AS (
  SELECT source, COUNT(DISTINCT text) AS exact_distinct FROM documents GROUP BY 1
  UNION ALL
  SELECT '__ALL__', COUNT(DISTINCT text) FROM documents
)
SELECT e.source, e.exact_distinct, s.hll_sum,
       {_HLL_NUM!r} / CAST(s.hll_sum AS DOUBLE) AS hll_est,
       ({_HLL_NUM!r} / CAST(s.hll_sum AS DOUBLE)
        - e.exact_distinct) / e.exact_distinct AS rel_err
FROM exact e JOIN sums s ON s.source = e.source
"""


# -- Bloom-filter join pruning ------------------------------------------------

BLOOM_BITS = 4096  # m: 128 words x 32 bits = 512 bytes of filter state
BLOOM_K = 3
BLOOM_SEGMENT = "BUILDING"


def x_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4096-bit / 3-hash Bloom filter over BUILDING-segment
    custkeys, probe every order through it, and report the confusion
    matrix (predicted membership x actual membership) with the measured
    false-positive rate among true negatives.

    The filter is a 128-row (word, bits) table — at scale this is the
    512-byte runtime filter a 1000-executor join would broadcast to prune
    fact rows before the shuffle; rows 'predicted=false' are the rows the
    shuffle never sees. 32-bit words keep every shift in safe int64 range
    on both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def positions(key_col):
        return [
            F.pmod(
                md5_long(F.concat(F.lit(f"{i}:"), key_col.cast("string"))),
                F.lit(BLOOM_BITS),
            ).cast("int")
            for i in range(BLOOM_K)
        ]

    # members is read by the filter build AND the actual-membership
    # broadcast; words by THREE broadcast builds (one per hash). Unpinned,
    # each of those re-scanned customer from parquet — four full customer
    # scans per call at 100 TB for one 512-byte filter. Pin members lazily
    # (materialized as a side effect of the words build, then the actual-
    # flag broadcast reads the blocks) and words EAGERLY: its three
    # consumers are independent broadcast jobs that would race a lazy
    # pin's materialization and each recompute the aggregation (the
    # x_hist_quantile_accuracy measured precedent); eager = one 128-row
    # build job, every probe join reads cache.
    members = (
        cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select(F.col("c_custkey"))
        .localCheckpoint(eager=False)
    )
    words = (
        members.select(
            F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos")
        )
        .select(
            F.expr("pos div 32").cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), pos % 32)").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .localCheckpoint(eager=True)
    )

    probes = orders.select("o_orderkey", "o_custkey")
    for i, pos in enumerate(positions(F.col("o_custkey"))):
        probes = probes.withColumn(f"p{i}", pos)
    for i in range(BLOOM_K):
        wi = words.select(
            F.col("word").alias(f"word{i}"), F.col("bits").alias(f"bits{i}")
        )
        probes = probes.join(
            F.broadcast(wi),
            F.expr(f"p{i} div 32") == F.col(f"word{i}"),
            "left",
        ).withColumn(
            f"hit{i}",
            F.expr(
                f"coalesce((shiftright(bits{i}, p{i} % 32) & 1) = 1, false)"
            ),
        )
    predicted = F.col("hit0") & F.col("hit1") & F.col("hit2")
    actual_flag = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            F.broadcast(members.withColumn("is_member", F.lit(True))),
            orders.o_custkey == members.c_custkey,
            "left",
        )
        .select("o_orderkey", F.coalesce("is_member", F.lit(False)).alias("actual"))
    )
    return (
        probes.select("o_orderkey", predicted.alias("predicted"))
        .join(actual_flag, "o_orderkey")
        .groupBy("predicted", "actual")
        .agg(F.count(F.lit(1)).alias("orders"))
        .orderBy("predicted", "actual")
    )


def _bloom_pos_sql(i: int, expr: str) -> str:
    hashed = sql_md5_long(f"'{i}:' || CAST({expr} AS VARCHAR)")
    return f"CAST({hashed} % {BLOOM_BITS} AS INTEGER)"


X_BLOOM_SQL = f"""
WITH members AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
pos AS (
  SELECT {_bloom_pos_sql(0, 'c_custkey')} AS pos FROM members
  UNION ALL
  SELECT {_bloom_pos_sql(1, 'c_custkey')} FROM members
  UNION ALL
  SELECT {_bloom_pos_sql(2, 'c_custkey')} FROM members
),
words AS (
  SELECT CAST(pos // 32 AS INTEGER) AS word,
         bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  SELECT o_orderkey, o_custkey,
         {_bloom_pos_sql(0, 'o_custkey')} AS p0,
         {_bloom_pos_sql(1, 'o_custkey')} AS p1,
         {_bloom_pos_sql(2, 'o_custkey')} AS p2
  FROM orders
),
decided AS (
  SELECT p.o_orderkey,
         COALESCE(((w0.bits >> (p.p0 % 32)) & 1) = 1, FALSE)
         AND COALESCE(((w1.bits >> (p.p1 % 32)) & 1) = 1, FALSE)
         AND COALESCE(((w2.bits >> (p.p2 % 32)) & 1) = 1, FALSE) AS predicted,
         p.o_custkey IN (SELECT c_custkey FROM members) AS actual
  FROM probes p
  LEFT JOIN words w0 ON w0.word = p.p0 // 32
  LEFT JOIN words w1 ON w1.word = p.p1 // 32
  LEFT JOIN words w2 ON w2.word = p.p2 // 32
)
SELECT predicted, actual, COUNT(*) AS orders
FROM decided GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "x_hll_merge_sources": x_hll_merge_sources,
    "x_hll_distinct": x_hll_distinct,
    "x_bloom_prune": x_bloom_prune,
}
ORACLES = {
    "x_hll_merge_sources": X_HLL_MERGE_SQL,
    "x_hll_distinct": X_HLL_SQL,
    "x_bloom_prune": X_BLOOM_SQL,
}


# -- x_hist_quantile_accuracy: mergeable histogram quantile sketch vs exact ---
#
# The mergeable-quantile-sketch pattern (t-digest/KLL's job) in its
# simplest exactly-replayable form: a fixed 64-bucket equi-width histogram
# (bucket counts ADD across partitions/batches — that is the mergeability)
# answers p50/p90/p99 as the lower edge of the first bucket whose
# cumulative count reaches ceil(q·n/100); the exact answer comes from the
# distinct-value histogram (the winsorized-stats pattern — no global row
# sort). The error column is the sketch's resolution cost: width/est
# trade-off you size the bucket count with.
#
# Shuffle shape: one 64-group aggregate with map-side partials for the
# sketch; one value-domain-bounded distinct aggregate for the truth. At
# 100 TB you keep ONLY the sketch branch (64 rows per partition merge).

HQ_BUCKETS = 64
HQ_QS = [50, 90, 99]


def x_hist_quantile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order value estimated from a mergeable 64-bucket
    histogram vs the exact quantile, with the absolute error in cents —
    the accuracy readout that sizes a quantile sketch before trusting it
    corpus-wide."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    # ONE corpus pass: the distinct-value histogram (value-domain sized);
    # min/max/count and the 64-bucket histogram are exact rollups of it
    # (n = Σvn, bn = Σvn over the bucket's values — guide §1.2; the r07
    # work profile showed three separate orders scans). EAGER pin: three
    # independent broadcast stages consume it — left lazy they race the
    # materialization and each recomputes the corpus groupBy (re-measured
    # 20->26 jobs); eager = one serial build, every consumer reads cache.
    dv = (
        cents.groupBy("c")
        .agg(F.count(F.lit(1)).alias("vn"))
        .localCheckpoint(eager=True)
    )
    stats = dv.agg(
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
        F.sum("vn").cast("long").alias("n"),
    )
    hist = (
        dv.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(c - mn) * {HQ_BUCKETS} div (mx - mn + 1)").alias("bucket"),
            "vn",
        )
        .groupBy("bucket")
        .agg(F.sum("vn").cast("long").alias("bn"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bucket", F.sum("bn").over(wcum).alias("cum"))
    qs = spark.createDataFrame([(q,) for q in HQ_QS], "q_pct int")
    est = (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(stats))
        .filter(F.expr("cum >= (q_pct * n + 99) div 100"))
        .groupBy("q_pct")
        .agg(
            F.min("bucket").alias("b"),
            F.first("mn").alias("mn"),
            F.first("mx").alias("mx"),
        )
        .select(
            "q_pct",
            F.expr(
                f"mn + (b * (mx - mn + 1) + {HQ_BUCKETS - 1}) div {HQ_BUCKETS}"
            ).alias("est_cents"),
        )
    )
    # exact-quantile side: range-parallel prefix sums over the distinct-
    # value histogram (operators/rank.py) — the bucket-side window above
    # stays a plain window because its input is <= HQ_BUCKETS rows
    dcum = prefix_sums(dv, [F.col("c")], {"cum": "vn"}).select("c", "cum")
    # qs is a 3-row literal with NO stats (python createDataFrame -> RDD
    # scan), so an unhinted cross join against the value-domain-sized dcum
    # planned as CartesianProduct — re-reading dcum's shuffle once per
    # left partition (28 MB amplification, r07 per-job profile). Broadcast
    # the literal side: one streamed pass over dcum.
    exact = (
        dcum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(stats.select("n")))
        .filter(F.expr("cum >= (q_pct * n + 99) div 100"))
        .groupBy("q_pct")
        .agg(F.min("c").alias("exact_cents"))
    )
    return (
        # both sides are |HQ_QS| rows: broadcast beats the SMJ's two
        # exchanges + sorts the unhinted join planned
        est.join(F.broadcast(exact), "q_pct")
        .select(
            "q_pct",
            "est_cents",
            "exact_cents",
            F.abs(F.col("est_cents") - F.col("exact_cents")).alias(
                "abs_err_cents"
            ),
        )
        .orderBy("q_pct")
    )


X_HIST_QUANTILE_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
stats AS (SELECT MIN(c) AS mn, MAX(c) AS mx, CAST(COUNT(*) AS BIGINT) AS n
          FROM cents),
hist AS (
  SELECT ((c - mn) * {HQ_BUCKETS}) // (mx - mn + 1) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS bn
  FROM cents CROSS JOIN stats
  GROUP BY 1
),
cum AS (
  SELECT bucket, SUM(bn) OVER (ORDER BY bucket
                               ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
qs AS (SELECT unnest([{", ".join(str(q) for q in HQ_QS)}]) AS q_pct),
est AS (
  SELECT q.q_pct,
         s.mn + (MIN(c.bucket) * (s.mx - s.mn + 1) + {HQ_BUCKETS - 1})
                  // {HQ_BUCKETS} AS est_cents
  FROM qs q CROSS JOIN cum c CROSS JOIN stats s
  WHERE c.cum >= (q.q_pct * s.n + 99) // 100
  GROUP BY q.q_pct, s.mn, s.mx
),
dv AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS vn FROM cents GROUP BY c),
dcum AS (
  SELECT c, SUM(vn) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
  FROM dv
),
exact AS (
  SELECT q.q_pct, MIN(d.c) AS exact_cents
  FROM qs q CROSS JOIN dcum d CROSS JOIN stats s
  WHERE d.cum >= (q.q_pct * s.n + 99) // 100
  GROUP BY q.q_pct
)
SELECT e.q_pct, e.est_cents, x.exact_cents,
       ABS(e.est_cents - x.exact_cents) AS abs_err_cents
FROM est e JOIN exact x USING (q_pct)
ORDER BY e.q_pct
"""


QUERIES["x_hist_quantile_accuracy"] = x_hist_quantile_accuracy
ORACLES["x_hist_quantile_accuracy"] = X_HIST_QUANTILE_SQL
