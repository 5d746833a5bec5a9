"""Training-data pipeline operators, batch 5: shard-layout skew audit and
length-bucketed batching waste — the two write/batch planning readouts a
100 TB corpus run needs BEFORE committing to a partitionBy layout or a
batching strategy.

The reference (kerighan/kinbaku) has no corpus/write-planning surface at
all (SURVEY.md §2.4); these extend the LLM-data-curation family on the
driver's `documents` table.

Shuffle shapes (the 100 TB story):

- shard skew: ONE hash groupBy on the shard id (W groups, map-side partials
  collapse each partition to ≤ W rows before the exchange); the global
  totals ride in on a broadcast of the W-row aggregate. Nothing
  corpus-sized ever shuffles — this is exactly the audit you run before a
  `partitionBy(shard)` write so one hot shard doesn't straggle the job.
- packing waste: tokens-per-doc is a per-row projection (rides the scan);
  the ONE shuffle is the bucket groupBy (≤ PACK_BUCKETS groups). The waste
  readout tells you whether length-bucketed batching (bucket docs by
  length, pad to the bucket max) is close enough to perfect sequence
  packing (x_seq_packing) to skip the packing shuffle entirely.

Determinism: integer counts/bytes end-to-end; shares and waste in integer
ppm via wide-integer div (Spark DECIMAL(38,0) == DuckDB HUGEINT); shard
assignment uses the shared 60-bit md5 hash (functions/hashing.py), never
engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_shard_skew_audit: hash-shard balance before a partitioned write --------

N_SHARDS = 16


def x_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard document/byte/token totals under md5(doc_id) mod
    `N_SHARDS` hash sharding, with each shard's byte share and its skew
    vs the perfectly-even share, in integer ppm — the straggler audit a
    1000-executor `partitionBy(shard)` write plan is judged by.

    skew_ppm = shard_bytes · N_SHARDS · 10⁶ div total_bytes (10⁶ = even).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        (md5_long(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        F.octet_length("text").cast("long").alias("bytes"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("tokens"),
    )
    shards = per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("bytes").cast("long").alias("bytes_total"),
        F.sum("tokens").cast("long").alias("tokens_total"),
    )
    total = shards.agg(
        F.sum(F.col("bytes_total").cast("decimal(38,0)")).alias("grand_bytes")
    )
    return (
        shards.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "docs",
            "bytes_total",
            "tokens_total",
            F.expr(
                "CAST(CAST(bytes_total AS DECIMAL(38,0)) * 1000000"
                " div grand_bytes AS BIGINT)"
            ).alias("byte_share_ppm"),
            F.expr(
                f"CAST(CAST(bytes_total AS DECIMAL(38,0)) * {N_SHARDS} * 1000000"
                " div grand_bytes AS BIGINT)"
            ).alias("skew_ppm"),
        )
        .orderBy("shard")
    )


X_SHARD_SKEW_SQL = f"""
WITH per_doc AS (
  SELECT {sql_md5_long("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
         CAST(strlen(text) AS BIGINT) AS bytes,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tokens
  FROM documents
),
shards AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(bytes) AS BIGINT) AS bytes_total,
         CAST(SUM(tokens) AS BIGINT) AS tokens_total
  FROM per_doc GROUP BY shard
),
total AS (SELECT CAST(SUM(bytes_total) AS HUGEINT) AS grand_bytes FROM shards)
SELECT s.shard, s.docs, s.bytes_total, s.tokens_total,
       CAST(CAST(s.bytes_total AS HUGEINT) * 1000000 // t.grand_bytes
            AS BIGINT) AS byte_share_ppm,
       CAST(CAST(s.bytes_total AS HUGEINT) * {N_SHARDS} * 1000000
            // t.grand_bytes AS BIGINT) AS skew_ppm
FROM shards s CROSS JOIN total t
ORDER BY s.shard
"""


# -- x_packing_waste: length-bucketed batching pad-token waste -----------------

PACK_BUCKET_WIDTH = 16


def x_packing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-token waste under length-bucketed batching: docs are bucketed
    by token count (width `PACK_BUCKET_WIDTH`), every doc in a bucket is
    padded to the bucket's observed max length, and the wasted-pad share
    is reported per bucket in integer ppm — the readout that decides
    whether bucketed batching is close enough to true sequence packing
    (x_seq_packing) to skip the packing shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("tokens")
    )
    bucketed = toks.select(
        (F.col("tokens") / PACK_BUCKET_WIDTH).cast("long").alias("bucket"),
        "tokens",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("tokens").cast("long").alias("tokens_total"),
            F.max("tokens").alias("bucket_max"),
        )
        .select(
            "bucket",
            "docs",
            "tokens_total",
            "bucket_max",
            (F.col("bucket_max") * F.col("docs")).cast("long").alias("padded_total"),
            F.expr(
                "CAST((CAST(bucket_max AS DECIMAL(38,0)) * docs - tokens_total)"
                " * 1000000 div (CAST(bucket_max AS DECIMAL(38,0)) * docs)"
                " AS BIGINT)"
            ).alias("waste_ppm"),
        )
        .orderBy("bucket")
    )


X_PACKING_WASTE_SQL = f"""
WITH toks AS (
  SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tokens
  FROM documents
),
bucketed AS (
  SELECT CAST(tokens // {PACK_BUCKET_WIDTH} AS BIGINT) AS bucket, tokens
  FROM toks
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(tokens) AS BIGINT) AS tokens_total,
       CAST(MAX(tokens) AS BIGINT) AS bucket_max,
       CAST(MAX(tokens) * COUNT(*) AS BIGINT) AS padded_total,
       CAST((CAST(MAX(tokens) AS HUGEINT) * COUNT(*) - SUM(tokens)) * 1000000
            // (CAST(MAX(tokens) AS HUGEINT) * COUNT(*)) AS BIGINT)
         AS waste_ppm
FROM bucketed GROUP BY bucket
ORDER BY bucket
"""


QUERIES["x_shard_skew_audit"] = x_shard_skew_audit
ORACLES["x_shard_skew_audit"] = X_SHARD_SKEW_SQL
QUERIES["x_packing_waste"] = x_packing_waste
ORACLES["x_packing_waste"] = X_PACKING_WASTE_SQL
