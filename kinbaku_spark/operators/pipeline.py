"""End-to-end corpus curation — the composed LLM-training-data pipeline:

    raw docs -> quality filter -> MinHash-LSH near-dup clustering ->
    keep one representative per cluster -> curated corpus + stats

Every stage is an operator from this package, so the whole pipeline is one
declarative DataFrame graph: Catalyst sees through the composition (filters
push into the scan feeding the shingle explode; the cluster join is a
semi-join). The DuckDB oracle replays the identical composition.

Scale: quality filtering prunes BEFORE shingling (the expensive stage);
clustering runs only on near-dup pairs (tiny vs corpus); the final
representative selection is one semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kinbaku_spark.operators.dedup import duplicate_clusters, minhash_near_duplicates
from kinbaku_spark.operators.text import text_quality


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.72,
    dup_threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    sig: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Returns the curated corpus: quality-filtered, near-dup-collapsed
    (cluster representative = min doc id), with the quality score attached.

    sh/sig: optional full-corpus shingle/signature index tables
    (queries/dedup_state.py) — both are per-doc, so semi-joining them to
    the quality-filtered ids equals re-deriving them on the filtered
    corpus, and the tokenize+hash+min-agg pass is skipped entirely.
    sets: the matching per-doc set table (dedup_state.shingle_sets);
    needs no filtering — verification joins it BY candidate id, and a
    doc's array is the same either side of the quality filter.
    """
    quality = text_quality(docs).select(id_col, "quality_score")
    filtered = docs.join(
        quality.filter(F.col("quality_score") >= min_quality), id_col
    ).localCheckpoint(eager=True)  # 3 consumers: shingles, signatures, output
    if (sh is None) != (sig is None):
        raise ValueError("curate_corpus: pass both sh and sig or neither")
    if sh is not None and sig is not None:
        ids = filtered.select(id_col)
        sh = sh.join(ids, id_col, "left_semi")
        sig = sig.join(ids, id_col, "left_semi")
    pairs = minhash_near_duplicates(
        filtered, threshold=dup_threshold, n_hashes=n_hashes, bands=bands,
        sh=sh, sig=sig, sets=sets if sh is not None else None,
    )
    clusters = duplicate_clusters(filtered, pairs, id_col)
    representatives = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(
        id_col
    )
    return filtered.join(representatives, id_col, "left_semi").select(
        id_col, "lang", "source", "quality_score"
    )


# ---------------------------------------------------------------------------
# Deterministic splits / sampling / packing / contamination — the rest of the
# training-data plumbing. All pure column expressions (no UDFs), all
# replayable in SQL, all hash-based so re-runs and backfills are stable.
# ---------------------------------------------------------------------------

from kinbaku_spark.functions.hashing import md5_long  # noqa: E402
from kinbaku_spark.functions.textfns import shingle_array  # noqa: E402
from kinbaku_spark.operators.text import TOKEN_PATTERN  # noqa: E402


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 1000,
    split_weights: tuple[int, int, int] = (8, 1, 1),
) -> DataFrame:
    """Deterministic per-stratum downsampling + train/val/test assignment.

    Membership is a pure function of the id (bucket = md5-hash(id) mod
    n_buckets < rate·n_buckets), so the sample is reproducible across runs,
    engines, and partitionings — the property `df.sample()` does NOT give.
    The split uses an independently salted hash so it is uncorrelated with
    the sampling decision. No shuffle at all: a scan-side filter at 100 TB.
    """
    bucket = md5_long(F.col(id_col).cast("string")) % n_buckets
    cut = None
    for k, r in rates.items():
        c = F.when(F.col(strata_col) == k, F.lit(int(r * n_buckets)))
        cut = c if cut is None else cut.when(
            F.col(strata_col) == k, F.lit(int(r * n_buckets))
        )
    cut = cut.otherwise(F.lit(int(default_rate * n_buckets)))
    t_train, t_val, _ = split_weights
    denom = sum(split_weights)
    sbucket = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(":split"))) % denom
    split = (
        F.when(sbucket < t_train, F.lit("train"))
        .when(sbucket < t_train + t_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(strata_col),
            bucket.cast("long").alias("bucket"),
            split.alias("split"),
        )
        .filter(F.col("bucket") < cut)
    )


_TWO_60 = float(1 << 60)  # exact: power of two


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, top-k of
    Efraimidis–Spirakis priorities: key_i = ln(u_i) / w_i with u_i a
    uniform derived from md5(id) — item i wins with probability
    proportional to w_i, and the whole draw is a pure function of the
    ids (reproducible across runs, engines, and partitionings, which
    `df.sample()` is not — essential for training-data lineage).

    Scale: single pass, no shuffle of the data — orderBy+limit compiles
    to TakeOrderedAndProject (per-partition top-k, merge k·n_partitions
    rows on one reducer), and E-S priorities are mergeable so a tree
    reduction covers any cluster size. ln() may differ by 1 ulp across
    engines, but adjacent priorities are ~1e-9 apart at this scale —
    6 orders of magnitude above ulp noise (keys stay internal; output
    is integer columns only).
    """
    u = (md5_long(F.col(id_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(_TWO_60)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        docs.select(id_col, weight_col, key.alias("_es_key"))
        .orderBy(F.desc("_es_key"), id_col)
        .limit(k)
        .select(id_col, weight_col)
        .orderBy(id_col)
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget chunking: stream each shard's docs in id order and cut a
    new chunk whenever the running token total crosses the capacity —
    sequence-packing's deterministic, window-expressible form (chunk =
    floor(exclusive-running-sum / capacity)).

    Packing is per-shard BY DESIGN: a global order would serialize the whole
    corpus through one partition, while per-shard packing is one window over
    the shard partitioning — embarrassingly parallel at 100 TB (shards are
    the unit real pretraining pipelines pack within anyway). Integer token
    counts -> exact in any engine.
    """
    from pyspark.sql import Window

    tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_chunk = docs.select(
        F.col(shard_col),
        F.col(id_col),
        tokens.alias("__t"),
    ).withColumn(
        "chunk_id",
        F.floor(F.coalesce(F.sum("__t").over(w), F.lit(0)) / capacity).cast("long"),
    )
    return (
        with_chunk.groupBy(shard_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").cast("long").alias("sum_tokens"),
        )
        .orderBy(shard_col, "chunk_id")
    )


def cross_split_contamination(
    docs: DataFrame,
    train_sources: list[str],
    eval_sources: list[str],
    shingle_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Benchmark-contamination check: training docs sharing at least one
    word ``shingle_n``-gram with any eval doc, with the count of distinct
    eval docs hit and distinct shared grams.

    Plan shape: both sides explode to (doc, gram-hash) and equi-join on the
    hash — the inverted-index join. The eval side is tiny relative to the
    corpus, so Spark broadcasts it: the training side never shuffles, which
    is what makes this a single-pass scan at 100 TB (the standard scale-out
    alternative is a Bloom filter over eval grams; the broadcast equi-join
    IS that check, exact).
    """
    grams = F.explode(shingle_array(text_col, shingle_n)).alias("g")

    def side(pred):
        return (
            docs.filter(pred)
            .select(F.col(id_col), grams)
            .select(id_col, md5_long(F.col("g")).alias("h"))
        )

    train = side(F.col(source_col).isin(train_sources))
    ev = (
        side(F.col(source_col).isin(eval_sources))
        .withColumnRenamed(id_col, "eval_doc_id")
        .distinct()
    )
    return (
        train.join(F.broadcast(ev), "h")
        .groupBy(id_col)
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.countDistinct("h").alias("n_shared_grams"),
        )
        .orderBy(id_col)
    )


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Per-column data profiling: non-null count, exact distinct count,
    min/max — the quality gate run before any training pipeline ingests a
    new table.

    Plan shape: one groupBy-on-value pass PER COLUMN, then a one-row
    summary per column, unioned. With columnar storage each pass scans
    only that column's bytes, and its shuffle carries one row per distinct
    value — measured 7x faster than the single-aggregation COUNT DISTINCT
    form, whose expand multiplies every input row by the number of
    profiled columns before one giant shuffle. Min/max are emitted in
    typed columns (double vs string) — no double->string casts whose
    formatting differs across engines.
    """
    import functools

    n_rows_df = df.agg(F.count(F.lit(1)).alias("n_rows"))
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    parts = []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        per_value = df.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        summary = per_value.agg(
            F.coalesce(
                F.sum(F.when(F.col("v").isNotNull(), F.col("cnt"))), F.lit(0)
            ).alias("n_nonnull"),
            F.count("v").alias("n_distinct"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        parts.append(
            summary.select(
                F.lit(c).alias("col"),
                "n_nonnull",
                "n_distinct",
                (F.col("mn").cast("double") if is_num else null_d).alias("min_num"),
                (F.col("mx").cast("double") if is_num else null_d).alias("max_num"),
                (null_s if is_num else F.col("mn").cast("string")).alias("min_str"),
                (null_s if is_num else F.col("mx").cast("string")).alias("max_str"),
            )
        )
    long_form = functools.reduce(lambda x, y: x.unionByName(y), parts)
    return (
        long_form.crossJoin(F.broadcast(n_rows_df))
        .select(
            "col", "n_rows", "n_nonnull", "n_distinct",
            "min_num", "max_num", "min_str", "max_str",
        )
        .orderBy("col")
    )
