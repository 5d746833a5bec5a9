"""Curation operators, batch 2: point near-duplicate probe and the
quality-band × duplication contingency matrix.

The probe is the dedup family's POINT-LOOKUP shape — the analog of the
reference's `node(key)` / `neighbors(key)` point reads (kinbaku
graph.py:856) applied to the MinHash index: given ONE document, return
its verified near-duplicates without an all-pairs pass. The matrix is
the curation diagnostic that tells you whether your duplicates are
concentrated in low-quality mass (drop them with the quality gate) or
spread across the quality range (dedup must run regardless).

Shuffle shapes (the 100 TB story):

- probe: the corpus band index is built once (at scale: the PERSISTED
  incremental index of x_dedup_incremental); the probe's ≤ B band keys
  broadcast onto it, so candidate generation touches only the probe's
  band buckets, and verification joins the ≤ |candidates| shingle sets
  against ONE broadcast probe set. Nothing pairs corpus-with-corpus.
- matrix: quality scoring rides the scan (pure column expressions); the
  dup flag is one hash groupBy + a hash-keyed join-back; the contingency
  is a ≤ (bands × 2)-group aggregate with map-side partials. Quality
  bands are FIXED ppm thresholds (map-only), not NTILE — a global
  tercile window would single-task sort the corpus.

Determinism: the probe is the smallest doc_id that has an exact
duplicate (computable identically in both engines); MinHash coefficients
and shingle hashing are the shared fixtures (functions/hashing.py);
quality in integer ppm; jaccard rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.functions.hashing import minhash_coeffs, sql_md5_long
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

PROBE_THRESHOLD = 0.5
PROBE_TOPK = 10
_N_HASHES, _N_BANDS, _BAND_ROWS = 32, 8, 4

# desync guard (ADVICE r02): x_dedup_probe's Spark plan probes the SHARED
# signature index (dedup_state, width extensions.N_HASHES) while its SQL
# oracle is generated from the local constants above — if either side
# changed independently they would silently diverge. The import is guarded
# (queries/__init__.py deliberately tolerates a missing extensions module)
# and the tripwire raises RuntimeError, not assert, so `python -O` cannot
# strip it: a DESYNC is a hard, loud failure; an ABSENT extensions module
# degrades gracefully like everywhere else.
def _check_banding_sync() -> None:
    try:
        from kinbaku_spark.queries import extensions as _ext
    except ImportError:
        return
    if (_N_HASHES, _N_BANDS, _BAND_ROWS) != (
        _ext.N_HASHES,
        _ext.N_BANDS,
        _ext.BAND_ROWS,
    ):
        raise RuntimeError(
            "curation_ext2 banding constants desynced from"
            " extensions/dedup_state"
        )


_check_banding_sync()
_DOC_HASH = 'md5(COALESCE(text, chr(0) || \'NULL\'))'


def _banded(sig: DataFrame) -> DataFrame:
    band_cols = [
        F.struct(
            F.lit(k).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{k * _BAND_ROWS + r}") for r in range(_BAND_ROWS)],
            ).alias("key"),
        )
        for k in range(_N_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


# -- x_dedup_probe: point near-dup lookup against the band index --------------

def x_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-duplicates of ONE probe document: band-bucket
    candidate lookup + exact-Jaccard verification against the single
    broadcast probe set. Returns (doc_id, jaccard) with jaccard >=
    `PROBE_THRESHOLD`, strongest first, top `PROBE_TOPK`.

    The probe FIXTURE (smallest doc_id that collides with another doc in
    any band — guaranteed to have candidates when near-dups exist) costs
    one band self-join; a production point-probe skips it (the caller
    has the id) and touches only the probe's own band buckets.
    """
    from kinbaku_spark.queries.dedup_state import shingle_sets, shingle_state

    sh, sig = shingle_state(spark, sf_dir)
    banded = _banded(sig)

    other = banded.select(
        F.col("doc_id").alias("doc_id_b"), "band", "key"
    )
    probe = (
        banded.join(other, ["band", "key"])
        .filter(F.col("doc_id") != F.col("doc_id_b"))
        .agg(F.min("doc_id").alias("probe_id"))
        .where(F.col("probe_id").isNotNull())
    )

    pb = banded.join(
        F.broadcast(probe), banded.doc_id == F.col("probe_id")
    ).select("band", "key")
    cand = (
        banded.join(F.broadcast(pb), ["band", "key"])
        .join(F.broadcast(probe), banded.doc_id != F.col("probe_id"))
        .select("doc_id")
        .distinct()
    )

    # the MATERIALIZED per-doc set index (dedup_state.shingle_sets) —
    # previously re-aggregated from the postings per probe
    sets = shingle_sets(spark, sf_dir)
    pset = sets.join(
        F.broadcast(probe), sets.doc_id == F.col("probe_id")
    ).select(F.col("hs").alias("hs_p"))
    return (
        cand.join(sets, "doc_id")
        .crossJoin(F.broadcast(pset))
        .select(
            "doc_id",
            F.size(F.array_intersect("hs", "hs_p")).alias("i"),
            F.size("hs").alias("n"),
            F.size("hs_p").alias("np"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("i") / (F.col("n") + F.col("np") - F.col("i")), 6),
        )
        .filter(F.col("jaccard") >= PROBE_THRESHOLD)
        .select("doc_id", "jaccard")
        .orderBy(F.desc("jaccard"), "doc_id")
        .limit(PROBE_TOPK)
    )


def _probe_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_shingle_cte

    coeffs = minhash_coeffs(_N_HASHES, 42)
    p = (1 << 31) - 1
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {p}) + {b}) % {p}) AS mh{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {k} AS band, {key} AS key FROM sig".format(
            k=k,
            key=" || '|' || ".join(
                f"CAST(mh{k * _BAND_ROWS + r} AS VARCHAR)"
                for r in range(_BAND_ROWS)
            ),
        )
        for k in range(_N_BANDS)
    )
    return f"""
WITH {_sql_shingle_cte(3)},
sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id),
bands AS (
  {band_selects}
),
pid AS (
  SELECT MIN(a.doc_id) AS probe_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id <> b.doc_id
),
pb AS (SELECT band, key FROM bands JOIN pid ON doc_id = probe_id),
cand AS (
  SELECT DISTINCT b.doc_id
  FROM bands b JOIN pb USING (band, key) CROSS JOIN pid
  WHERE b.doc_id <> pid.probe_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hx GROUP BY doc_id),
psize AS (SELECT n AS np FROM sizes JOIN pid ON doc_id = probe_id),
inter AS (
  SELECT b.doc_id, COUNT(*) AS i
  FROM cand c
  JOIN hx b ON b.doc_id = c.doc_id
  CROSS JOIN pid
  JOIN hx p ON p.doc_id = pid.probe_id AND p.h = b.h
  GROUP BY b.doc_id
)
SELECT i.doc_id, ROUND(i.i * 1.0 / (s.n + ps.np - i.i), 6) AS jaccard
FROM inter i JOIN sizes s USING (doc_id) CROSS JOIN psize ps
WHERE i.i * 1.0 / (s.n + ps.np - i.i) >= {PROBE_THRESHOLD}
ORDER BY jaccard DESC, doc_id
LIMIT {PROBE_TOPK}
"""


# -- x_quality_dup_matrix: quality band x duplication contingency -------------

QBAND_WIDTH_PPM = 250_000


def x_quality_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency of fixed quality bands (integer-ppm score div 250k,
    capped at band 3) × exact-duplicate status, with each cell's share of
    its band in ppm — tells you whether duplicates concentrate in
    low-quality mass (quality gate handles them) or not (dedup must run).
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("\x00NULL")))
    feats = docs.select(
        "doc_id",
        h.alias("__h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (F.length("text") - F.length(F.translate("text", "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", ""))).cast("long").alias("alpha"),
        (F.length("text") - F.length(F.translate("text", "0123456789", ""))).cast("long").alias("digits"),
    )
    scored = feats.select(
        "doc_id",
        "__h",
        F.expr(
            "(CASE WHEN n_chars > 0 THEN alpha * 1000000 div n_chars ELSE 0 END * 5"
            " + LEAST(n_tokens * 10000, 1000000) * 3"
            " + (1000000 - CASE WHEN n_chars > 0 THEN digits * 1000000 div n_chars ELSE 0 END) * 2"
            ") div 10"
        ).alias("score_ppm"),
    )
    dup = (
        scored.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("__h", (F.col("c") >= 2).alias("is_dup"))
    )
    banded = scored.join(dup, "__h").select(
        F.least(F.expr(f"score_ppm div {QBAND_WIDTH_PPM}"), F.lit(3))
        .cast("int")
        .alias("score_band"),
        "is_dup",
    )
    cells = banded.groupBy("score_band", "is_dup").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = cells.groupBy("score_band").agg(
        F.sum("n_docs").cast("long").alias("band_total")
    )
    return (
        cells.join(F.broadcast(totals), "score_band")
        .select(
            "score_band",
            "is_dup",
            "n_docs",
            F.expr(
                "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000"
                " div band_total AS BIGINT)"
            ).alias("band_share_ppm"),
        )
        .orderBy("score_band", "is_dup")
    )


X_QUALITY_DUP_SQL = rf"""
WITH feats AS (
  SELECT doc_id, {_DOC_HASH} AS h,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits
  FROM documents
),
scored AS (
  SELECT doc_id, h,
         (CASE WHEN n_chars > 0 THEN alpha * 1000000 // n_chars ELSE 0 END * 5
          + LEAST(n_tokens * 10000, 1000000) * 3
          + (1000000 - CASE WHEN n_chars > 0
                            THEN digits * 1000000 // n_chars ELSE 0 END) * 2
         ) // 10 AS score_ppm
  FROM feats
),
dup AS (SELECT h, COUNT(*) >= 2 AS is_dup FROM scored GROUP BY h),
banded AS (
  SELECT CAST(LEAST(s.score_ppm // {QBAND_WIDTH_PPM}, 3) AS INTEGER)
           AS score_band,
         d.is_dup
  FROM scored s JOIN dup d USING (h)
),
cells AS (
  SELECT score_band, is_dup, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM banded GROUP BY score_band, is_dup
),
totals AS (
  SELECT score_band, CAST(SUM(n_docs) AS BIGINT) AS band_total
  FROM cells GROUP BY score_band
)
SELECT c.score_band, c.is_dup, c.n_docs,
       CAST(CAST(c.n_docs AS HUGEINT) * 1000000 // t.band_total AS BIGINT)
         AS band_share_ppm
FROM cells c JOIN totals t USING (score_band)
ORDER BY c.score_band, c.is_dup
"""


QUERIES["x_dedup_probe"] = x_dedup_probe
ORACLES["x_dedup_probe"] = _probe_sql()
QUERIES["x_quality_dup_matrix"] = x_quality_dup_matrix
ORACLES["x_quality_dup_matrix"] = X_QUALITY_DUP_SQL


# -- x_linkage_agreement_lift: Fellegi-Sunter-style field weights --------------
#
# The u-probability side of probabilistic record linkage, computed WITHOUT
# enumerating a single pair: P(field agrees | pair in same nation block)
# vs P(field agrees | random pair) from contingency counts alone —
# Σ C(n_{block,value}, 2) over Σ C(N_block, 2), etc. At 100 TB every term
# is a small-dim groupBy with map-side partials; the pair space (10²³ at
# that scale) is never materialized. Fields whose block-agreement lift is
# high are informative matchers; lift ≈ 10⁶ means the field is
# independent of the block and adds no linkage evidence.

_LINK_FIELDS = [
    ("mktsegment", "c_mktsegment"),
    ("bal_sign", "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END"),
    ("bal_kbucket", "CAST(CAST(floor(c_acctbal) AS BIGINT) // 1000 AS VARCHAR)"),
]


def x_linkage_agreement_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field agreement rates among same-nation-block customer pairs
    vs all pairs, and the block lift (ppm of the overall rate) — the
    field-informativeness table a Fellegi-Sunter linker is seeded with.
    """
    cust = load_table(spark, sf_dir, "customer")
    spark_exprs = {
        "mktsegment": F.col("c_mktsegment"),
        "bal_sign": F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos"),
        "bal_kbucket": F.expr(
            "CAST(CAST(floor(c_acctbal) AS BIGINT) div 1000 AS STRING)"
        ),
    }
    d38 = "decimal(38,0)"
    pairs2 = lambda c: (F.col(c).cast(d38) * (F.col(c) - 1))  # noqa: E731

    # ONE customer pass for all fields: explode each row into its three
    # (field, value) pairs and aggregate by (field, nation, value) — the
    # r07 work profile showed the per-field form scanning customer 8
    # times through 31 serial single-task jobs (guide §1.2, §2.3: the
    # exploded rows carry only nation + two short strings, and every
    # per-field / per-block / per-nation aggregate below is an exact
    # integer rollup of this table)
    f0 = _LINK_FIELDS[0][0]
    base = cust.select(
        "c_nationkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(fname).alias("field"),
                        spark_exprs[fname].alias("v"),
                    )
                    for fname, _sql in _LINK_FIELDS
                ]
            )
        ).alias("fv"),
    ).select("c_nationkey", F.col("fv.field").alias("field"), F.col("fv.v").alias("v"))
    # (field, nation, value) counts: every downstream statistic is an
    # exact rollup; lazily pinned — four consumers inside one action
    g = (
        base.groupBy("field", "c_nationkey", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    gb = g.groupBy("field").agg(F.sum(pairs2("c")).alias("agree_block2"))
    cv = g.groupBy("field", "v").agg(F.sum("c").alias("c"))
    ga = cv.groupBy("field").agg(F.sum(pairs2("c")).alias("agree_all2"))
    # n = corpus rows = Σc over any one field's groups; nb = per-nation
    # rows likewise (exact identities — each field maps every row once)
    total = cv.filter(F.col("field") == f0).agg(
        F.sum("c").cast("long").alias("n")
    )
    block_tot = (
        g.filter(F.col("field") == f0)
        .groupBy("c_nationkey")
        .agg(F.sum("c").cast("long").alias("nb"))
        .agg(F.sum(F.expr("CAST(nb AS DECIMAL(38,0)) * (nb - 1)")).alias("bp2"))
    )
    return (
        gb.join(ga, "field")
        .crossJoin(F.broadcast(block_tot))
        .crossJoin(F.broadcast(total))
        .filter(
            (F.col("bp2") > 0)
            & (F.col("n") >= 2)
            & (F.col("agree_all2") > 0)
        )
        .select(
            "field",
            F.expr(
                "CAST(agree_block2 * 1000000 div bp2 AS BIGINT)"
            ).alias("block_agree_ppm"),
            F.expr(
                "CAST(agree_all2 * 1000000 div"
                " (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)"
            ).alias("overall_agree_ppm"),
            F.expr(
                "CAST((agree_block2 * 1000000 div bp2) * 1000000 div"
                " (agree_all2 * 1000000 div"
                "  (CAST(n AS DECIMAL(38,0)) * (n - 1))) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("field")
    )


def _linkage_sql() -> str:
    blocks = []
    for fname, sql_expr in _LINK_FIELDS:
        blocks.append(
            f"""
SELECT '{fname}' AS field,
       CAST(ab.agree_block2 * 1000000 // bt.bp2 AS BIGINT)
         AS block_agree_ppm,
       CAST(aa.agree_all2 * 1000000 // (CAST(t.n AS HUGEINT) * (t.n - 1))
            AS BIGINT) AS overall_agree_ppm,
       CAST((ab.agree_block2 * 1000000 // bt.bp2) * 1000000 //
            (aa.agree_all2 * 1000000 // (CAST(t.n AS HUGEINT) * (t.n - 1)))
            AS BIGINT) AS lift_ppm
FROM (
  SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS agree_block2 FROM (
    SELECT c_nationkey, {sql_expr} AS v, COUNT(*) AS c
    FROM customer GROUP BY 1, 2
  )
) ab
CROSS JOIN (
  SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS agree_all2 FROM (
    SELECT {sql_expr} AS v, COUNT(*) AS c FROM customer GROUP BY 1
  )
) aa
CROSS JOIN (
  SELECT SUM(CAST(nb AS HUGEINT) * (nb - 1)) AS bp2 FROM (
    SELECT c_nationkey, COUNT(*) AS nb FROM customer GROUP BY 1
  )
) bt
CROSS JOIN (SELECT COUNT(*) AS n FROM customer) t
WHERE bt.bp2 > 0 AND t.n >= 2 AND aa.agree_all2 > 0
"""
        )
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY field"


QUERIES["x_linkage_agreement_lift"] = x_linkage_agreement_lift
ORACLES["x_linkage_agreement_lift"] = _linkage_sql()
