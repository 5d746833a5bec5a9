"""Property-based differential tests: the distributed Gram kernel and the
salted aggregations vs direct in-Python computation on random inputs —
the randomized-differential strategy (SURVEY.md §5) applied to the
linear-algebra and skew surfaces.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from kinbaku_spark.operators.similarity import embedding_gram
from kinbaku_spark.operators.skew import salted_agg, salted_count

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

vec_strategy = st.lists(
    st.floats(
        min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=4,
    max_size=4,
)
corpus_strategy = st.lists(vec_strategy, min_size=1, max_size=12)


@given(corpus=corpus_strategy)
@SETTINGS
def test_embedding_gram_matches_numpy(spark, corpus):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["i"], r["j"]): r["dot_q"]
        for r in embedding_gram(df, "embedding").collect()
    }
    # independent reference: quantize THROUGH float32 (the column type) the
    # same way the kernel reads Arrow batches, then exact integer products
    m = np.array(corpus, dtype=np.float32).astype(np.float64)
    q = np.floor(m * 1_000_000).astype(object)  # python ints: no overflow
    d = q.shape[1]
    want = {
        (i + 1, j + 1): int(sum(q[r, i] * q[r, j] for r in range(q.shape[0])))
        for i in range(d)
        for j in range(i, d)
    }
    assert got == want


rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 1000)),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@SETTINGS
def test_salted_aggs_match_direct(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    got_counts = {
        r["k"]: r["count"] for r in salted_count(df, ["k"], salt=4).collect()
    }
    got_sums = {
        r["k"]: r["sum_v"] for r in salted_agg(df, ["k"], "v", salt=4).collect()
    }
    want_counts: dict[str, int] = {}
    want_sums: dict[str, float] = {}
    for k, v in rows:
        want_counts[k] = want_counts.get(k, 0) + 1
        want_sums[k] = want_sums.get(k, 0) + v
    assert got_counts == want_counts
    assert got_sums == {k: float(v) for k, v in want_sums.items()}
