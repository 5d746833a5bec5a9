"""Skew-mitigation utilities.

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py); these helpers
cover the two places AQE can't: skewed AGGREGATION keys (a hot group lands
on one reducer) and skewed join keys against a non-splittable build side.

The reference's analogue is the 200k-out-degree hub it tolerates by pure
sequential scan (examples/one_node_many_neighbors.py) — here a hub key is a
hot partition, so we salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(df: DataFrame, key_cols: list[str], salt: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: phase 1 groups on (key, salt) so a
    hot key spreads over ``salt`` reducers; phase 2 re-aggregates the
    partials. Identical result to a direct groupBy().count()."""
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias("count"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase sum (decimal-exact, so salting never changes the result)."""
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(F.col(sum_col).cast("decimal(28,6)")).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__partial").cast("double").alias(f"sum_{sum_col}")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Skewed fact⋈dim equi-join: salt the fact side, replicate the dim side
    ``salt`` times, join on (key, salt). Use when the dim is too big to
    broadcast and the fact keys are skewed beyond AQE's split sizes."""
    salted_facts = facts.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_facts.join(replicated, [key, "__salt"]).drop("__salt")
