"""Size-gated broadcast hints (VERDICT r02 next-round #2).

An EXPLICIT ``F.broadcast`` hint is ALWAYS honored — AQE never demotes it —
so an ungated hint on a |V|-sized table (rank vectors, keep-lists, label
maps, degree tables) is a guaranteed executor OOM once |V| outgrows
executor memory (~10⁹ nodes). Every such hint in the iterative graph
queries goes through :func:`maybe_broadcast`: the hint is applied only
while the caller's known row bound is under the broadcast bound; past it,
the table is returned unhinted so the planner falls back to a partitioned
shuffle join (and AQE may still choose a broadcast from runtime stats —
a *demotable* decision, unlike the explicit hint).

Bounded-size tables (1-row aggregates, k-bounded centroid/threshold rows,
page-sized id lists) keep their unconditional hints — they cannot grow
with the data.

``KB_BROADCAST_BOUND`` overrides the default bound; tests set it to 0 to
lock the demoted (shuffle-join) plan shape for a large-|V| deployment
without materializing 5M-node fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

DEFAULT_BROADCAST_BOUND = 5_000_000


def broadcast_bound(default: int = DEFAULT_BROADCAST_BOUND) -> int:
    return int(os.environ.get("KB_BROADCAST_BOUND", default))


def maybe_broadcast(
    df: DataFrame, n_rows: int, default_bound: int = DEFAULT_BROADCAST_BOUND
) -> DataFrame:
    """``F.broadcast(df)`` while ``n_rows`` (the caller's bound on df's
    cardinality — typically |V|, never an estimate from a degree guess) is
    under the gate; the unhinted ``df`` otherwise."""
    return F.broadcast(df) if n_rows < broadcast_bound(default_bound) else df


def size_hint(n_rows: int, default_bound: int = DEFAULT_BROADCAST_BOUND):
    """Curried form for loop bodies: ``hint = size_hint(n)`` then
    ``hint(df)`` per join side — one gate decision, many sites.
    ``default_bound`` lets a site keep a tighter default (e.g. wide
    walker-state rows); KB_BROADCAST_BOUND still overrides it."""
    if n_rows < broadcast_bound(default_bound):
        return F.broadcast
    return lambda df: df
