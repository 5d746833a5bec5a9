"""Cross-engine deterministic hashing.

The reference plugs CityHash32/mmh3 (graph.py:82-90); neither exists in both
Spark and DuckDB, so the engine's stable content hash is the first 15 hex
chars of md5 read as a 60-bit integer — bit-identical in Spark
(`conv(substring(md5(x),1,15),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`). Used by MinHash/SimHash/
fingerprint operators so the DuckDB oracle can replay them EXACTLY.

MinHash uses universal hashing h_j(x) = (a_j*x + b_j) mod P with
P = 2^31 - 1 (products stay < 2^62: no int64 overflow in either engine) and
(a_j, b_j) drawn from a fixed seed, rendered identically into Spark columns
and SQL text.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, functions as F

HASH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31-1


def md5_long(col: Column | str) -> Column:
    """60-bit non-negative content hash (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """The same 60-bit hash in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_coeffs(n_hashes: int = 32, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, HASH_PRIME), rng.randrange(0, HASH_PRIME))
        for _ in range(n_hashes)
    ]
