from kinbaku_spark.functions.hashing import (
    HASH_PRIME,
    md5_long,
    minhash_coeffs,
    sql_md5_long,
)
from kinbaku_spark.functions.textfns import shingle_array, sql_shingle_array

__all__ = [
    "HASH_PRIME",
    "md5_long",
    "minhash_coeffs",
    "sql_md5_long",
    "shingle_array",
    "sql_shingle_array",
]
