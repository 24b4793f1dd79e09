from webscale_vector_search_spark.functions.distance import (
    cosine_distance,
    dot_product,
    sq_l2,
    sq_l2_sql,
)
from webscale_vector_search_spark.functions.hashing import (
    det_hash,
    det_hash_sql,
    fingerprint,
    pmod_shard,
)

__all__ = [
    "sq_l2",
    "sq_l2_sql",
    "cosine_distance",
    "dot_product",
    "det_hash",
    "det_hash_sql",
    "fingerprint",
    "pmod_shard",
]
