"""API-layer rewrites (§4.1/§4.2) — the two 'optimizer rules' the engine owns.

PySpark cannot author Catalyst rules (JVM-only); both rewrites are logical,
pre-plan transformations in Python, which is exactly where they belong: they
change *what* is computed (dedup semantics, probe pruning), not how.

§4.1 query-dedup rewrite — replaces the reference's Redis result cache
(vector_search_cluster.py:206-211, 378-412). The reference's cache key is a
lossy 16-component fingerprint (quirk Q3: distinct queries can collide and
return WRONG results); ours hashes the exact vector. Within a batch:
  distinct (qvec_hash) -> search once per distinct vector -> re-join to the
  full query set. Identical results to searching every duplicate, with the
  search cost of the distinct set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscale_vector_search_spark.functions.hashing import qvec_hash


def search_with_query_dedup(
    queries: DataFrame,
    search_fn: Callable[[DataFrame], DataFrame],
    query_id: str = "query_id",
    qvec: str = "qvec",
) -> DataFrame:
    """K10 — run `search_fn` over the distinct query vectors only, then fan
    results back out to every original query_id.

    `search_fn` receives a DataFrame (query_id, qvec) whose query_id is the
    canonical (minimum) id per distinct vector, and must return the standard
    result schema (query_id, rank, neighbor_id, distance, ...).
    """
    hashed = queries.withColumn("_qhash", qvec_hash(F.col(qvec)))
    canonical = hashed.groupBy("_qhash").agg(
        F.min(query_id).alias(query_id), F.first(qvec).alias(qvec)
    )
    results = search_fn(canonical.select(query_id, qvec))
    # map canonical results back to all original query ids via the hash
    canon_ids = canonical.select("_qhash", F.col(query_id).alias("_canon_id"))
    fan_out = hashed.select(F.col(query_id).alias("_orig_id"), "_qhash").join(
        F.broadcast(canon_ids), "_qhash"
    )
    return (
        results.withColumnRenamed(query_id, "_canon_id")
        .join(F.broadcast(fan_out), "_canon_id")
        .drop("_canon_id", "_qhash")
        .withColumnRenamed("_orig_id", query_id)
    )
