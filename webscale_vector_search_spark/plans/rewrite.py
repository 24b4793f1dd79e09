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


def cached_search(
    spark,
    cache_dir: str,
    queries: DataFrame,
    search_fn: Callable[[DataFrame], DataFrame],
    k: int,
    index_version: str = "v0",
) -> DataFrame:
    """S8 — the cross-job results table that replaces the reference's Redis
    cache (vector_search_cluster.py:72-74, 389-412), with exact keys.

    Key = (qhash, k, index_version): the reference's TTL expiry becomes
    explicit index versioning (results are immutable for a given index), and
    its lossy fingerprint key (quirk Q3) becomes the exact vector hash.
    Hits are served from the parquet results table; misses run `search_fn`
    once per distinct vector and are appended for the next job.

    Returns results for every input query (hit or miss) in the standard
    (query_id, rank, neighbor_id, distance) schema.
    """
    import os

    hashed = queries.withColumn("_qhash", qvec_hash(F.col("qvec"))).cache()
    cache_path = os.path.join(cache_dir, f"k={k}", f"index={index_version}")
    try:
        cached = spark.read.parquet(cache_path)
    except Exception:  # first run: empty cache
        cached = None

    if cached is not None:
        # concurrent writers may have appended the same key twice; collapse
        # duplicates on read (append-only idempotency lives HERE, not on write)
        cached = cached.dropDuplicates(["_qhash", "rank"])
        hits = hashed.join(cached, "_qhash").select(
            "query_id", "rank", "neighbor_id", "distance"
        )
        miss_queries = hashed.join(cached.select("_qhash").distinct(), "_qhash", "left_anti")
    else:
        hits = None
        miss_queries = hashed

    miss_results = None
    if miss_queries.limit(1).count() > 0:
        miss_results = search_with_query_dedup(
            miss_queries.select("query_id", "qvec"), search_fn
        )
        # persist the new entries keyed by qhash (dedup against concurrent
        # writers is append-only-idempotent: duplicate keys collapse on read)
        new_entries = (
            miss_results.join(
                F.broadcast(miss_queries.select("query_id", "_qhash")), "query_id"
            )
            .select("_qhash", "rank", "neighbor_id", "distance")
            .dropDuplicates(["_qhash", "rank"])
        )
        new_entries.write.mode("append").parquet(cache_path)

    if hits is not None and miss_results is not None:
        return hits.unionByName(miss_results.select("query_id", "rank", "neighbor_id", "distance"))
    if miss_results is not None:
        return miss_results.select("query_id", "rank", "neighbor_id", "distance")
    return hits
