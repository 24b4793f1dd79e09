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
from pyspark.errors import AnalysisException

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
    result schema (query_id, rank, neighbor_id, distance, ...). A caller
    that already computed `_qhash` (cached_search) passes it through
    instead of paying the %.17g-render + md5 pass a second time.
    """
    hashed = (
        queries
        if "_qhash" in queries.columns
        else queries.withColumn("_qhash", qvec_hash(F.col(qvec)))
    )
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
        try:
            prior_keys = spark.read.parquet(cache_path).select("_qhash").distinct()
        except AnalysisException:  # first run: the cache path doesn't exist
            # yet. ONLY path-not-found: a corrupt part file or storage fault
            # must fail fast here, not masquerade as an empty cache (it
            # would re-search everything, append duplicates, then throw
            # anyway on the post-append read)
            prior_keys = None

        miss_queries = (
            hashed.join(prior_keys, "_qhash", "left_anti")
            if prior_keys is not None
            else hashed
        )
        # The append below is the ONLY action in this function: the miss plan
        # stays lazy until the write executes it. An all-hit batch appends an
        # empty part file — harmless, and cheaper than probing emptiness with
        # a separate count job first. Dedup against concurrent writers is
        # append-only-idempotent: duplicate keys collapse on read.
        miss_results = search_with_query_dedup(
            miss_queries.select("query_id", "qvec", "_qhash"), search_fn
        )
        new_entries = (
            miss_results.join(
                F.broadcast(miss_queries.select("query_id", "_qhash")), "query_id"
            )
            .select("_qhash", "rank", "neighbor_id", "distance")
            .dropDuplicates(["_qhash", "rank"])
        )
        new_entries.write.mode("append").parquet(cache_path)

        # Serve EVERY query (hit or miss) from the now-complete results table:
        # one broadcast-able join instead of a hits/misses union, and the
        # search never re-executes when the caller materializes the result.
        table = spark.read.parquet(cache_path).dropDuplicates(["_qhash", "rank"])
        return hashed.join(table, "_qhash").select(
            "query_id", "rank", "neighbor_id", "distance"
        )
    finally:
        # The returned DataFrame re-derives _qhash lazily (a cheap map-side
        # hash over the query batch); holding the cached blocks past the write
        # would leak storage across repeated calls in one session.
        hashed.unpersist()
