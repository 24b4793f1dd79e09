#!/usr/bin/env python
"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once to warm the JVM/scan caches and once timed; the
timed run materializes results via count() (no driver-side collect of data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_knn_exact",
    "q_knn_partial_final",
    "q_pricing",
    "q_neardup_bands",
    "q_json_events",
    "q_metrics",
]


def _knn_fast(spark, sf_dir):
    """Bench-only: the numpy Arrow kernel for exact kNN (same results as
    q_knn_exact; the SQL form stays canonical for oracle checks)."""
    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.sources.fixtures import load_table, queries_from_embeddings

    corpus = load_table(spark, "embeddings", sf_dir)
    queries = queries_from_embeddings(spark, sf_dir, 20)
    return knn_pandas(corpus, queries, k=10)


EXTRA = {"q_knn_exact_fast": _knn_fast}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from webscale_vector_search_spark.queries import QUERIES
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-bench")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    timings: dict[str, float] = {}
    for name in HEADLINE + list(EXTRA):
        fn = QUERIES.get(name) or EXTRA[name]
        fn(spark, sf_dir).count()  # warm-up: JIT, file listing, broadcast
        best = float("inf")
        for _ in range(3):  # min-of-3: local-mode timings are noisy
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # value = the headline set only; EXTRA entries (fast-kernel variant,
    # full-corpus LSH) are reported per-query for trend tracking
    total = round(sum(timings[n] for n in HEADLINE), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


def _neardup_full(spark, sf_dir):
    """Bench-only: LSH banding over the FULL documents table (the declared
    q_neardup_bands caps at 100 docs for oracle speed; this scales with sf)."""
    from webscale_vector_search_spark.operators.dedup import band_signatures
    from webscale_vector_search_spark.sources.fixtures import load_table

    docs = load_table(spark, "documents", sf_dir)
    return band_signatures(docs)


EXTRA["q_neardup_full"] = _neardup_full


def _knn_batch_all(spark, sf_dir):
    """Bench-only: batch throughput — every embedding queries the whole
    corpus (numpy kernel). The reference's headline is QPS; the Spark-native
    analog is query-batch throughput: rows/sec here = QPS at this sf.
    (The SQL kernel on the same shape measures 55x slower — why the numpy
    kernel is the batch path.)"""
    from pyspark.sql import functions as F

    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.sources.fixtures import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    return knn_pandas(emb, q, k=10)


EXTRA["q_knn_batch_all_fast"] = _knn_batch_all


if __name__ == "__main__":
    main()
