#!/usr/bin/env python
"""Isolated fresh-process measurement of a position-sensitive FLAT arm.

VERDICT r12 "What's wrong #1": twice the official record carried a FLAT/HNSW
number that a post-hoc adjudication tool (fresh process, min-of-N, adjacent
probes) later corrected — the protocol belongs IN the bench. bench.py runs
this script as a SUBPROCESS for the arms SCALE.md names position-sensitive
(the 1M FLAT brute-force GEMM foremost): a fresh python + fresh JVM, nothing
resident from the preceding ~40 min of tiers, min-of-N with probes bracketing
the timed runs. Prints ONE JSON line:

  {"flat_sec": best, "runs": [...], "probe_pre": {...}, "probe_post": {...}}

Usage: python tools/isolated_flat.py CORPUS_PATH N NCL SEED N_QUERIES K [RUNS]
(the query construction reproduces bench._ann_tier's deterministic formula
bit-exactly — same splitmix generator, same qid spacing)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    corpus_path = sys.argv[1]
    n, ncl, seed, n_queries, k = (int(a) for a in sys.argv[2:7])
    # min-of-5 with TWO warm-ups: the arm's warm-up tail is long in a fresh
    # JVM (measured runs [9.9, 4.5, 3.8, 4.8, 3.7, 4.2] — the first timed
    # run after one warm-up still reads ~2.5x the floor)
    runs = int(sys.argv[7]) if len(sys.argv) > 7 else 5

    from bench import _ann_vectors, _quick_probe
    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-isolated-flat")
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (ncl, 64)).astype(np.float32)
    qids = (
        np.arange(n_queries, dtype=np.int64) * (n // n_queries)
        + np.arange(n_queries)
    )
    qvecs = _ann_vectors(qids, centers, seed)
    corpus = spark.read.parquet(corpus_path)
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qvecs)],
        "query_id BIGINT, qvec ARRAY<FLOAT>",
    ).cache()
    queries.count()

    io_dir = os.path.dirname(corpus_path) or "/tmp"
    probe_pre = _quick_probe(io_dir)
    for _ in range(2):  # warm-ups: JIT + scan caches + python-worker pool
        knn_pandas(corpus, queries, k=k).count()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        knn_pandas(corpus, queries, k=k).count()
        times.append(round(time.perf_counter() - t0, 4))
    probe_post = _quick_probe(io_dir)
    print(
        json.dumps(
            {
                "flat_sec": min(times),
                "runs": times,
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )


if __name__ == "__main__":
    main()
