#!/usr/bin/env python
"""Adjudicate the r11 q_ann10m_hnsw regression (VERDICT r11 ask #1).

Re-measures the 10M HNSW batch arm ADJACENT and UNCONTENDED: a fresh
process, nothing else on the box, the tier's own gemm/io probe run
immediately before and after the timed arm. r10 recorded 2.09 s
(per-gemm ~12.0 at the run-global gemm); r11 recorded 3.00 s (per-gemm
18.7) on a run whose 10M-tier probe showed 2.7x host contention AND a
round that touched the HNSW kernel (commit b5a6d56) — so the artifact
alone cannot separate drift from a real kernel cost. This script is the
separation instrument.

Usage: python tools/remeasure_hnsw10m.py [runs]
Prints one JSON line with gemm/io probes, hnsw_sec, per-gemm, recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ann_vectors, _idx_cache_dir, _quick_probe, _timed  # noqa: E402


def main() -> None:
    import numpy as np

    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.operators.ivf import recall_at_k
    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.plans.build import search_index
    from webscale_vector_search_spark.session import get_spark
    from webscale_vector_search_spark.sources.index_io import open_index

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cache_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    n, dim, ncl, seed, n_queries, k = 10_000_000, 64, 3162, 43, 200, 10

    spark = get_spark("wvss-remeasure-hnsw10m")
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (ncl, dim)).astype(np.float32)
    qids = np.arange(n_queries, dtype=np.int64) * (n // n_queries) + np.arange(n_queries)
    qvecs = _ann_vectors(qids, centers, seed)
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qvecs)],
        "query_id BIGINT, qvec ARRAY<FLOAT>",
    ).cache()
    queries.count()

    cfg = EngineConfig(index_type="HNSW", num_shards=16, ivf_max_list_factor=None)
    idx_dir = _idx_cache_dir(cache_dir, "HNSW", cfg, n)
    handle = open_index(spark, idx_dir)

    out: dict = {"idx_dir": idx_dir, "runs": runs}
    out["probe_pre"] = _quick_probe(cache_dir)
    t_open = time.perf_counter()
    hnsw_sec, hnsw_res = _timed(
        lambda: search_index(spark, handle, queries, k=k), warmups=2, runs=runs
    )
    out["wall_incl_warmup_sec"] = round(time.perf_counter() - t_open, 2)
    out["probe_post"] = _quick_probe(cache_dir)
    out["hnsw_sec"] = hnsw_sec
    gemm = min(out["probe_pre"]["gemm_sec"], out["probe_post"]["gemm_sec"])
    out["per_gemm"] = round(hnsw_sec / gemm, 2)
    if os.environ.get("REMEASURE_RECALL", "1") != "0":
        corpus = spark.read.parquet(os.path.join(cache_dir, f"corpus_n{n}"))
        exact = knn_pandas(corpus, queries, k=k)
        out["hnsw_recall"] = round(recall_at_k(hnsw_res, exact, k=k), 4)
    if os.environ.get("REMEASURE_EF128", "0") == "1":
        ef128_sec, _ = _timed(
            lambda: search_index(spark, handle, queries, k=k, ef_search=128),
            warmups=1, runs=2,
        )
        out["hnsw_ef128_sec"] = ef128_sec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
