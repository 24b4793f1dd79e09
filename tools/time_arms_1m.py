#!/usr/bin/env python
"""Surgical A/B timer for the 1M ANN arms over the CACHED bench artifacts —
the same thunks bench._ann_tier times, minus builds/curve work. Used for the
r13 kernel A/B receipts (old vs new batch_topk_rows under equal box load).

Usage: python tools/time_arms_1m.py [runs=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ann_vectors, _idx_cache_dir, _quick_probe  # noqa: E402


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import numpy as np

    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.plans.build import search_index
    from webscale_vector_search_spark.session import get_spark
    from webscale_vector_search_spark.sources.index_io import open_index

    spark = get_spark("wvss-ab-1m")
    cache_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    n, ncl, seed, n_queries, k, nlist, nprobe = (
        1_000_000, 1000, 42, 1000, 10, 1000, 4
    )
    corpus_path = os.path.join(cache_dir, f"corpus_n{n}")
    corpus = spark.read.parquet(corpus_path)
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (ncl, 64)).astype(np.float32)
    q_ids = np.arange(n_queries, dtype=np.int64) * (n // n_queries) + np.arange(
        n_queries
    )
    Q = _ann_vectors(q_ids, centers, seed)
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, Q)],
        "query_id BIGINT, qvec ARRAY<FLOAT>",
    ).cache()
    queries.count()

    cfgs = {
        "IVF": EngineConfig(
            index_type="IVF", nlist=nlist, kmeans_sample_fraction=0.02,
            ivf_max_list_factor=None,
        ),
        "IVFPQ": EngineConfig(
            index_type="IVFPQ", nlist=nlist, pq_m=64, kmeans_sample_fraction=0.02,
            ivf_max_list_factor=None,
        ),
    }
    handles = {
        name: open_index(spark, _idx_cache_dir(cache_dir, name, cfg, n))
        for name, cfg in cfgs.items()
    }

    def timed(fn):
        fn().count()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    out = {"probe_pre": _quick_probe(cache_dir)}
    out["flat_sec"] = timed(lambda: knn_pandas(corpus, queries, k=k))
    out["ivf_sec"] = timed(
        lambda: search_index(spark, handles["IVF"], queries, k=k, nprobe=nprobe)
    )
    out["ivfpq_adc_sec"] = timed(
        lambda: search_index(
            spark, handles["IVFPQ"], queries, k=k, nprobe=nprobe, exact_refine=False
        )
    )
    out["probe_post"] = _quick_probe(cache_dir)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
