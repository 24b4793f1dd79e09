#!/usr/bin/env python
"""One-time cache warm-up for the 10M-tier HNSW and LOPQ bench arms.

bench.py keys index cache dirs on md5(repr(EngineConfig)) (_idx_cache_dir),
so the configs here MUST stay textually identical to the `builds` dict in
bench._ann_10m — this script only pre-pays the build wall-clock so a timed
bench run finds the artifacts warm. Safe to re-run: existing builds are
skipped by the same sidecar-exists check bench uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _gen_corpus, _idx_cache_dir  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.plans.build import build_index
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-prebuild-10m")
    cache_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    n, dim, ncl, seed = 10_000_000, 64, 3162, 43
    nlist = 3162
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (ncl, dim)).astype(np.float32)

    corpus_path = os.path.join(cache_dir, f"corpus_n{n}")
    _gen_corpus(spark, n, centers, seed, corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # mirror bench._ann_10m exactly (cache-key-sensitive)
    builds = {
        "ivfpq_hc": EngineConfig(
            index_type="IVFPQ", nlist=nlist, pq_m=32, kmeans_sample_fraction=0.02,
            pq_local_codebooks=True, ivf_max_list_factor=None,
        ),
        "hnsw": EngineConfig(index_type="HNSW", num_shards=16, ivf_max_list_factor=None),
    }
    # reuse the coarse centroids the existing uncapped IVF build trained
    ivf_cfg = EngineConfig(
        index_type="IVF", nlist=nlist, kmeans_sample_fraction=0.02,
        ivf_max_list_factor=None,
    )
    ivf_dir = _idx_cache_dir(cache_dir, "IVF", ivf_cfg, n)
    shared_centroids = None
    if os.path.exists(os.path.join(ivf_dir, "centroids")):
        shared_centroids = spark.read.parquet(os.path.join(ivf_dir, "centroids"))

    builds_file = os.path.join(cache_dir, f"builds_n{n}.json")
    build_secs: dict[str, float] = {}
    for name, cfg in builds.items():
        idx_dir = _idx_cache_dir(cache_dir, cfg.index_type, cfg, n)
        if os.path.exists(os.path.join(idx_dir, "shards_metadata.json")):
            print(f"{name}: cached at {idx_dir}", flush=True)
            continue
        print(f"{name}: building into {idx_dir} ...", flush=True)
        t0 = time.perf_counter()
        build_index(
            spark, corpus, idx_dir, cfg,
            centroids_df=shared_centroids if cfg.index_type == "IVFPQ" else None,
        )
        build_secs[f"build_{name}"] = round(time.perf_counter() - t0, 1)
        print(f"{name}: {build_secs[f'build_{name}']} s", flush=True)
    if build_secs:
        merged = {}
        if os.path.exists(builds_file):
            with open(builds_file) as f:
                merged = json.load(f)
        merged.update(build_secs)
        with open(builds_file, "w") as f:
            json.dump(merged, f)
    print("done", flush=True)


if __name__ == "__main__":
    main()
