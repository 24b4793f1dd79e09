#!/usr/bin/env python
"""One-time migration of the cached 100M bench artifact to an ATTRIBUTED
index (VERDICT r11 #3): the filtered arms at the stretch tier previously
ran a fixed nprobe over a predicate on vec_id because the artifact carried
no attr columns — so the measured filtered planner (attr stats + cell
profile + recall curve) had nothing to plan against at the tier whose
posture the 100 TB story extrapolates from.

Rather than re-paying the ~1 h cold build, this rewrites the stored rows
with the bench's label convention (label = vec_id % 10 — the SAME rows the
old `vec_id % 10 = 7` arm filtered, so cross-round comparability holds),
reusing everything the label doesn't change:

- vectors: one partition-preserving rewrite (read hive-partitioned rows,
  add the label column, write back partitionBy centroid_id — assignments
  untouched, ~1 file per cell via the keyed repartition)
- centroids / recall_curve / cell_profile: hardlinked verbatim (identical
  vectors + assignments -> identical measured geometry)
- attr_stats / attr_cell_stats: computed fresh (what the planner needs)

The new artifact lands under the IVF100M_ATTR cache key bench._ann_100m
uses; a cold cache builds the identical thing through build_index(
attr_cols=["label"]). The old IVF100M dir is deleted afterwards to stay
inside the sandbox's disk budget (pass --keep-old to retain it).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _idx_cache_dir  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.session import get_spark
    from webscale_vector_search_spark.sources import index_io
    from webscale_vector_search_spark.sources.attr_stats import (
        write_attr_cell_stats,
        write_attr_stats,
    )

    cache_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    n, nlist = 100_000_000, 3162
    cfg = EngineConfig(
        index_type="IVF", nlist=nlist, kmeans_sample_fraction=0.002,
        centroid_polish_iters=0, ivf_max_list_factor=None,
    )
    old = _idx_cache_dir(cache_dir, "IVF100M", cfg, n)
    new = _idx_cache_dir(cache_dir, "IVF100M_ATTR", cfg, n)
    if os.path.exists(os.path.join(new, "shards_metadata.json")):
        print(f"already enriched: {new}")
        return
    if not os.path.exists(os.path.join(old, "shards_metadata.json")):
        raise SystemExit(f"no cached 100M artifact at {old}")

    spark = get_spark("wvss-enrich-100m")
    meta = index_io.read_metadata(old)
    vdir_old = index_io.vectors_path(old, meta)
    os.makedirs(new, exist_ok=True)

    t0 = time.perf_counter()
    # NO repartition: the hive-partitioned input is already clustered by
    # cell (one file per centroid_id dir), so coalesced read splits cover
    # consecutive cells and the dynamic-partition write lands ~1-2 files
    # per cell — a straight map pass. The keyed repartition variant
    # shuffles the full 23 GB, which together with the 23 GB output blows
    # this sandbox's disk quota (measured: 33 GB free -> ENOSPC class).
    rows = spark.read.parquet(vdir_old)
    enriched = rows.select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % 10).cast("int").alias("label"),
        "centroid_id",
    )
    enriched.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(new, "vectors")
    )
    print(f"rewrite: {round(time.perf_counter() - t0, 1)}s", flush=True)

    # geometry sidecars are label-independent: hardlink them verbatim
    for sub in ("centroids", "recall_curve", "cell_profile"):
        src = os.path.join(old, sub)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(new, sub), copy_function=os.link)

    t0 = time.perf_counter()
    base = spark.read.parquet(os.path.join(new, "vectors"))
    write_attr_stats(base, ["label"], new)
    write_attr_cell_stats(spark, os.path.join(new, "vectors"), ["label"], new)
    print(f"stats: {round(time.perf_counter() - t0, 1)}s", flush=True)

    meta["attr_cols"] = ["label"]
    meta.pop("vectors_dir", None)  # fresh layout, pointer resets to vectors/
    index_io.write_metadata(new, meta)

    # verification before the old artifact is deleted: row count, label
    # correctness on a sample, and search parity (identical assignments ->
    # identical nprobe=4 results)
    n_new = base.count()
    assert n_new == meta["total_vectors"], (n_new, meta["total_vectors"])
    bad = base.filter(F.col("label") != (F.col("vec_id") % 10).cast("int")).count()
    assert bad == 0, bad
    from webscale_vector_search_spark.plans.build import search_index

    import numpy as np

    from bench import _ann_vectors

    rng = np.random.default_rng(45)
    centers = rng.normal(0.0, 1.0, (nlist, 64)).astype(np.float32)
    qids = np.arange(8, dtype=np.int64) * (n // 8) + np.arange(8)
    qvecs = _ann_vectors(qids, centers, 45)
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qvecs)],
        "query_id BIGINT, qvec ARRAY<FLOAT>",
    )
    got_new = search_index(spark, new, queries, k=10, nprobe=4).collect()
    got_old = search_index(spark, old, queries, k=10, nprobe=4).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted(map(key, got_new)) == sorted(map(key, got_old))
    print("verified: counts, labels, search parity", flush=True)

    if "--keep-old" not in sys.argv:
        shutil.rmtree(old)
        print(f"removed {old}")
    print(f"enriched -> {new}")


if __name__ == "__main__":
    main()
