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
import tempfile
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


def _splitmix_unit(ids, dim: int, seed: int):
    """Deterministic pseudo-random matrix in [0,1): splitmix64 finalizer over
    the (vec_id, dimension) grid — fully vectorized, identical regardless of
    partitioning, so queries can be re-derived driver-side bit-exactly."""
    import numpy as np

    d_idx = np.arange(dim, dtype=np.uint64)[None, :]
    z = ids.astype(np.uint64)[:, None] * np.uint64(dim) + d_idx + np.uint64(seed)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(27)
        z ^= z >> np.uint64(31)
    return (z / np.float64(2**64)).astype(np.float32)


def _ann_vectors(ids, centers, seed: int):
    """vec(id) = cluster center (id mod ncl) + uniform offset in [-.5,.5)^d."""
    ncl, dim = centers.shape
    off = _splitmix_unit(ids, dim, seed) - 0.5
    return centers[(ids % ncl).astype("int64")] + off


def _idx_cache_dir(cache_dir: str, itype: str, cfg, n: int) -> str:
    """Cache dir for one built index, keyed by a hash of the FULL build
    config: the build-exists check can't see config changes inside a written
    artifact, so ANY EngineConfig field change must change the directory
    name (the round-4 staleness trap: bumping pq_m without bumping the
    manual dir tag silently reused the old index)."""
    import hashlib

    digest = hashlib.md5(repr(cfg).encode()).hexdigest()[:10]
    return os.path.join(cache_dir, f"idx_{itype.lower()}_{digest}_n{n}")


def _ann_tier(spark, n: int, cache_dir: str) -> tuple[dict, dict]:
    """The ≥1M-vector tier: FLAT vs IVF vs IVFPQ on a deterministic clustered
    corpus, wall-clock WITH recall attached (pruning is invisible at sf0.1's
    2,000 vectors — this is where the index designs actually show).

    The corpus + both index builds are cached under `cache_dir` across runs
    (build happens once; the per-round cost is the three timed searches).
    """
    import numpy as np

    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.operators.ivf import recall_at_k
    from webscale_vector_search_spark.operators.knn import knn_pandas
    from webscale_vector_search_spark.plans.build import build_index, search_index

    # n_queries=1000: the reference's headline metric is batch THROUGHPUT
    # (README.md:158-161 reports QPS, with IVFPQ at 2.1x FLAT). At 100
    # queries the per-job floor (~0.25 s) and the pruned scan's small-file
    # overhead dominate every kernel; at 1000 the engines separate by their
    # per-query marginal cost (FLAT: a 1M-row GEMM per query; IVF/ADC:
    # probed lists only).
    dim, ncl, seed, n_queries, k = 64, 1000, 42, 1000, 10
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (ncl, dim)).astype(np.float32)

    corpus_path = os.path.join(cache_dir, f"corpus_n{n}")
    builds_file = os.path.join(cache_dir, f"builds_n{n}.json")
    build_secs: dict[str, float] = {}
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids = pdf["id"].to_numpy()
                vecs = _ann_vectors(ids, centers, seed)
                yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

        t0 = time.perf_counter()
        (
            spark.range(n, numPartitions=32)
            .mapInPandas(gen, "vec_id BIGINT, embedding ARRAY<FLOAT>")
            .write.mode("overwrite")
            .parquet(corpus_path)
        )
        build_secs["gen"] = round(time.perf_counter() - t0, 1)

    corpus = spark.read.parquet(corpus_path)
    # queries spread over n_queries DISTINCT natural clusters (id % ncl
    # varies): a diverse batch is the honest serving workload — it forces
    # the probed-list union wide, so the kernels must prune COMPUTE
    # per-list, not just IO (a same-cluster batch would make static
    # partition pruning alone look sufficient)
    qids = np.arange(n_queries, dtype=np.int64) * (n // n_queries) + np.arange(n_queries)
    qvecs = _ann_vectors(qids, centers, seed)

    def mk_queries(m: int):
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(qids[:m], qvecs[:m])],
            "query_id BIGINT, qvec ARRAY<FLOAT>",
        ).cache()  # a serving batch is materialized once, not re-serialized per probe
        df.count()
        return df

    queries = mk_queries(n_queries)
    query1 = mk_queries(1)

    nlist, nprobe = 1000, 4  # sqrt(n) lists (reference's rule); 0.4% probed
    def idx_dir_for(itype: str, cfg: EngineConfig) -> str:
        return _idx_cache_dir(cache_dir, itype, cfg, n)

    builds = {
        "ivf": EngineConfig(index_type="IVF", nlist=nlist, kmeans_sample_fraction=0.02),
        # pq_m=64 (dsub=1, scalar-quantized residuals): the reference's
        # dim//4 rule (m=16 @ 8-bit) measures ADC-only recall@10 0.585 on
        # this corpus because sampled k-means mis-allocates natural clusters
        # and the coarse codes can't rank within a list; 256 adaptive levels
        # PER DIM makes ADC ranking near-exact and the codes still scan 2x
        # smaller than raw float32. This is the high-RECALL operating point.
        "ivfpq": EngineConfig(
            index_type="IVFPQ", nlist=nlist, pq_m=64, kmeans_sample_fraction=0.02
        ),
        # pq_m=32 @ 8-bit: the high-COMPRESSION operating point — 32 B/vec
        # logical vs 256 B raw float32 = 8x (16x vs the m=64 arm's 2x
        # physical SMALLINT footprint). Per-cell LOPQ codebooks
        # (pq_local_codebooks; fit distributed, one task per inverted
        # list): global codebooks at this budget measure ADC-only recall
        # 0.849 on this corpus — the pooled-codebook ranking limit — while
        # per-cell books adapt to each list's local structure. The bench
        # reports ADC-only recall beside the compression factor.
        "ivfpq_hc": EngineConfig(
            index_type="IVFPQ", nlist=nlist, pq_m=32, kmeans_sample_fraction=0.02,
            pq_local_codebooks=True,
        ),
        # HNSW: per-shard persisted graphs (adjacency columns), serving
        # pays traversal only; 16 shards of 62.5k nodes at n=1M
        "hnsw": EngineConfig(index_type="HNSW", num_shards=16),
    }
    handles = {}
    shared_centroids = None  # identical config -> identical centers; train once
    for name, cfg in builds.items():
        idx_dir = idx_dir_for(cfg.index_type if name != "ivfpq_hc" else "IVFPQ_HC", cfg)
        if not os.path.exists(os.path.join(idx_dir, "shards_metadata.json")):
            t0 = time.perf_counter()
            build_index(
                spark, corpus, idx_dir, cfg,
                centroids_df=shared_centroids if cfg.index_type in ("IVF", "IVFPQ") else None,
            )
            build_secs[f"build_{name}"] = round(time.perf_counter() - t0, 1)
        if cfg.index_type in ("IVF", "IVFPQ") and shared_centroids is None:
            shared_centroids = spark.read.parquet(os.path.join(idx_dir, "centroids"))
        handles[name] = idx_dir
    pq_cfg = builds["ivfpq"]
    hc_cfg = builds["ivfpq_hc"]
    # merge with previously recorded times: a partial rebuild (one index's
    # cache key changed) must not drop the other index's build number
    if os.path.exists(builds_file):
        with open(builds_file) as f:
            build_secs = {**json.load(f), **build_secs}
    if build_secs:
        with open(builds_file, "w") as f:
            json.dump(build_secs, f)

    # serving opens an index once; per-batch timing excludes the one-time
    # metadata read + file listing + codebook load (search_index takes the
    # opened handle)
    from webscale_vector_search_spark.sources.index_io import open_index

    ivf_handle = open_index(spark, handles["ivf"])
    pq_handle = open_index(spark, handles["ivfpq"])
    hc_handle = open_index(spark, handles["ivfpq_hc"])
    hnsw_handle = open_index(spark, handles["hnsw"])

    def timed(fn, warmups: int = 1):
        for _ in range(warmups):
            fn().count()  # warm-up (JIT, scan caches; graph loads for HNSW)
        # min-of-3: back-to-back full-bench runs on this box have measured
        # 2x swings on identical cached artifacts (see calibration probes);
        # the min is the defensible kernel cost, the rest is box noise
        best, result = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn()
            df.count()
            best = min(best, time.perf_counter() - t0)
            result = df
        return round(best, 4), result

    flat_sec, exact = timed(lambda: knn_pandas(corpus, queries, k=k))
    ivf_sec, ivf = timed(
        lambda: search_index(spark, ivf_handle, queries, k=k, nprobe=nprobe)
    )
    pq_sec, pq = timed(
        lambda: search_index(spark, pq_handle, queries, k=k, nprobe=nprobe)
    )
    # stage decomposition: ADC-only (codes scan, no exact-refine second pass).
    # The refined number above pays TWO scans (codes + probed embeddings for
    # the refine join) — on a scan-based engine the refine IO is the same
    # class as IVF search itself, so at this fixture size refined IVFPQ
    # tracks IVF + ADC; the ADC-only row shows the 8x-smaller first stage.
    pq_adc_sec, pq_adc = timed(
        lambda: search_index(
            spark, pq_handle, queries, k=k, nprobe=nprobe, exact_refine=False
        )
    )
    # high-compression arm: m=32 @ 8-bit = 32 B/vec logical vs 256 B raw =
    # 8x, with per-cell LOPQ codebooks (global codebooks at this budget
    # measure ADC-only 0.849 — the pooled-codebook ranking limit; per-cell
    # books adapt to each list's local structure). The two-stage numbers
    # (modest 4x ADC over-fetch + exact refine on candidates only) are
    # reported beside ADC-only: refine IO is |queries| * 4k rows,
    # corpus-size-independent, and the corpus scan still reads only the
    # 8x-compressed codes.
    hc_adc_sec, hc_adc = timed(
        lambda: search_index(
            spark, hc_handle, queries, k=k, nprobe=nprobe, exact_refine=False
        )
    )
    hc_ref_sec, hc_ref = timed(
        lambda: search_index(
            spark, hc_handle, queries, k=k, nprobe=nprobe, refine_factor=4
        )
    )
    # HNSW over persisted graphs: traversal-only serving. Two warm-ups so
    # the per-python-worker graph cache is populated before timing (cold
    # tasks pay the one-time adjacency load the reference pays at node
    # startup, 537-545)
    hnsw_sec, hnsw_res = timed(
        lambda: search_index(spark, hnsw_handle, queries, k=k), warmups=2
    )
    # single-query latency: the low-latency serving shape, where probe
    # pruning cuts IO 250x (4 of 1000 lists) instead of the batch union
    flat1_sec, _ = timed(lambda: knn_pandas(corpus, query1, k=k))
    ivf1_sec, _ = timed(lambda: search_index(spark, ivf_handle, query1, k=k, nprobe=nprobe))
    hnsw1_sec, _ = timed(lambda: search_index(spark, hnsw_handle, query1, k=k), warmups=2)
    meta = {
        "corpus": n,
        "dim": dim,
        "n_queries": n_queries,
        "k": k,
        "nlist": nlist,
        "nprobe": nprobe,
        "pq_m": pq_cfg.resolved_pq_m(),
        "pq_bits": pq_cfg.pq_bits,
        "flat_sec": flat_sec,
        "ivf_sec": ivf_sec,
        "ivf_recall": round(recall_at_k(ivf, exact, k=k), 4),
        "ivfpq_sec": pq_sec,
        "ivfpq_recall": round(recall_at_k(pq, exact, k=k), 4),
        "ivfpq_adc_sec": pq_adc_sec,
        "ivfpq_adc_recall": round(recall_at_k(pq_adc, exact, k=k), 4),
        "ivfpq_hc": {
            "pq_m": hc_cfg.resolved_pq_m(),
            "pq_bits": hc_cfg.pq_bits,
            "local_codebooks": hc_cfg.pq_local_codebooks,
            "compression_x": round(dim * 4.0 / (hc_cfg.resolved_pq_m() * hc_cfg.pq_bits / 8.0), 1),
            "adc_sec": hc_adc_sec,
            "adc_recall": round(recall_at_k(hc_adc, exact, k=k), 4),
            "refine_factor": 4,
            "refined_sec": hc_ref_sec,
            "refined_recall": round(recall_at_k(hc_ref, exact, k=k), 4),
        },
        "hnsw_sec": hnsw_sec,
        "hnsw_recall": round(recall_at_k(hnsw_res, exact, k=k), 4),
        "hnsw_m": builds["hnsw"].hnsw_m,
        "hnsw_shards": builds["hnsw"].num_shards,
        "flat_1q_sec": flat1_sec,
        "ivf_1q_sec": ivf1_sec,
        "hnsw_1q_sec": hnsw1_sec,
        "build_sec": build_secs,
    }
    timings = {
        "q_ann1m_flat": flat_sec,
        "q_ann1m_ivf": ivf_sec,
        "q_ann1m_ivfpq": pq_sec,
        "q_ann1m_hnsw": hnsw_sec,
        "q_ann1m_flat_1q": flat1_sec,
        "q_ann1m_ivf_1q": ivf1_sec,
    }
    return timings, meta


def _calibrate(spark, io_dir: str = "/tmp") -> dict:
    """Fixed-work machine-speed probes, reported beside every run so
    cross-round drift can be attributed: identical code has measured
    +15-20% headline swings between rounds (r3->r4, r4->r5) while
    fixed-work steps moved 6-10x — i.e. the box, not the plans.

    - gemm_sec: 2048^3 float64 matmul (~17 GFLOP) — CPU/BLAS speed.
    - io_sec: 256 MB buffered write + fsync into ``io_dir`` — main() passes
      the resolved ANN artifact cache dir so the probe measures the
      filesystem builds/benches actually hit (SPARK_GRAFT_ANN_DIR may
      point somewhere other than /tmp).
    - spark_floor_sec: min-of-3 trivial 32-partition Spark job — the
      per-job scheduling floor every sub-second headline query sits on.
    """
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048))
    t0 = time.perf_counter()
    _ = a @ a
    gemm = time.perf_counter() - t0

    buf = a.tobytes()  # 32 MB
    os.makedirs(io_dir, exist_ok=True)
    fd, path = tempfile.mkstemp(prefix="wvss_cal_", dir=io_dir)
    try:
        t0 = time.perf_counter()
        with os.fdopen(fd, "wb") as f:
            for _ in range(8):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
        io = time.perf_counter() - t0
    finally:
        os.unlink(path)

    floor = float("inf")
    spark.range(1_000_000, numPartitions=32).count()  # warm
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_000_000, numPartitions=32).count()
        floor = min(floor, time.perf_counter() - t0)
    return {
        "gemm_sec": round(gemm, 4),
        "io_sec": round(io, 4),
        "spark_floor_sec": round(floor, 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from webscale_vector_search_spark.queries import QUERIES
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-bench")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    ann_dir = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/wvss_bench_ann_v3")
    calibration = _calibrate(spark, io_dir=ann_dir)

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

    # the ≥1M-vector ANN tier (FLAT vs IVF vs IVFPQ with recall); disable
    # with SPARK_GRAFT_ANN_TIER=0, resize with SPARK_GRAFT_ANN_N
    ann_meta = None
    if os.environ.get("SPARK_GRAFT_ANN_TIER", "1") != "0":
        try:
            ann_n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
            # per-index cache dirs embed a hash of the FULL build config
            # (_idx_cache_dir), so the base dir no longer needs manual
            # version bumps when a build knob changes
            ann_timings, ann_meta = _ann_tier(spark, ann_n, ann_dir)
            timings.update(ann_timings)
        except Exception as e:  # the headline line must print regardless
            ann_meta = {"error": f"{type(e).__name__}: {e}"}

    # value = the headline set only; EXTRA entries (fast-kernel variant,
    # full-corpus LSH, ANN tier) are reported per-query for trend tracking
    total = round(sum(timings[n] for n in HEADLINE), 4)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if ann_meta is not None:
        out["ann_1m"] = ann_meta
    out["calibration"] = calibration
    print(json.dumps(out))


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
