"""Reference-parity API surface.

A user of rnaarla/webscale_vector_search drives three entry points
(SURVEY.md §3): `create-index` (CLI), `POST /api/v1/search` (coordinator),
and the node lifecycle. This module exposes the same *capabilities* with the
same vocabulary, minus the serving machinery Spark subsumes:

- :func:`create_sharded_index`  <- create_sharded_index (977-1068) + the
  streaming DistributedVectorIndexBuilder (1071-1242, via streaming/)
- :class:`VectorCluster`        <- VectorCluster.distributed_search (186-250)
  and /api/v1/stats (815-830). Single-vector search returns the reference's
  response dict shape; batch search returns a DataFrame.

Index types accepted: FLAT, IVF, IVFPQ, HNSW (per-shard persisted graphs,
served by traversal — operators/hnsw_partition.py).

Latency routing: the reference's headline single-query latency comes from
in-RAM FAISS lookups behind FastAPI (794-812) — a cost class a Spark job
can't reach (the job-launch floor alone is ~0.2-0.3 s). `distributed_search`
therefore serves single queries through plans/serve_local.py (the same
kernels, driver-resident artifacts, bit-identical results) and only
`search_batch` — the throughput shape — runs as a Spark job.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.plans.build import build_index, search_index
from webscale_vector_search_spark.sources.index_io import read_metadata


def create_sharded_index(
    spark: SparkSession,
    vectors_path: str,
    output_dir: str,
    num_shards: int = 16,
    index_type: str = "FLAT",
    vector_dim: int = 64,
    seed: int = 42,
):
    """Offline index build from a vector corpus (npy file(s) or parquet).

    Mirrors the reference CLI:
      python vector_search_cluster.py create-index --vectors corpus.npy
        --output-dir ./shards --num-shards 16 --index-type IVF
    """
    import glob
    import os

    is_npy = vectors_path.endswith(".npy") or bool(
        glob.glob(os.path.join(vectors_path, "*.npy"))
    )
    if is_npy:
        from webscale_vector_search_spark.sources.npy import read_npy

        corpus = read_npy(spark, vectors_path)
    else:
        corpus = spark.read.parquet(vectors_path)
    cfg = EngineConfig(
        vector_dim=vector_dim, num_shards=num_shards, index_type=index_type, seed=seed
    )
    return build_index(spark, corpus, output_dir, cfg)


class VectorCluster:
    """Batch-native stand-in for the reference coordinator (186-250).

    The reference's per-request plumbing (Redis cache, ZMQ scatter-gather,
    round-robin replica selection) is replaced by: query-dedup rewrite,
    one Spark job over all partitions, and the Spark scheduler.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = read_metadata(index_dir)
        self._handle = None  # opened lazily; serving reuses its caches
        self._queries_processed = 0
        self._latencies_ms: list[float] = []

    def _opened(self):
        """The cluster's long-lived handle, freshness-probed on every use:
        deletes/appends/compactions issued after the first search are
        visible to the next one (IndexHandle.maybe_refresh — a stat-only
        probe when nothing changed). `self.meta` tracks the handle's meta
        so pointer flips and total updates propagate to stats too."""
        if self._handle is None:
            from webscale_vector_search_spark.sources.index_io import open_index

            self._handle = open_index(self.spark, self.index_dir)
        else:
            self._handle.maybe_refresh()
        self.meta = self._handle.meta
        return self._handle

    def distributed_search(
        self, query_vector: list[float], k: int = 10, all_shards: bool = True
    ) -> dict:
        """Single-query search; response dict mirrors the reference
        (353-359, 247-250): distances ascending, ids, shard counts, timing.

        Served driver-side (plans/serve_local.py — the reference's in-RAM
        lookup shape, 794-812), so a warm call pays kernel compute only,
        not a Spark job. Results are bit-identical to the batch path.

        `all_shards=False` restricts probing (the principled version of the
        reference's sum-hash routing, quirk Q1): IVF-family indexes probe
        the default nprobe lists; with all_shards=True they probe every list.
        """
        import numpy as np

        from webscale_vector_search_spark.plans.serve_local import serve_local

        t0 = time.perf_counter()
        handle = self._opened()  # refreshes self.meta if the index mutated
        nprobe = None
        # all_shards on list-layout indexes = probe every list (graph HNSW
        # artifacts carry nlist=None and traverse regardless of nprobe)
        if self.meta["index_type"] in ("IVF", "IVFPQ", "HNSW") and all_shards:
            nprobe = self.meta.get("nlist")
        got = serve_local(
            handle,
            np.asarray(query_vector, dtype=np.float64),
            k=k,
            nprobe=nprobe,
        )
        rows = got.sort_values("rank").to_dict("records")
        elapsed_ms = (time.perf_counter() - t0) * 1000
        self._queries_processed += 1
        self._latencies_ms.append(elapsed_ms)
        self._latencies_ms = self._latencies_ms[-1000:]  # reference's window (240-241)
        return {
            "distances": [r["distance"] for r in rows],
            "indices": [r["neighbor_id"] for r in rows],
            "metadata": [None] * len(rows),  # declared-but-dead in the reference (§1.2)
            "num_shards_queried": self.meta["num_shards"],
            "num_shards_failed": 0,
            "query_time_ms": elapsed_ms,
        }

    def search_batch(self, queries: DataFrame, k: int = 10,
                     nprobe: int | None = None, **search_kwargs) -> DataFrame:
        """The Spark-native unit: a query DataFrame in, results out (lazy).
        Extra kwargs pass through to search_index (where / allowed_ids /
        exact_refine / ef_search / ...)."""
        return search_index(self.spark, self.index_dir, queries, k=k,
                            nprobe=nprobe, **search_kwargs)

    def get_stats(self) -> dict:
        """/api/v1/stats analog (815-830, 414-434).

        `total_vectors` reports the LIVE count: the sidecar total minus
        pending tombstones (delete_vectors since the last compaction) —
        what searches through this cluster can actually return. The
        pending count is EXACT — |tombstones ∩ stored ids|, one cached
        column-pruned scan (IndexHandle.live_pending_count) — so deleting
        an id that never existed doesn't deflate the live count. The raw
        sidecar number stays available as `stored_vectors`; `pending_
        deletes` makes the difference explicit (reference has no delete,
        so no such field — §2.9 extension surface)."""
        lat = sorted(self._latencies_ms)
        n = len(lat)
        pending = self._opened().live_pending_count()
        return {
            "total_queries": self._queries_processed,
            "avg_latency_ms": sum(lat) / n if n else 0.0,
            "p50_latency_ms": lat[n // 2] if n else 0.0,
            "p95_latency_ms": lat[int(n * 0.95)] if n else 0.0,
            "p99_latency_ms": lat[int(n * 0.99)] if n else 0.0,
            "total_vectors": self.meta["total_vectors"] - pending,
            "stored_vectors": self.meta["total_vectors"],
            "pending_deletes": pending,
            "num_shards": self.meta["num_shards"],
            "index_type": self.meta["index_type"],
            # True when the stored recall curve was measured against an
            # earlier vectors version (targeted compaction, a failed or
            # opted-out re-profile, or appends/upserts past the growth
            # bar) — the planner still reads it, but the operator can see
            # the drift and schedule ensure_recall_curve
            "profile_stale": bool(self.meta.get("profile_stale", False)),
        }
