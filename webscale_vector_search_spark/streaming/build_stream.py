"""T1 — incremental (streaming) index build via Structured Streaming.

Reference: DistributedVectorIndexBuilder.process_file
(vector_search_cluster.py:1139-1212) — mmap batches, train IVF on the FIRST
batch only (quirk Q7), hash-shard by float content (quirk Q2, broken), append
to per-shard indexes.

The Spark-native translation fixes both quirks by construction:
- training is a separate batch job over a corpus-wide sample (plans/build.py);
  the stream APPENDS under FIXED centroids — exactly how production IVF
  systems do incremental ingest (retrain is an offline job, not a stream op).
- sharding/assignment is the deterministic id-hash / nearest-centroid logic
  shared with the batch path — literally the same functions, so
  batch-build == incremental-build is a provable invariant (tested).

Each micro-batch: assign shard/centroid -> append to the partitioned Parquet
index via `foreachBatch` over checkpointed source offsets. Delivery is
AT-LEAST-ONCE per epoch: the HNSW graph path is replay-idempotent (already
present vec_ids are skipped inside extend_shard_graphs, and the dynamic
partition overwrite rewrites the same content), while the plain append paths
(FLAT/IVF/IVFPQ) can duplicate a micro-batch's rows if the stream crashes
between the parquet commit and the offset commit — dedup on vec_id at read
time or run compact_index after a crash recovery if exactness matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import assign_centroids
from webscale_vector_search_spark.operators.shard import hash_shard


def incremental_build(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    config: EngineConfig = EngineConfig(),
    centroids: DataFrame | None = None,
    codebooks=None,
    checkpoint_dir: str | None = None,
):
    """Start a streaming append into an index directory.

    `stream_df` must be a streaming DataFrame with (vec_id, embedding).
    For IVF-family indexes pass the FIXED centroid table (and, for IVFPQ,
    the fixed codebooks) from the batch training job. Returns the
    StreamingQuery (caller awaits termination).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    # a purely stream-built index must still be open_index-able: seed the
    # sidecar if the batch job didn't; refresh_metadata() recounts after
    # the stream drains (foreachBatch can't know the final total)
    from webscale_vector_search_spark.sources.index_io import (
        METADATA_FILE,
        metadata_dict,
        vectors_path,
        write_metadata,
    )

    if not os.path.exists(os.path.join(out_dir, METADATA_FILE)):
        seed_meta = metadata_dict(
            num_shards=config.num_shards,
            index_type=config.index_type,
            vector_dim=config.vector_dim,
            total_vectors=0,
            pq_residual=config.index_type == "IVFPQ" and config.pq_residual,
            metric=config.metric,
        )
        if config.index_type == "HNSW":
            seed_meta["hnsw_graph"] = True
            seed_meta["hnsw"] = {
                "m": config.hnsw_m,
                "ef_construction": config.hnsw_ef_construction,
            }
        write_metadata(out_dir, seed_meta)
    # the appended codes MUST match the sidecar's encoding: a residual
    # index (build_index default) streamed raw codes would silently
    # mis-score every appended vector under the residual ADC expansion
    from webscale_vector_search_spark.sources.index_io import read_metadata

    meta_now = read_metadata(out_dir)
    pq_residual = bool(meta_now.get("pq_residual"))
    # the appended vectors must live in the SAME metric frame as the stored
    # ones: a cosine index stores unit-normalized vectors (plans/build.py),
    # so the stream normalizes each batch identically — and a config whose
    # metric disagrees with the sidecar would silently mix frames, so refuse
    stored_metric = meta_now.get("metric", "sq_l2")
    if stored_metric != config.metric:
        raise ValueError(
            f"config.metric={config.metric!r} but the index was built with "
            f"metric={stored_metric!r} — appended vectors would be scored "
            "in the wrong frame"
        )
    if config.metric == "cosine":
        from webscale_vector_search_spark.functions.distance import with_l2_normalized

        stream_df = with_l2_normalized(stream_df, "embedding")
    elif config.metric != "sq_l2":
        raise ValueError(f"unknown metric {config.metric!r}")
    # append into the CURRENT version directory (compact_index may have
    # flipped the sidecar pointer away from the original `vectors`)
    vectors_dir = vectors_path(out_dir)

    if config.index_type == "FLAT":

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            sharded = hash_shard(batch_df, config.num_shards)
            # cluster by target dir: without this, every batch writes
            # tasks x shards files (the small-file drift compact_index
            # exists to repair — cheaper to avoid per batch)
            sharded = sharded.repartition(config.num_shards, "shard_id")
            sharded.write.mode("append").partitionBy("shard_id").parquet(vectors_dir)

    elif config.index_type == "IVF":
        if centroids is None:
            raise ValueError("IVF incremental build requires the trained centroid table")
        cents = centroids
        cents_count = cents.count()

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            assigned = assign_centroids(batch_df, cents).repartition(
                max(1, cents_count), "centroid_id"
            )
            assigned.write.mode("append").partitionBy("centroid_id").parquet(vectors_dir)

    elif config.index_type == "HNSW":
        # true incremental graph insertion (HNSW is an incremental
        # structure): each micro-batch is inserted into the affected shards'
        # stored graphs and ONLY those shard partitions are rewritten
        # (dynamic partition overwrite — neighbor lists of existing nodes
        # change when new nodes link in, so an append-only write can't
        # represent the update). Legacy centroid-layout HNSW artifacts take
        # the IVF append path with explicit centroids instead.
        meta0 = read_metadata(out_dir)
        hnsw_params = meta0.get("hnsw") or {}
        m_ = hnsw_params.get("m", config.hnsw_m)
        efc_ = hnsw_params.get("ef_construction", config.hnsw_ef_construction)
        if not meta0.get("hnsw_graph"):
            raise ValueError(
                "HNSW incremental append requires a graph artifact "
                "(build_index since r5); legacy centroid-layout HNSW "
                "indexes append via index_type='IVF' with their centroids"
            )

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            from webscale_vector_search_spark.operators.hnsw_partition import (
                extend_shard_graphs,
                freeze_graphs,
            )

            # one source evaluation per batch: the touched-shard list and the
            # graph-extension job both read `sharded`, so cache it for the
            # epoch (micro-batches are small by construction)
            sharded = hash_shard(batch_df, config.num_shards).persist()
            touched = [
                r["shard_id"]
                for r in sharded.select("shard_id").distinct().collect()
            ]
            graphs = extend_shard_graphs(
                sharded, vectors_dir, m=m_, ef_construction=efc_, seed=config.seed
            )
            (
                graphs.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("shard_id")
                .parquet(vectors_dir)
            )
            sharded.unpersist()
            # re-freeze the serving bundles of the shards this batch touched
            # (the overwrite invalidated their fingerprints; serving would
            # still be correct via the parquet fallback, just slower)
            freeze_graphs(
                vectors_dir, config.num_shards, spark=batch_df.sparkSession, shards=touched
            )

    elif config.index_type == "IVFPQ":
        if centroids is None or codebooks is None:
            raise ValueError("IVFPQ incremental build requires fixed centroids AND codebooks")
        cents = centroids
        cents_count = cents.count()
        books = codebooks

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            from webscale_vector_search_spark.operators.pq import encode

            assigned = encode(
                assign_centroids(batch_df, cents),
                books,
                centroids=cents if pq_residual else None,
            ).repartition(max(1, cents_count), "centroid_id")
            assigned.write.mode("append").partitionBy("centroid_id").parquet(vectors_dir)

    else:
        raise ValueError(f"unknown index_type {config.index_type!r}")

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def refresh_metadata(spark: SparkSession, index_dir: str) -> dict:
    """Recount the stored vectors and rewrite the sidecar's total_vectors.

    Call after a streaming append drains (or periodically for continuous
    streams) — the sidecar is driver-side JSON, so foreachBatch epochs can't
    maintain it transactionally themselves.
    """
    from webscale_vector_search_spark.sources.index_io import (
        read_metadata,
        vectors_path,
        write_metadata,
    )

    meta = read_metadata(index_dir)
    total = spark.read.parquet(vectors_path(index_dir, meta)).count()
    meta["total_vectors"] = total
    write_metadata(index_dir, meta)
    return meta
