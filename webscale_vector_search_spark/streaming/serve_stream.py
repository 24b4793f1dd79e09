"""T4 — continuous query serving over a static index (streaming search).

Reference: the online half of the system — FastAPI `/search` + ZMQ
scatter-gather (vector_search_cluster.py:794-812, 223-298) serves an
unbounded arrival stream of queries against already-built shard indexes.
Spark-first translation: the query stream is a Structured Streaming
DataFrame (Kafka/files/rate in production; memory source in tests), and
each micro-batch is ONE batched search job against an opened IndexHandle —
`foreachBatch` + `search_index`, the batch engine reused verbatim.

Why foreachBatch and not a streaming join: kNN top-k per query is not
expressible as a stream-stream/stream-static equi-join (the candidate set
is distance-ranked, not key-matched), but each micro-batch IS exactly the
engine's batch unit — a bounded query batch against an immutable index.
Serving this way inherits every batch-path property: driver-side probe
selection, static list pruning, Arrow kernels, k-row-per-task shuffle.

Scale posture: the handle is opened ONCE (metadata + file listing +
codebook load amortized across all micro-batches); per-batch work scales
with the batch's probed-list union, not the corpus. Exactly-once delivery
comes from the checkpointed source offsets + idempotent per-epoch output
(partitionBy epoch_id or an idempotent sink keyed on query_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def serve_queries_stream(
    spark: SparkSession,
    query_stream: DataFrame,
    index_handle,
    out_dir: str,
    k: int = 10,
    nprobe: int | None = None,
    checkpoint_dir: str | None = None,
    where=None,
    allowed_ids: DataFrame | None = None,
    filter_oversample: int | None = None,
    recall_target: float | None = None,
):
    """Serve a stream of (query_id, qvec) against an opened index.

    Results append to `out_dir` as Parquet (query_id, rank, neighbor_id,
    distance, epoch_id). Returns the StreamingQuery; callers own
    awaitTermination/stop.

    The FULL filtered surface flows through to each micro-batch exactly as
    on the batch path: `where` (SQL predicate over build-time attr_cols),
    `allowed_ids` (static vec_id DataFrame), `filter_oversample`, and
    `recall_target` — a T4 stream answers the same queries a batch caller
    can ask, batch == stream row-for-row. Freshness composes: search_index
    probes the handle per call (maybe_refresh), so deletes/appends/
    compactions landing MID-STREAM apply from the very next micro-batch."""
    from webscale_vector_search_spark.plans.build import search_index

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        queries = batch_df.select("query_id", "qvec")
        result = search_index(
            spark, index_handle, queries, k=k, nprobe=nprobe,
            where=where, allowed_ids=allowed_ids,
            filter_oversample=filter_oversample, recall_target=recall_target,
        )
        (
            result.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = query_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
