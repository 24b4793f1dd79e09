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
EXACTLY-ONCE per epoch for every index type (Spark's documented foreachBatch
contract is at-least-once; idempotent epoch publication upgrades it):

- every appended file is stage-written under `_epoch_staging/` and published
  into the live partition directories under an `ep{epoch_id}-` filename
  prefix with atomic per-file renames;
- a committed epoch drops a marker file in `_epoch_commits/`; a replayed
  epoch whose marker exists is a no-op, and a replay of a CRASHED epoch
  (marker absent) first deletes that epoch's partially-published files and
  republishes — deterministic inputs make the rewrite bit-identical;
- the HNSW graph path is additionally idempotent one level down
  (extend_shard_graphs skips already-present vec_ids), so even a marker
  loss degrades to a no-op rewrite, not duplication.

Between a crash and the replay, readers can observe a PARTIAL final epoch
(never duplicates); recovery converges the artifact to exactly-once.
Single-writer assumption: one stream (plus its own auto-compaction) owns an
index directory — concurrent manual compact_index calls should wait for the
stream to drain (compact_index does drop orphan epoch files defensively).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import assign_centroids
from webscale_vector_search_spark.operators.shard import hash_shard

_EPOCH_COMMITS = "_epoch_commits"
_EPOCH_STAGING = "_epoch_staging"


def _stream_token(checkpoint_dir: str) -> str:
    """Short identity of the stream behind a checkpoint: Spark persists a
    query UUID in `{checkpoint}/metadata` that SURVIVES restarts of the
    same checkpoint but differs for a fresh one. Epoch markers are scoped
    by it — epoch ids restart at 0 under a new checkpoint, so an unscoped
    marker from an earlier stream would silently drop a new stream's first
    batches into the same index.

    A read failure RAISES rather than falling back to a shared constant:
    a fallback token would commit this stream's epochs under an identity a
    different stream could also fall back to (its epoch 0 then swallowed
    by ours), and a later successful read would orphan our own markers —
    both silent exactly-once violations. Raising inside foreachBatch fails
    the batch visibly; Spark retries it after the transient error clears."""
    with open(os.path.join(checkpoint_dir, "metadata")) as f:
        return json.load(f)["id"].split("-")[0]


def _epoch_done(out_dir: str, token: str, epoch_id: int) -> bool:
    return os.path.isfile(os.path.join(out_dir, _EPOCH_COMMITS, f"{token}-{epoch_id}"))


def _mark_epoch(out_dir: str, token: str, epoch_id: int) -> None:
    """Atomically record an epoch as fully published (write tmp + rename)."""
    d = os.path.join(out_dir, _EPOCH_COMMITS)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{token}-{epoch_id}.tmp")
    with open(tmp, "w") as f:
        json.dump({"stream": token, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(d, f"{token}-{epoch_id}"))


def committed_epochs(out_dir: str) -> set[tuple[str, int]]:
    d = os.path.join(out_dir, _EPOCH_COMMITS)
    if not os.path.isdir(d):
        return set()
    out = set()
    for n in os.listdir(d):
        tok, _, ep = n.rpartition("-")
        if tok and ep.isdigit():
            out.add((tok, int(ep)))
    return out


def clean_epoch_files(vectors_dir: str, token: str, epoch_id: int) -> int:
    """Delete one epoch's published files (a crashed publish's leftovers).
    The directory prefix is glob-escaped: an out_dir containing glob
    metacharacters (`run[3]/`) must not silently match nothing."""
    victims = glob.glob(
        os.path.join(glob.escape(vectors_dir), "*", f"ep{token}-{epoch_id}-*.parquet")
    )
    for p in victims:
        os.remove(p)
    return len(victims)


def clean_orphan_epochs(out_dir: str, vectors_dir: str) -> int:
    """Delete published files of every UNCOMMITTED epoch — crashed publishes
    that a replay has not yet cleaned. compact_index calls this before
    reading, so a manual compaction between a crash and the stream restart
    cannot fold a partial epoch into the compacted base (the replay would
    then re-publish it whole and duplicate the partial subset)."""
    committed = committed_epochs(out_dir)
    removed = 0
    for p in glob.glob(os.path.join(glob.escape(vectors_dir), "*", "ep*-*-*.parquet")):
        parts = os.path.basename(p).split("-", 2)
        tok, ep = parts[0][2:], parts[1]
        if ep.isdigit() and (tok, int(ep)) not in committed:
            os.remove(p)
            removed += 1
    return removed


def _publish_epoch(
    df: DataFrame, out_dir: str, part_col: str, token: str, epoch_id: int
) -> None:
    """Idempotent epoch publication: stage the batch as its own partitioned
    parquet write, then move each staged file into the live partition
    directory under an `ep{token}-{epoch_id}-` name (one atomic rename per
    file — staging lives inside `out_dir`, same filesystem; on an object
    store swap the renames for the FileSystem committer). Any leftovers
    from a crashed attempt of the SAME epoch are deleted first, so
    replaying the epoch converges to exactly one copy."""
    from webscale_vector_search_spark.sources.index_io import vectors_path

    # resolve the CURRENT version dir per epoch: auto/manual compaction can
    # flip the sidecar pointer mid-stream
    vectors_dir = vectors_path(out_dir)
    staging = os.path.join(out_dir, _EPOCH_STAGING, f"ep{epoch_id}")
    df.write.mode("overwrite").partitionBy(part_col).parquet(staging)
    clean_epoch_files(vectors_dir, token, epoch_id)
    for part_dir in sorted(
        glob.glob(os.path.join(glob.escape(staging), f"{part_col}=*"))
    ):
        target = os.path.join(vectors_dir, os.path.basename(part_dir))
        os.makedirs(target, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(glob.escape(part_dir), "*.parquet"))):
            os.replace(
                f, os.path.join(target, f"ep{token}-{epoch_id}-{os.path.basename(f)}")
            )
    shutil.rmtree(staging, ignore_errors=True)
    _mark_epoch(out_dir, token, epoch_id)


def incremental_build(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    config: EngineConfig = EngineConfig(),
    centroids: DataFrame | None = None,
    codebooks=None,
    checkpoint_dir: str | None = None,
    auto_compact_every: int | None = None,
):
    """Start a streaming append into an index directory.

    `stream_df` must be a streaming DataFrame with (vec_id, embedding).
    For IVF-family indexes pass the FIXED centroid table (and, for IVFPQ,
    the fixed codebooks) from the batch training job. Returns an
    :class:`IndexBuildQuery` — the StreamingQuery plus an automatic
    sidecar ``total_vectors`` refresh when the drain is observed through
    awaitTermination / processAllAvailable.

    `auto_compact_every=N` runs compact_index after every Nth committed
    epoch, inside the stream itself — a long-running append then keeps its
    file counts bounded with no operator action (the small-file drift each
    micro-batch adds is repaired before it compounds). It is a stream
    policy, not an index property, hence an argument rather than an
    EngineConfig field. Compaction flips the sidecar's version pointer;
    every epoch re-resolves the live directory through it.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    # a purely stream-built index must still be open_index-able: seed the
    # sidecar if the batch job didn't; the drain-time refresh (IndexBuildQuery)
    # recounts total_vectors (foreachBatch can't know the final total)
    from webscale_vector_search_spark.sources.index_io import (
        METADATA_FILE,
        metadata_dict,
        vectors_path,
        write_metadata,
    )

    if not os.path.exists(os.path.join(out_dir, METADATA_FILE)):
        seed_nlist = seed_pq_m = None
        if config.index_type in ("IVF", "IVFPQ"):
            # a purely stream-built IVF-family index must persist its
            # training artifacts too: open_index reads <dir>/centroids
            # (and codebooks) — a sidecar alone would seed an unopenable
            # index
            if centroids is None:
                raise ValueError(
                    f"{config.index_type} incremental build into a fresh "
                    "directory requires the trained centroid table"
                )
            centroids.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, "centroids")
            )
            seed_nlist = centroids.count()
            if config.index_type == "IVFPQ":
                if codebooks is None:
                    raise ValueError(
                        "IVFPQ incremental build into a fresh directory "
                        "requires the trained codebooks"
                    )
                from webscale_vector_search_spark.sources.index_io import (
                    write_codebooks,
                )

                write_codebooks(spark, out_dir, codebooks)
                seed_pq_m = int(codebooks.shape[0])
        seed_meta = metadata_dict(
            num_shards=config.num_shards,
            index_type=config.index_type,
            vector_dim=config.vector_dim,
            total_vectors=0,
            nlist=seed_nlist,
            pq_m=seed_pq_m,
            pq_residual=config.index_type == "IVFPQ" and config.pq_residual,
            metric=config.metric,
        )
        if config.index_type == "HNSW":
            seed_meta["hnsw_graph"] = True
            seed_meta["hnsw"] = {
                "m": config.hnsw_m,
                "ef_construction": config.hnsw_ef_construction,
                "seed": config.seed,
            }
        write_metadata(out_dir, seed_meta)
    # the appended codes MUST match the sidecar's encoding: a residual
    # index (build_index default) streamed raw codes would silently
    # mis-score every appended vector under the residual ADC expansion
    from webscale_vector_search_spark.sources.index_io import read_metadata

    meta_now = read_metadata(out_dir)
    pq_residual = bool(meta_now.get("pq_residual"))
    # the stream's writes must match the STORED layout, not the caller's
    # config: appending shard_id= partitions into a centroid_id= dataset
    # (or hashing into more shards than serving iterates) is silent data
    # loss. index_type mismatches refuse; layout-determining knobs
    # (num_shards, the hnsw build params) come from the sidecar below.
    stored_type = meta_now.get("index_type")
    if stored_type and stored_type != config.index_type:
        legacy_hnsw_via_ivf = (
            stored_type == "HNSW"
            and not meta_now.get("hnsw_graph")
            and config.index_type == "IVF"
        )
        if not legacy_hnsw_via_ivf:
            raise ValueError(
                f"config.index_type={config.index_type!r} but the index was "
                f"built as {stored_type!r} — appended partitions would not "
                "match the stored layout"
            )
    num_shards = int(meta_now.get("num_shards") or config.num_shards)
    # IVF-family appends into an EXISTING index must assign against the
    # STORED centroid table (ADVICE r11): the layout checks above verify
    # index_type/num_shards/metric but previously trusted a caller-passed
    # centroids table — a mismatched one silently files appended vectors
    # into cells no probe selection will ever route their queries to. Same
    # refuse-on-mismatch discipline as the other layout knobs: the stored
    # table wins; a passed table that DISAGREES (count or contents) is an
    # error, not a preference. Both tables are nlist-sized, so the exact
    # comparison is a bounded job.
    if config.index_type in ("IVF", "IVFPQ"):
        stored_cent_dir = os.path.join(out_dir, "centroids")
        if any(
            f.endswith(".parquet")
            for f in (os.listdir(stored_cent_dir) if os.path.isdir(stored_cent_dir) else [])
        ):
            stored_cents = spark.read.parquet(stored_cent_dir)
            if centroids is not None:
                from pyspark.sql import functions as F

                def _norm(df, name):
                    # common frame for the comparison: a float32 table
                    # passed against a float64 store (or vice versa) must
                    # compare by value, not by schema accident
                    return df.select(
                        F.col("centroid_id").cast("int").alias("centroid_id"),
                        F.col("cvec").cast("array<double>").alias(name),
                    )

                # tolerant per-element comparison (ADVICE r12): exact float
                # equality refused callers whose table round-tripped through
                # a lossy path (float32 re-encode, float64 recompute) even
                # though the geometry is identical. 1e-5 absolute on O(1)-
                # magnitude centroids is ~100x a float32 round-trip error
                # and ~10000x below any genuinely different centroid.
                tol = 1e-5
                n_passed, n_stored = centroids.count(), stored_cents.count()
                if n_passed != n_stored:
                    raise ValueError(
                        f"the passed centroids table has {n_passed} rows but "
                        f"the stored <{out_dir}>/centroids has {n_stored} — "
                        "appended vectors would be filed into cells the "
                        "probe selector never routes to; pass the stored "
                        "table (or nothing: it is used automatically)"
                    )
                n_bad = (
                    _norm(centroids, "cvec_p")
                    .join(_norm(stored_cents, "cvec_s"), "centroid_id", "full_outer")
                    .where(
                        F.col("cvec_p").isNull()
                        | F.col("cvec_s").isNull()
                        | (F.size("cvec_p") != F.size("cvec_s"))
                        | (
                            F.array_max(
                                F.zip_with(
                                    "cvec_p", "cvec_s",
                                    lambda x, y: F.abs(x - y),
                                )
                            )
                            > tol
                        )
                    )
                    .count()
                )
                if n_bad:
                    raise ValueError(
                        f"{n_bad} centroid rows of the passed table disagree "
                        f"with the stored <{out_dir}>/centroids beyond "
                        f"tol={tol} (by id, element-wise) — appended vectors "
                        "would be filed into cells the probe selector never "
                        "routes to; pass the stored table (or nothing: it "
                        "is used automatically)"
                    )
            centroids = stored_cents
    # appends to an attributed index must carry the attr columns: epochs
    # published without them read back as NULLs and never match any filter
    # (same contract as plans.build.append_vectors, one layer down)
    missing_attrs = [
        c for c in (meta_now.get("attr_cols") or []) if c not in stream_df.columns
    ]
    if missing_attrs:
        raise ValueError(
            f"index stores attr_cols {meta_now.get('attr_cols')} but the "
            f"stream is missing {missing_attrs} — appended rows would never "
            "match an attribute filter"
        )
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
    _tok: list = []

    def _token() -> str:
        # lazy: the checkpoint's metadata file exists once the stream starts
        if not _tok:
            _tok.append(_stream_token(checkpoint_dir))
        return _tok[0]

    def _maybe_auto_compact(spark_: SparkSession, epoch_id: int) -> None:
        if auto_compact_every and (epoch_id + 1) % auto_compact_every == 0:
            from webscale_vector_search_spark.plans.build import compact_index

            compact_index(spark_, out_dir)

    if config.index_type == "FLAT":

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if _epoch_done(out_dir, _token(), epoch_id):
                # replayed epoch, already fully published — still run the
                # compaction tick: a crash in the marker-to-offset window
                # must not skip this epoch's scheduled compaction
                _maybe_auto_compact(batch_df.sparkSession, epoch_id)
                return
            sharded = hash_shard(batch_df, num_shards)
            # cluster by target dir: without this, every batch writes
            # tasks x shards files (the small-file drift compact_index
            # exists to repair — cheaper to avoid per batch)
            sharded = sharded.repartition(num_shards, "shard_id")
            _publish_epoch(sharded, out_dir, "shard_id", _token(), epoch_id)
            _maybe_auto_compact(batch_df.sparkSession, epoch_id)

    elif config.index_type == "IVF":
        if centroids is None:
            raise ValueError("IVF incremental build requires the trained centroid table")
        cents = centroids
        cents_count = cents.count()

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if _epoch_done(out_dir, _token(), epoch_id):
                _maybe_auto_compact(batch_df.sparkSession, epoch_id)
                return
            assigned = assign_centroids(batch_df, cents).repartition(
                max(1, cents_count), "centroid_id"
            )
            _publish_epoch(assigned, out_dir, "centroid_id", _token(), epoch_id)
            _maybe_auto_compact(batch_df.sparkSession, epoch_id)

    elif config.index_type == "HNSW":
        # true incremental graph insertion (HNSW is an incremental
        # structure): each micro-batch is inserted into the affected shards'
        # stored graphs and ONLY those shard partitions are rewritten
        # (dynamic partition overwrite — neighbor lists of existing nodes
        # change when new nodes link in, so an append-only write can't
        # represent the update). Legacy centroid-layout HNSW artifacts take
        # the IVF append path with explicit centroids instead.
        hnsw_params = meta_now.get("hnsw") or {}
        m_ = hnsw_params.get("m", config.hnsw_m)
        efc_ = hnsw_params.get("ef_construction", config.hnsw_ef_construction)
        seed_ = hnsw_params.get("seed", config.seed)
        if not meta_now.get("hnsw_graph"):
            raise ValueError(
                "HNSW incremental append requires a graph artifact "
                "(build_index since r5); legacy centroid-layout HNSW "
                "indexes append via index_type='IVF' with their centroids"
            )

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if _epoch_done(out_dir, _token(), epoch_id):
                # marker short-circuit; extend_shard_graphs' dup-skip below
                # stays as defense in depth for a lost marker
                _maybe_auto_compact(batch_df.sparkSession, epoch_id)
                return
            from webscale_vector_search_spark.operators.hnsw_partition import (
                extend_shard_graphs,
                freeze_graphs,
            )

            vectors_dir = vectors_path(out_dir)
            # one source evaluation per batch: the touched-shard list and the
            # graph-extension job both read `sharded`, so cache it for the
            # epoch (micro-batches are small by construction)
            sharded = hash_shard(batch_df, num_shards).persist()
            touched = [
                r["shard_id"]
                for r in sharded.select("shard_id").distinct().collect()
            ]
            graphs = extend_shard_graphs(
                sharded, vectors_dir, m=m_, ef_construction=efc_, seed=seed_
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
                vectors_dir, num_shards, spark=batch_df.sparkSession, shards=touched
            )
            _mark_epoch(out_dir, _token(), epoch_id)
            _maybe_auto_compact(batch_df.sparkSession, epoch_id)

    elif config.index_type == "IVFPQ":
        if meta_now.get("pq_local_codebooks"):
            raise ValueError(
                "incremental append to a per-cell-LOPQ index is not supported "
                "(the stream encodes with one global codebook); use a "
                "global-codebook IVFPQ for streaming ingest"
            )
        # stored codebooks win, same discipline as the centroid check
        # above: appended batches encoded with a DIFFERENT codebook are
        # silently mis-scored by every ADC read thereafter. The stored
        # table is float32-exact, so the comparison casts the passed books
        # to float32 (what write_codebooks would persist) before equating.
        cb_dir = os.path.join(out_dir, "codebooks")
        if any(
            f.endswith(".parquet")
            for f in (os.listdir(cb_dir) if os.path.isdir(cb_dir) else [])
        ):
            import numpy as _np

            from webscale_vector_search_spark.sources.index_io import read_codebooks

            stored_books = read_codebooks(spark, out_dir)
            if codebooks is not None:
                passed = _np.asarray(codebooks)
                if passed.shape != stored_books.shape or not _np.array_equal(
                    passed.astype(_np.float32),
                    stored_books.astype(_np.float32),
                ):
                    raise ValueError(
                        "the passed codebooks disagree with the stored "
                        f"<{out_dir}>/codebooks — appended codes would be "
                        "mis-scored by ADC at search time; pass the stored "
                        "books (or nothing: they are used automatically)"
                    )
            codebooks = stored_books
        if centroids is None or codebooks is None:
            raise ValueError("IVFPQ incremental build requires fixed centroids AND codebooks")
        cents = centroids
        cents_count = cents.count()
        books = codebooks
        # a global-OPQ index stores rotated codes: appended batches must
        # encode through the SAME stored rotation or their codes are
        # silently mis-scored by the rotated ADC decode at search time
        from webscale_vector_search_spark.sources.index_io import read_rotation

        stored_rot = read_rotation(spark, out_dir)

        def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if _epoch_done(out_dir, _token(), epoch_id):
                _maybe_auto_compact(batch_df.sparkSession, epoch_id)
                return
            from webscale_vector_search_spark.operators.pq import encode

            assigned = encode(
                assign_centroids(batch_df, cents),
                books,
                centroids=cents if pq_residual else None,
                rotation=stored_rot,
            ).repartition(max(1, cents_count), "centroid_id")
            _publish_epoch(assigned, out_dir, "centroid_id", _token(), epoch_id)
            _maybe_auto_compact(batch_df.sparkSession, epoch_id)

    else:
        raise ValueError(f"unknown index_type {config.index_type!r}")

    query = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return IndexBuildQuery(query, spark, out_dir)


class IndexBuildQuery:
    """The handle incremental_build returns: the StreamingQuery plus the
    sidecar contract. When the `availableNow` run DRAINS — awaitTermination
    or processAllAvailable returns and the query is no longer active — the
    sidecar's ``total_vectors`` is refreshed automatically, once; operators
    no longer have to remember :func:`refresh_metadata` (the stale-sidecar
    trap: foreachBatch epochs cannot maintain the driver-side JSON
    transactionally, so the recount must happen at drain). Every other
    attribute delegates to the wrapped StreamingQuery. A caller that
    bypasses both methods (polling ``isActive`` directly) keeps the manual
    refresh_metadata() responsibility."""

    def __init__(self, query, spark: SparkSession, out_dir: str):
        self._query = query
        self._spark = spark
        self._out_dir = out_dir
        self._refreshed = False

    def _refresh_if_drained(self) -> None:
        if not self._refreshed and not self._query.isActive:
            self._refreshed = True
            refresh_metadata(self._spark, self._out_dir)

    def awaitTermination(self, timeout=None):
        res = (
            self._query.awaitTermination()
            if timeout is None
            else self._query.awaitTermination(timeout)
        )
        self._refresh_if_drained()
        return res

    def processAllAvailable(self) -> None:
        self._query.processAllAvailable()
        self._refresh_if_drained()

    def __getattr__(self, name):
        return getattr(self._query, name)


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

    # the count is a long Spark job and the sidecar can change under it
    # (an auto-compaction flipping vectors_dir, a delete setting
    # has_tombstones): never write back the PRE-count snapshot — that would
    # roll the pointer back to a pre-compaction version and resurrect
    # deleted rows. Re-read after counting and update ONLY total_vectors;
    # if the pointer moved mid-count, recount against the new version.
    for _ in range(3):
        meta = read_metadata(index_dir)
        total = spark.read.parquet(vectors_path(index_dir, meta)).count()
        fresh = read_metadata(index_dir)
        if fresh.get("vectors_dir") == meta.get("vectors_dir"):
            fresh["total_vectors"] = total
            write_metadata(index_dir, fresh)
            # appends grow the corpus the recall curve was measured on;
            # past the growth bar the curve (NOT delta-maintainable, unlike
            # the stats tables) gets flagged observably stale — every
            # append path funnels through this recount (VERDICT r12 ask #2)
            from webscale_vector_search_spark.sources.recall_curve import (
                note_corpus_mutation,
            )

            note_corpus_mutation(index_dir, total_now=total)
            return read_metadata(index_dir)
    # pointer kept flipping (continuous compaction): the freshest sidecar
    # already carries the compaction's own recount — leave it untouched
    return read_metadata(index_dir)


def incremental_delete(
    spark: SparkSession,
    ids_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Stream deletions into an index: each micro-batch of (vec_id) rows
    appends to the tombstone table (plans.build.delete_vectors), taking
    effect on the next search.

    No epoch markers needed: tombstones are a SET under the search-time
    anti-join, so a crash-replayed batch re-appends the same ids and
    changes nothing — idempotent by data structure rather than by
    bookkeeping (contrast incremental_build, whose appends need staged
    publication). Compaction (manual or the append stream's
    auto_compact_every) materializes and clears as usual; a tombstone
    appended concurrently with a compaction lands after the rewrite's
    snapshot read and simply stays pending for the next one.
    """
    from webscale_vector_search_spark.plans.build import delete_vectors

    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_delete_checkpoint")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        delete_vectors(spark, index_dir, batch_df.select("vec_id"))

    writer = (
        ids_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
