"""Exactly-once streaming appends (T1 hardening, VERDICT r5 #3/#6):

foreachBatch is at-least-once; the epoch-publication protocol in
streaming/build_stream.py upgrades FLAT/IVF/IVFPQ appends to exactly-once.
These tests simulate the real crash window — the stream dies AFTER the
parquet publish work (partially or fully) but BEFORE the checkpoint's
offset commit — by deleting the checkpoint `commits/{epoch}` record (Spark
then replays that epoch with identical content on restart) plus,
for the partial-publish case, the epoch's marker and half its files.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.sources.fixtures import load_table
from webscale_vector_search_spark.sources.index_io import vectors_path
from webscale_vector_search_spark.streaming.build_stream import (
    _EPOCH_COMMITS,
    committed_epochs,
    incremental_build,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_SMOKE).cache()


def _stream_src(spark, corpus, src_dir: str, n_files: int = 4):
    corpus.repartition(n_files).write.mode("overwrite").parquet(src_dir)
    return _reread_src(spark, corpus, src_dir)


def _reread_src(spark, corpus, src_dir: str):
    """Re-open the SAME source files (a restart must not rewrite the source:
    the checkpoint's offsets reference the original file names)."""
    return (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _crash_last_epoch(out_dir: str, checkpoint_dir: str, partial: bool) -> tuple[str, int]:
    """Rewind the stream to just before its last epoch's offset commit.

    partial=True additionally simulates a crash MID-publish: the epoch's
    marker is removed and half its published files deleted, leaving the
    index in the partial state a reader could observe between crash and
    recovery."""
    token, last = max(committed_epochs(out_dir), key=lambda te: te[1])
    os.remove(os.path.join(checkpoint_dir, "commits", str(last)))
    crc = os.path.join(checkpoint_dir, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar must go with it
        os.remove(crc)
    if partial:
        os.remove(os.path.join(out_dir, _EPOCH_COMMITS, f"{token}-{last}"))
        files = sorted(
            glob.glob(
                os.path.join(vectors_path(out_dir), "*", f"ep{token}-{last}-*.parquet")
            )
        )
        assert files, "expected published epoch files to crash-partially"
        for f in files[::2]:
            os.remove(f)
    return token, last


def _assert_exactly_once(spark, out_dir: str, corpus) -> None:
    stored = spark.read.parquet(vectors_path(out_dir)).groupBy("vec_id").count()
    dups = stored.filter(F.col("count") > 1).count()
    assert dups == 0, f"{dups} vec_ids duplicated after replay"
    assert stored.count() == corpus.count(), "rows lost after replay"


def test_flat_partial_publish_replay(spark, corpus, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("flat_crash_src"))
    out = str(tmp_path_factory.mktemp("flat_crash_idx"))
    ckpt = os.path.join(out, "_checkpoint")
    cfg = EngineConfig(index_type="FLAT")
    incremental_build(spark, _stream_src(spark, corpus, src), out, cfg).awaitTermination(120)
    _crash_last_epoch(out, ckpt, partial=True)
    # restart the SAME checkpoint: Spark replays the uncommitted epoch with
    # identical content; the publish protocol must converge to one copy
    incremental_build(spark, _reread_src(spark, corpus, src), out, cfg).awaitTermination(120)
    _assert_exactly_once(spark, out, corpus)


def test_flat_marker_shortcircuit_replay(spark, corpus, tmp_path_factory):
    """Crash AFTER the marker but before the offset commit: the replayed
    epoch must be a no-op (the marker short-circuit), not a duplication."""
    src = str(tmp_path_factory.mktemp("flat_mk_src"))
    out = str(tmp_path_factory.mktemp("flat_mk_idx"))
    ckpt = os.path.join(out, "_checkpoint")
    cfg = EngineConfig(index_type="FLAT")
    incremental_build(spark, _stream_src(spark, corpus, src), out, cfg).awaitTermination(120)
    n_files_before = len(glob.glob(os.path.join(vectors_path(out), "*", "*.parquet")))
    _crash_last_epoch(out, ckpt, partial=False)
    incremental_build(spark, _reread_src(spark, corpus, src), out, cfg).awaitTermination(120)
    n_files_after = len(glob.glob(os.path.join(vectors_path(out), "*", "*.parquet")))
    assert n_files_before == n_files_after, "marker short-circuit rewrote files"
    _assert_exactly_once(spark, out, corpus)


def test_ivf_crash_then_manual_compaction_then_replay(spark, corpus, tmp_path_factory):
    """The nastiest interleaving: crash mid-publish, an operator runs
    compact_index BEFORE the stream restarts (it must drop the orphan
    partial epoch rather than fold it into the base), then the replay
    republishes the epoch whole — still exactly-once."""
    from webscale_vector_search_spark.operators.ivf import assign_centroids, train_centroids
    from webscale_vector_search_spark.plans.build import compact_index

    cents = train_centroids(spark, corpus, nlist=8, seed=42, sample_fraction=1.0).cache()
    src = str(tmp_path_factory.mktemp("ivf_crash_src"))
    out = str(tmp_path_factory.mktemp("ivf_crash_idx"))
    ckpt = os.path.join(out, "_checkpoint")
    cfg = EngineConfig(index_type="IVF")
    incremental_build(
        spark, _stream_src(spark, corpus, src), out, cfg, centroids=cents
    ).awaitTermination(120)
    _crash_last_epoch(out, ckpt, partial=True)
    compact_index(spark, out)
    incremental_build(
        spark, _reread_src(spark, corpus, src), out, cfg, centroids=cents
    ).awaitTermination(120)
    _assert_exactly_once(spark, out, corpus)
    # content (not just counts) matches the batch assignment
    want = (
        assign_centroids(corpus, cents)
        .select("vec_id", "centroid_id")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = (
        spark.read.parquet(vectors_path(out))
        .select("vec_id", "centroid_id")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert want.equals(got)


def test_ivfpq_partial_publish_replay(spark, corpus, tmp_path_factory):
    from webscale_vector_search_spark.operators.ivf import assign_centroids, train_centroids
    from webscale_vector_search_spark.operators.pq import encode, fit_codebooks

    cents = train_centroids(spark, corpus, nlist=8, seed=42, sample_fraction=1.0).cache()
    books = fit_codebooks(assign_centroids(corpus, cents), m=16, seed=42, centroids=cents)
    src = str(tmp_path_factory.mktemp("pq_crash_src"))
    out = str(tmp_path_factory.mktemp("pq_crash_idx"))
    ckpt = os.path.join(out, "_checkpoint")
    cfg = EngineConfig(index_type="IVFPQ")
    incremental_build(
        spark, _stream_src(spark, corpus, src), out, cfg, centroids=cents, codebooks=books
    ).awaitTermination(120)
    _crash_last_epoch(out, ckpt, partial=True)
    incremental_build(
        spark, _reread_src(spark, corpus, src), out, cfg, centroids=cents, codebooks=books
    ).awaitTermination(120)
    _assert_exactly_once(spark, out, corpus)
    # the replayed epoch's codes are bit-identical to the batch encoder's
    want = (
        encode(assign_centroids(corpus, cents), books, centroids=cents)
        .select("vec_id", "codes")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = (
        spark.read.parquet(vectors_path(out))
        .select("vec_id", "codes")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert want["vec_id"].tolist() == got["vec_id"].tolist()
    assert all((a == b).all() for a, b in zip(want["codes"], got["codes"]))


def test_fresh_checkpoint_appends_are_not_dropped(spark, corpus, tmp_path_factory):
    """Markers are scoped by the checkpoint's stream UUID: a NEW stream
    (fresh checkpoint, epoch ids restarting at 0) into the same index must
    append, not be swallowed by the previous stream's epoch-0 marker."""
    first = corpus.filter(F.col("vec_id") % 2 == 0)
    rest = corpus.filter(F.col("vec_id") % 2 == 1)
    out = str(tmp_path_factory.mktemp("fresh_ckpt_idx"))
    cfg = EngineConfig(index_type="FLAT")
    src1 = str(tmp_path_factory.mktemp("fresh_src1"))
    incremental_build(
        spark, _stream_src(spark, first, src1), out, cfg,
        checkpoint_dir=os.path.join(out, "_ck1"),
    ).awaitTermination(120)
    src2 = str(tmp_path_factory.mktemp("fresh_src2"))
    incremental_build(
        spark, _stream_src(spark, rest, src2), out, cfg,
        checkpoint_dir=os.path.join(out, "_ck2"),
    ).awaitTermination(120)
    _assert_exactly_once(spark, out, corpus)


def test_auto_compaction_bounds_files(spark, corpus, tmp_path_factory):
    """A long-running append with auto_compact_every keeps per-partition
    file counts bounded without operator action, flips the version pointer,
    and loses/duplicates nothing across the compactions."""
    from webscale_vector_search_spark.sources.index_io import read_metadata

    src = str(tmp_path_factory.mktemp("autoc_src"))
    out = str(tmp_path_factory.mktemp("autoc_idx"))
    cfg = EngineConfig(index_type="FLAT", num_shards=4)
    incremental_build(
        spark,
        _stream_src(spark, corpus, src, n_files=6),
        out,
        cfg,
        auto_compact_every=2,
    ).awaitTermination(180)
    meta = read_metadata(out)
    assert meta.get("vectors_dir", "vectors").startswith("vectors.v"), (
        "auto-compaction never flipped the version pointer"
    )
    _assert_exactly_once(spark, out, corpus)
    # 6 epochs x 4 shards would land >= 24 files un-compacted; the last
    # compaction ran at epoch 5 (the final one), so the live dir holds the
    # compacted base only
    live = vectors_path(out)
    n_files = len(glob.glob(os.path.join(live, "*", "*.parquet")))
    assert n_files <= 8, f"auto-compaction left {n_files} files"
