"""Targeted compaction: delete materialization proportional to the
DELETED data, not the corpus (r10).

The reference rebuilds whole indexes to remove vectors
(vector_search_cluster.py:977-1068); our full compaction already beats
that, but still rewrites every partition. The common production delete is
CLUSTERED — a tenant or retention window whose vectors embed together —
so the tombstoned rows live in few inverted lists / shards. compact_index
mode="auto" detects that shape (no fragmentation to re-pack AND affected
partitions under half) and routes through the upsert machinery
(_physical_delete): only affected partitions rewrite, untouched partition
dirs hardlink forward into the new version, and the commit is the same
vectors.v{N} + sidecar pointer flip.

Invariants:
- auto picks targeted for clustered deletes, full for uniform ones and
  for fragmented indexes; mode="full" is always honored;
- untouched partitions are carried as hardlinks (same inode — no data
  movement), rewritten partitions lose exactly the dead rows;
- results equal exact brute force over live rows (full-probe IVF), HNSW
  never returns deleted ids and keeps recall;
- total_vectors is exact after the flip; tombstones retire; attr stats
  (global + per-cell) subtract the removed combos.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import recall_at_k
from webscale_vector_search_spark.operators.knn import knn_pandas
from webscale_vector_search_spark.plans.build import (
    build_index,
    compact_index,
    delete_vectors,
    search_index,
)
from webscale_vector_search_spark.sources.index_io import open_index, read_metadata

NCL, DIM, N = 16, 16, 4000
DEAD = f"vec_id % {NCL} = 7"  # exactly one natural cluster dies


def _clustered_pdf(seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 4.0, (NCL, DIM))
    ids = np.arange(N)
    vecs = centers[ids % NCL] + rng.normal(0.0, 0.1, (N, DIM))
    return pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": (ids % NCL % 4).astype("int32"),
        }
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_clustered_pdf()).cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    rows = corpus.filter(f"NOT ({DEAD})").limit(12).collect()
    return spark.createDataFrame(
        [(int(r["vec_id"]), r["embedding"]) for r in rows],
        "query_id BIGINT, qvec ARRAY<FLOAT>",
    ).cache()


@pytest.fixture(scope="module")
def live_oracle(corpus, queries):
    return knn_pandas(
        corpus.filter(f"NOT ({DEAD})").select("vec_id", "embedding"), queries, k=10
    ).cache()


def _partition_inodes(vdir, part_col):
    """Inodes of each partition's parquet data files (bundle fingerprints
    are legitimately rewritten per version — the hardlink guarantee is
    about the immutable data)."""
    out = {}
    for entry in os.listdir(vdir):
        if entry.startswith(f"{part_col}="):
            d = os.path.join(vdir, entry)
            out[entry] = {
                f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }
    return out


def test_targeted_ivf_clustered_delete(spark, corpus, queries, live_oracle,
                                       tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tc_ivf") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
        attr_cols=["label"],
    )
    old_dir = os.path.join(out, "vectors")
    before = _partition_inodes(old_dir, "centroid_id")
    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))

    report = compact_index(spark, out)
    assert report["mode"] == "targeted"
    n_parts = len(before)
    assert 0 < report["partitions_rewritten"] <= n_parts // 2

    # untouched partitions forwarded as hardlinks: same inodes, no copy
    new_dir = os.path.join(out, report["vectors_dir"])
    after = _partition_inodes(new_dir, "centroid_id")
    forwarded = [p for p in after if p in before and after[p] == before[p]]
    assert len(forwarded) >= n_parts - report["partitions_rewritten"]

    # exactness: full-probe IVF == brute force over live rows; totals exact
    h = open_index(spark, out)
    got = search_index(spark, h, queries, k=10, nprobe=NCL)
    assert recall_at_k(got, live_oracle, k=10) == 1.0
    meta = read_metadata(out)
    n_live = corpus.filter(f"NOT ({DEAD})").count()
    assert meta["total_vectors"] == n_live
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    assert "has_tombstones" not in meta
    # targeted skips the re-profile by cost contract — the curve's lag is
    # recorded, not silent (VERDICT r11 #6)
    assert meta["profile_stale"] is True

    # planner stats subtracted the dead cluster's combos exactly
    from webscale_vector_search_spark.sources.attr_stats import (
        load_cell_stats_pdf,
        load_stats_pdf,
    )

    assert int(load_stats_pdf(h)["count"].sum()) == n_live
    cpdf = load_cell_stats_pdf(h)
    assert int(cpdf["count"].sum()) == n_live


def test_targeted_matches_serve_local(spark, corpus, queries, tmp_path_factory):
    from webscale_vector_search_spark.plans.serve_local import serve_local

    out = str(tmp_path_factory.mktemp("tc_serve") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))
    assert compact_index(spark, out)["mode"] == "targeted"

    h = open_index(spark, out)
    got = search_index(spark, h, queries, k=5, nprobe=4).collect()
    qrows = queries.collect()
    q = (
        np.array([r["query_id"] for r in qrows], dtype=np.int64),
        np.stack([r["qvec"] for r in qrows]).astype(np.float64),
    )
    local = serve_local(h, q, k=5, nprobe=4)
    spark_rows = {
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["distance"], 6))
        for r in got
    }
    local_rows = {
        (int(a), int(b), int(c), round(float(d), 6))
        for a, b, c, d in zip(
            local["query_id"], local["rank"], local["neighbor_id"],
            local["distance"],
        )
    }
    assert spark_rows == local_rows


def test_targeted_hnsw_rebuilds_only_affected_shards(spark, corpus, queries,
                                                     tmp_path_factory):
    """Content-hash sharding spreads id-pattern deletes uniformly, so the
    clustered-delete shape for HNSW is 'one shard dies' (e.g. decommission
    a shard's tenant): only that shard's graph rebuilds; the other seven
    forward as hardlinks, bundles re-fingerprinted for the new paths."""
    out = str(tmp_path_factory.mktemp("tc_hnsw") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="HNSW", num_shards=8, vector_dim=DIM),
    )
    old_dir = os.path.join(out, "vectors")
    before = _partition_inodes(old_dir, "shard_id")
    stored = spark.read.parquet(old_dir)
    dead = stored.filter("shard_id = 0").select("vec_id").cache()
    dead_set = {r["vec_id"] for r in dead.collect()}
    assert 0 < len(dead_set) < N // 4
    delete_vectors(spark, out, dead)

    report = compact_index(spark, out)
    assert report["mode"] == "targeted"
    assert report["partitions_rewritten"] == 1
    meta = read_metadata(out)
    new_dir = os.path.join(out, meta["vectors_dir"])
    after = _partition_inodes(new_dir, "shard_id")
    forwarded = [p for p in after if p in before and after[p] == before[p]]
    assert len(forwarded) >= len(before) - 1
    # shard 0 lost EVERY row -> its partition dir is simply absent
    assert "shard_id=0" not in after

    h = open_index(spark, out)
    got = search_index(spark, h, queries, k=10)
    got_ids = {r["neighbor_id"] for r in got.collect()}
    assert not (got_ids & dead_set)
    live_oracle = knn_pandas(
        corpus.join(
            spark.createDataFrame([(i,) for i in dead_set], "vec_id BIGINT"),
            "vec_id", "left_anti",
        ).select("vec_id", "embedding"),
        queries, k=10,
    )
    assert recall_at_k(got, live_oracle, k=10) >= 0.9
    assert meta["total_vectors"] == N - len(dead_set)


def test_open_handle_across_targeted_compaction(spark, corpus, queries,
                                                live_oracle,
                                                tmp_path_factory):
    """The freshness contract (maybe_refresh) holds for the targeted path
    too: a handle opened before the clustered delete serves the complete
    old index until the pointer flips, then the complete new one — and it
    observes the flip on its very next search without an explicit reopen."""
    out = str(tmp_path_factory.mktemp("tc_fresh") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    handle = open_index(spark, out)
    search_index(spark, handle, queries, k=5, nprobe=NCL).collect()  # warm

    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))
    report = compact_index(spark, out)
    assert report["mode"] == "targeted"

    got = search_index(spark, handle, queries, k=10, nprobe=NCL)
    assert recall_at_k(got, live_oracle, k=10) == 1.0
    # and the handle's view of the totals matches the committed sidecar
    assert handle.meta["total_vectors"] == corpus.filter(f"NOT ({DEAD})").count()


def test_uniform_delete_falls_back_to_full(spark, corpus, tmp_path_factory):
    """Every-9th-id deletes land in ~every cell: rewriting 'just' the
    affected partitions would rewrite everything through the slower
    selective plan — auto must pick the full rewrite."""
    out = str(tmp_path_factory.mktemp("tc_full") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    delete_vectors(spark, out, corpus.select("vec_id").filter("vec_id % 9 = 0"))
    report = compact_index(spark, out)
    assert report["mode"] == "full"
    assert report["rows"] == corpus.filter("NOT (vec_id % 9 = 0)").count()


def test_mode_full_forces_full_rewrite(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tc_force") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))
    report = compact_index(spark, out, mode="full")
    assert report["mode"] == "full"
    assert report["rows"] == corpus.filter(f"NOT ({DEAD})").count()


def test_fragmented_index_falls_back_to_full(spark, corpus, tmp_path_factory):
    """A streaming-fragmented index needs the re-pack — targeted
    materialization would leave the fragmentation in place."""
    from webscale_vector_search_spark.plans.build import append_vectors

    out = str(tmp_path_factory.mktemp("tc_frag") / "idx")
    half = corpus.filter(f"vec_id < {N // 2}")
    build_index(
        spark, half, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    # several small appends -> one file per epoch per touched partition
    rest = corpus.filter(f"vec_id >= {N // 2}")
    for i in range(3):
        append_vectors(
            spark, out,
            rest.filter(f"vec_id % 3 = {i}").select("vec_id", "embedding"),
        )
    import glob

    vdir = os.path.join(out, read_metadata(out).get("vectors_dir", "vectors"))
    files = len(glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True))
    n_parts = sum(1 for e in os.listdir(vdir) if e.startswith("centroid_id="))
    assert files > 2 * n_parts, "fixture must actually be fragmented"

    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))
    report = compact_index(spark, out)
    assert report["mode"] == "full"
    assert report["files_after"] <= 2 * n_parts


def test_targeted_keeps_tombstones_added_during_rewrite(spark, corpus,
                                                        queries,
                                                        tmp_path_factory,
                                                        monkeypatch):
    """A delete wave landing between the targeted compaction's tombstone
    snapshot and its commit must survive as pending (only snapshotted
    files retire, the has_tombstones flag stays set) and be excluded from
    search. Injected by wrapping _physical_delete so the late wave lands
    mid-compaction, after the snapshot."""
    from webscale_vector_search_spark.plans import build as B

    out = str(tmp_path_factory.mktemp("tc_race") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVF", nlist=NCL, vector_dim=DIM),
    )
    delete_vectors(spark, out, corpus.select("vec_id").filter(DEAD))
    late_ids = [int(r["vec_id"]) for r in
                corpus.filter(f"vec_id % {NCL} = 3").limit(5).collect()]

    orig = B._physical_delete

    def inject(spark_, index_dir, ids, **kw):
        delete_vectors(spark_, index_dir, late_ids)
        return orig(spark_, index_dir, ids, **kw)

    monkeypatch.setattr(B, "_physical_delete", inject)
    report = compact_index(spark, out)
    assert report["mode"] == "targeted"

    meta = read_metadata(out)
    assert meta.get("has_tombstones") is True
    assert os.path.isdir(os.path.join(out, "tombstones"))
    res = search_index(spark, out, queries, k=10, nprobe=NCL)
    got = {r["neighbor_id"] for r in res.collect()}
    assert not (got & set(late_ids))
    assert not any(int(v) % NCL == 7 for v in got)
