"""Tombstone deletes + compaction materialization (r9).

The reference has NO delete path at all — removing vectors means
re-running create_sharded_index over a new corpus
(vector_search_cluster.py:977-1068). Here deletes are LSM-style:
`delete_vectors` appends ids to a tombstones/ table, every search path
excludes them immediately (Spark and serve_local, all four index types),
and `compact_index` materializes them — rewriting the rows out, rebuilding
affected HNSW shard graphs, and clearing the table.

Invariants under test:
- a deleted id NEVER appears in results, on any path, immediately;
- FLAT/full-probe-IVF results equal exact brute force over the live rows;
- serve_local stays bit-identical to search_index under pending deletes;
- compaction drops the rows physically (tombstones dir gone,
  total_vectors updated) and search results are unchanged (exact paths)
  or recall-bounded (HNSW, whose affected shard graphs are rebuilt);
- deleting twice / deleting unknown ids is harmless.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import recall_at_k
from webscale_vector_search_spark.operators.knn import knn_pandas
from webscale_vector_search_spark.plans.build import (
    build_index,
    compact_index,
    delete_vectors,
    search_index,
)
from webscale_vector_search_spark.sources.fixtures import load_table, queries_from_embeddings
from webscale_vector_search_spark.sources.index_io import open_index, read_metadata

NLIST = 16
# every 9th id dies — includes some query ids' self-hits, the harshest case
DEAD = "vec_id % 9 = 0"


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_ORACLE).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return queries_from_embeddings(spark, SF_ORACLE, 12).cache()


@pytest.fixture(scope="module")
def dead_ids(spark, corpus):
    return corpus.select("vec_id").filter(DEAD).cache()


@pytest.fixture(scope="module")
def live_oracle(corpus, queries):
    return knn_pandas(corpus.filter(f"NOT ({DEAD})"), queries, k=10).cache()


def _build_with_deletes(spark, corpus, dead_ids, root, name, cfg):
    out = str(root / name)
    build_index(spark, corpus, out, cfg)
    n = delete_vectors(spark, out, dead_ids)
    assert n > 0
    return out


@pytest.fixture(scope="module")
def idx_root(tmp_path_factory):
    return tmp_path_factory.mktemp("del_idx")


@pytest.fixture(scope="module")
def flat_dir(spark, corpus, dead_ids, idx_root):
    return _build_with_deletes(spark, corpus, dead_ids, idx_root, "flat",
                               EngineConfig(index_type="FLAT"))


@pytest.fixture(scope="module")
def ivf_dir(spark, corpus, dead_ids, idx_root):
    return _build_with_deletes(spark, corpus, dead_ids, idx_root, "ivf",
                               EngineConfig(index_type="IVF", nlist=NLIST))


@pytest.fixture(scope="module")
def ivfpq_dir(spark, corpus, dead_ids, idx_root):
    return _build_with_deletes(
        spark, corpus, dead_ids, idx_root, "ivfpq",
        EngineConfig(index_type="IVFPQ", nlist=NLIST, pq_m=16))


@pytest.fixture(scope="module")
def hnsw_dir(spark, corpus, dead_ids, idx_root):
    return _build_with_deletes(spark, corpus, dead_ids, idx_root, "hnsw",
                               EngineConfig(index_type="HNSW", num_shards=4))


def _rows(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["distance"], 6))
        for r in df.collect()
    }


def _no_dead(df):
    return df.filter("neighbor_id % 9 = 0").count() == 0


def test_flat_deleted_excluded_exact(spark, flat_dir, queries, live_oracle):
    res = search_index(spark, flat_dir, queries, k=10)
    assert _no_dead(res)
    assert _rows(res) == _rows(live_oracle)


def test_ivf_full_probe_deleted_exact(spark, ivf_dir, queries, live_oracle):
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST)
    assert _no_dead(res)
    assert _rows(res) == _rows(live_oracle)


def test_ivfpq_deleted_excluded(spark, ivfpq_dir, queries, live_oracle):
    res = search_index(spark, ivfpq_dir, queries, k=10, nprobe=NLIST)
    assert _no_dead(res)
    assert recall_at_k(res, live_oracle, k=10) >= 0.9


def test_hnsw_deleted_excluded(spark, hnsw_dir, queries, live_oracle):
    res = search_index(spark, hnsw_dir, queries, k=10)
    assert _no_dead(res)
    assert recall_at_k(res, live_oracle, k=10) >= 0.85


def test_serve_local_deleted_bit_identical(spark, ivf_dir, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    import pandas as pd

    h = open_index(spark, ivf_dir)
    want = (
        search_index(spark, h, queries, k=10, nprobe=8)
        .toPandas()[["query_id", "rank", "neighbor_id", "distance"]]
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    got = (
        serve_local(h, queries, k=10, nprobe=8)[
            ["query_id", "rank", "neighbor_id", "distance"]
        ].sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        want.astype(got.dtypes.to_dict()), got, check_exact=True
    )


def test_serve_local_hnsw_deleted(spark, hnsw_dir, queries, live_oracle):
    from webscale_vector_search_spark.plans.serve_local import serve_local

    h = open_index(spark, hnsw_dir)
    got = serve_local(h, queries, k=10)
    assert (got["neighbor_id"] % 9 == 0).sum() == 0


def test_delete_idempotent(spark, ivf_dir, dead_ids, queries, live_oracle):
    """Deleting the same ids again changes nothing."""
    delete_vectors(spark, ivf_dir, dead_ids)
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(live_oracle)


def test_delete_with_filter_composes(spark, corpus, dead_ids, queries, idx_root):
    """Tombstones + where compose: both exclusions apply."""
    out = str(idx_root / "ivf_attr")
    attrd = corpus.withColumn("label", (F.col("vec_id") % 7).cast("int"))
    build_index(spark, attrd, out, EngineConfig(index_type="IVF", nlist=NLIST),
                attr_cols=["label"])
    delete_vectors(spark, out, dead_ids)
    oracle = knn_pandas(
        attrd.filter(f"NOT ({DEAD})").filter("label = 3"), queries, k=10
    )
    res = search_index(spark, out, queries, k=10, nprobe=NLIST, where="label = 3")
    assert _rows(res) == _rows(oracle)


def test_metadata_flags_tombstones(spark, ivf_dir):
    assert read_metadata(ivf_dir).get("has_tombstones") is True


def test_compaction_materializes(spark, corpus, dead_ids, queries, live_oracle,
                                 idx_root):
    """Compaction drops rows physically and clears the tombstone table;
    results identical before/after (full-probe IVF — exact path)."""
    out = str(idx_root / "ivf_compact")
    build_index(spark, corpus, out, EngineConfig(index_type="IVF", nlist=NLIST))
    delete_vectors(spark, out, dead_ids)
    before = _rows(search_index(spark, out, queries, k=10, nprobe=NLIST))
    report = compact_index(spark, out)
    assert report["tombstones_applied"] is True
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    meta = read_metadata(out)
    n_dead = dead_ids.count()
    assert meta["total_vectors"] == corpus.count() - n_dead
    assert "has_tombstones" not in meta
    h = open_index(spark, out)
    assert h.tombstones is None
    assert h.vectors.count() == meta["total_vectors"]
    after = _rows(search_index(spark, h, queries, k=10, nprobe=NLIST))
    assert after == before == _rows(live_oracle)


def test_compaction_rebuilds_hnsw_graphs(spark, corpus, dead_ids, queries,
                                         live_oracle, idx_root):
    """HNSW compaction rebuilds affected shard graphs: no dangling
    adjacency (all neighbor ids live), recall holds vs the live oracle."""
    out = str(idx_root / "hnsw_compact")
    build_index(spark, corpus, out, EngineConfig(index_type="HNSW", num_shards=4))
    delete_vectors(spark, out, dead_ids)
    compact_index(spark, out)
    h = open_index(spark, out)
    assert h.tombstones is None
    # no stored neighbor may reference a deleted node
    dangling = (
        h.vectors.select(F.explode("hnsw_neighbors").alias("lvl"))
        .select(F.explode("lvl").alias("nbr"))
        .filter("nbr >= 0")  # -1 is the padding sentinel
        .join(F.broadcast(dead_ids.withColumnRenamed("vec_id", "nbr")),
              "nbr", "left_semi")
        .count()
    )
    res = search_index(spark, out, queries, k=10)
    assert _no_dead(res)
    assert recall_at_k(res, live_oracle, k=10) >= 0.85
    assert dangling == 0


def test_tombstone_anti_join_is_broadcast(spark, ivf_dir, queries):
    """The tombstone exclusion must be a BROADCAST left-anti against the
    streamed probed scan — a shuffled anti-join would exchange the corpus
    at 100 TB."""
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti, "no anti-join in the tombstoned search plan"
    assert any("Broadcast" in l for l in anti), (
        "tombstone anti-join is not broadcast:\n" + "\n".join(anti)
    )


def test_incremental_delete_stream(spark, corpus, queries, idx_root):
    """Streaming deletes: a file stream of ids drains through
    incremental_delete and the ids are excluded from the next search —
    identical to having called delete_vectors in batch."""
    from webscale_vector_search_spark.streaming.build_stream import incremental_delete

    out = str(idx_root / "ivf_stream_del")
    build_index(spark, corpus, out, EngineConfig(index_type="IVF", nlist=NLIST))
    src = str(idx_root / "del_ids_src")
    dead = corpus.select("vec_id").filter(DEAD)
    dead.repartition(3).write.mode("overwrite").parquet(src)
    ids_stream = (
        spark.readStream.schema(dead.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_delete(spark, ids_stream, out,
                           trigger={"availableNow": True})
    q.awaitTermination(120)
    assert not q.isActive
    live_oracle = knn_pandas(corpus.filter(f"NOT ({DEAD})"), queries, k=10)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(live_oracle)


def test_compaction_keeps_tombstones_added_during_rewrite(spark, corpus,
                                                          queries, idx_root):
    """The compaction race guard: tombstone files appended AFTER the
    rewrite's snapshot read must survive the commit as pending (only the
    snapshotted files are removed). Simulated by appending a second delete
    between snapshot and commit via the same file-level mechanism
    compaction uses — here, sequentially: delete A, compact, delete B must
    still be pending and excluded."""
    import glob as _glob

    out = str(idx_root / "ivf_race")
    build_index(spark, corpus, out, EngineConfig(index_type="IVF", nlist=NLIST))
    delete_vectors(spark, out, [0, 9, 18])
    compact_index(spark, out)
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    # second wave lands after the compaction — pending, flagged, excluded
    delete_vectors(spark, out, [27, 36])
    meta = read_metadata(out)
    assert meta.get("has_tombstones") is True
    files = _glob.glob(os.path.join(out, "tombstones", "*.parquet"))
    assert files
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    gone = {0, 9, 18, 27, 36}
    assert not any(r["neighbor_id"] in gone for r in res.collect())


def test_delete_unknown_ids_harmless(spark, corpus, queries, idx_root):
    out = str(idx_root / "ivf_unknown")
    build_index(spark, corpus, out, EngineConfig(index_type="IVF", nlist=NLIST))
    n = delete_vectors(spark, out, [10_000_000, 10_000_001])
    assert n == 2
    oracle = knn_pandas(corpus, queries, k=10)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(oracle)


def test_physical_delete_non_numeric_partition(spark, tmp_path_factory):
    """ADVICE r10: a null shard id writes __HIVE_DEFAULT_PARTITION__ —
    _physical_delete must neither crash parsing it as int nor hardlink the
    affected non-numeric partition forward beside its rewrite (which would
    resurrect the deleted rows), and the null partition's SURVIVORS must
    stay (isin() never matches NULL — the scan needs an isNull arm)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscale_vector_search_spark.plans.build import _physical_delete
    from webscale_vector_search_spark.sources.index_io import vectors_path

    corpus = load_table(spark, "embeddings", SF_ORACLE)
    out = str(tmp_path_factory.mktemp("nullpart") / "idx")
    build_index(spark, corpus, out, EngineConfig(index_type="FLAT", num_shards=2))
    vdir = vectors_path(out, read_metadata(out))
    dim = len(corpus.select("embedding").first()[0])
    # inject a null-shard partition (pathological input, e.g. an external
    # writer): 4 fresh rows under __HIVE_DEFAULT_PARTITION__
    nd = os.path.join(vdir, "shard_id=__HIVE_DEFAULT_PARTITION__")
    os.makedirs(nd)
    ids = [9_000_001, 9_000_002, 9_000_003, 9_000_004]
    vecs = np.arange(4 * dim, dtype="float32").reshape(4, -1)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(nd, "part-0.parquet"),
    )
    n_before = spark.read.parquet(vdir).count()
    dead = spark.createDataFrame([(9_000_001,)], "vec_id BIGINT")
    assert _physical_delete(spark, out, dead) == 1  # one affected partition
    survivors = spark.read.parquet(vectors_path(out, read_metadata(out)))
    got_ids = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    assert 9_000_001 not in got_ids  # deleted, not resurrected
    assert {9_000_002, 9_000_003, 9_000_004} <= got_ids  # null survivors kept
    assert survivors.count() == n_before - 1  # numeric partitions untouched
