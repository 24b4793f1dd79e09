"""Reference-parity API tests: npy ingest -> create_sharded_index ->
VectorCluster.distributed_search, matching §3's entry points."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.api import VectorCluster, create_sharded_index
from webscale_vector_search_spark.sources.fixtures import load_table
from webscale_vector_search_spark.sources.npy import read_npy


@pytest.fixture(scope="module")
def npy_corpus_path(tmp_path_factory):
    """Two .npy files (multi-producer corpus) with 80 x 64 known vectors."""
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("npy_corpus")
    a = rng.normal(size=(50, 64)).astype(np.float32)
    b = rng.normal(size=(30, 64)).astype(np.float32)
    np.save(d / "part-0.npy", a)
    np.save(d / "part-1.npy", b)
    return str(d), np.vstack([a, b])


def test_read_npy_ids_and_values(spark, npy_corpus_path):
    path, expected = npy_corpus_path
    df = read_npy(spark, path).orderBy("vec_id").toPandas()
    assert len(df) == 80
    assert df["vec_id"].tolist() == list(range(80))
    got = np.vstack(df["embedding"].to_numpy())
    assert np.array_equal(got, expected)


def test_create_index_from_npy_and_search(spark, npy_corpus_path, tmp_path_factory):
    path, expected = npy_corpus_path
    out = str(tmp_path_factory.mktemp("npy_idx"))
    create_sharded_index(spark, path, out, num_shards=4, index_type="FLAT")

    cluster = VectorCluster(spark, out)
    res = cluster.distributed_search(expected[7].tolist(), k=5)
    assert res["indices"][0] == 7  # self-query
    assert res["distances"][0] == 0.0
    assert res["distances"] == sorted(res["distances"])
    assert res["num_shards_failed"] == 0
    stats = cluster.get_stats()
    assert stats["total_queries"] == 1
    assert stats["total_vectors"] == 80


def test_hnsw_capability_high_recall(spark, tmp_path_factory):
    """index_type=HNSW builds IVF artifacts searched at a high-recall probe
    default; recall@10 must clear the bar that makes it 'the HNSW slot'."""
    from webscale_vector_search_spark.operators.ivf import recall_at_k
    from webscale_vector_search_spark.operators.knn import knn
    from webscale_vector_search_spark.plans.build import search_index
    from webscale_vector_search_spark.sources.fixtures import queries_from_embeddings
    from webscale_vector_search_spark.config import EngineConfig
    from webscale_vector_search_spark.plans.build import build_index

    corpus = load_table(spark, "embeddings", SF_SMOKE)
    out = str(tmp_path_factory.mktemp("hnsw_idx"))
    build_index(
        spark, corpus, out, EngineConfig(index_type="HNSW", nlist=16, kmeans_sample_fraction=1.0)
    )
    queries = queries_from_embeddings(spark, SF_SMOKE, 20)
    exact = knn(corpus, queries, k=10)
    approx = search_index(spark, out, queries, k=10)  # default high-recall nprobe
    assert recall_at_k(approx, exact, k=10) >= 0.9


def test_hnswlib_path_gates_cleanly(spark):
    """The optional per-partition hnswlib path must either work (if the lib
    is installed) or raise a clear NotImplementedError pointing at the IVF
    fallback — never an ImportError at module import time."""
    from webscale_vector_search_spark.operators import hnsw_partition

    corpus = load_table(spark, "embeddings", SF_SMOKE)
    queries = spark.createDataFrame([(0, [0.0] * 64)], "query_id BIGINT, qvec ARRAY<FLOAT>")
    if hnsw_partition.HAS_HNSWLIB:
        res = hnsw_partition.hnsw_partition_search(corpus, queries, k=5)
        assert res.count() == 5
    else:
        with pytest.raises(NotImplementedError, match="hnswlib"):
            hnsw_partition.hnsw_partition_search(corpus, queries, k=5)
