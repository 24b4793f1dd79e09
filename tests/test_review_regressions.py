"""Regression tests for defects found in the round-1 code review."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_qvec_hash_distinguishes_sub_1e6_differences(spark):
    """A fixed-decimal hash key would collide vectors differing below 1e-6
    and serve wrong cached results (the reference's quirk Q3 class)."""
    from webscale_vector_search_spark.functions.hashing import qvec_hash

    df = spark.createDataFrame(
        [(0, [0.1234567] * 4), (1, [0.1234571] * 4), (2, [0.1234567] * 4)],
        "id BIGINT, v ARRAY<FLOAT>",
    ).select("id", qvec_hash(F.col("v")).alias("h"))
    rows = {r["id"]: r["h"] for r in df.collect()}
    assert rows[0] != rows[1], "sub-1e-6 difference must produce distinct hashes"
    assert rows[0] == rows[2], "identical vectors must hash equal"


def test_knn_sharded_accepts_existing_shard_col(spark):
    from webscale_vector_search_spark.operators.knn import knn, knn_sharded

    corpus = spark.createDataFrame(
        [(i, [float(i)] * 4, i % 3) for i in range(30)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, my_shard INT",
    )
    queries = spark.createDataFrame(
        [(0, [5.0] * 4)], "query_id BIGINT, qvec ARRAY<FLOAT>"
    )
    got = knn_sharded(corpus, queries, k=5, shard_col="my_shard").toPandas()
    want = knn(corpus, queries, k=5).toPandas()
    assert got.sort_values("rank")["neighbor_id"].tolist() == (
        want.sort_values("rank")["neighbor_id"].tolist()
    )
    assert set(got["shard_id"]) <= {0, 1, 2}


def test_validate_vectors_rejects_null_rows(spark):
    from webscale_vector_search_spark.schemas import validate_vectors

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="NULL"):
        validate_vectors(df, 2)


def test_fingerprint_short_vector_matches_python_semantics(spark):
    """Reference semantics: v[:8] + v[-8:] — a 4-dim vector repeats all four
    components; Spark's negative slice alone would silently return []."""
    from webscale_vector_search_spark.functions.hashing import fingerprint

    df = spark.createDataFrame([(0, [0.1, 0.2, 0.3, 0.4])], "id BIGINT, v ARRAY<FLOAT>")
    fp = df.select(fingerprint(F.col("v")).alias("fp")).collect()[0]["fp"]
    parts = fp.split(",")
    assert len(parts) == 8, fp  # 4 leading + 4 trailing (duplicated), like python
    assert parts[:4] == parts[4:]


def test_npy_version2_header(spark, tmp_path):
    """Format-2.0 .npy files (4-byte header length framing) must ingest."""
    import io

    import numpy as np
    from numpy.lib import format as npf

    from webscale_vector_search_spark.sources.npy import read_npy

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = tmp_path / "v2.npy"
    with open(path, "wb") as f:
        npf.write_array(f, arr, version=(2, 0))
    got = read_npy(spark, str(path)).orderBy("vec_id").toPandas()
    assert len(got) == 3
    assert np.array_equal(np.vstack(got["embedding"].to_numpy()), arr)


def test_cached_search_collapses_duplicate_cache_entries(spark, tmp_path):
    """Simulated concurrent writers: the same key appended twice must not
    duplicate result rows on a cache hit."""
    from webscale_vector_search_spark.operators.knn import knn
    from webscale_vector_search_spark.plans.rewrite import cached_search

    corpus = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(20)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    queries = spark.createDataFrame([(0, [3.0] * 4)], "query_id BIGINT, qvec ARRAY<FLOAT>")
    fn = lambda qs: knn(corpus, qs, k=5)  # noqa: E731
    cache_dir = str(tmp_path / "cache")

    cached_search(spark, cache_dir, queries, fn, k=5).count()  # miss -> append
    # second writer appends the same entries (simulates a concurrent job)
    import glob
    import shutil

    for p in glob.glob(f"{cache_dir}/k=5/index=v0/*.parquet"):
        shutil.copy(p, p.replace(".parquet", "_dup.parquet"))
    got = cached_search(spark, cache_dir, queries, fn, k=5).toPandas()
    assert len(got) == 5, f"duplicate cache entries must collapse, got {len(got)} rows"
