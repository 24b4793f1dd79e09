"""Property tests for the kNN operators (SURVEY.md §5.2 #2).

- self-query invariant: rank 1 of query v is v itself at distance 0
- merge correctness: sharded partial+final == unsharded exact, for several
  shard counts (the reference's scatter-gather merge contract, K2/K3 vs K1)
- k rows per query, ascending distances, distance symmetry
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.operators.knn import knn, knn_sharded, similarity_join
from webscale_vector_search_spark.sources.fixtures import load_table, queries_from_embeddings

K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_SMOKE).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return queries_from_embeddings(spark, SF_SMOKE, 20).cache()


@pytest.fixture(scope="module")
def exact(corpus, queries):
    return knn(corpus, queries, k=K).toPandas()


def test_self_query_rank1_distance0(exact):
    rank1 = exact[exact["rank"] == 1]
    assert (rank1["query_id"] == rank1["neighbor_id"]).all()
    assert (rank1["distance"] == 0.0).all()


def test_k_rows_per_query_ascending(exact):
    for qid, grp in exact.groupby("query_id"):
        assert len(grp) == K
        d = grp.sort_values("rank")["distance"].tolist()
        assert d == sorted(d)


@pytest.mark.parametrize("num_shards", [1, 3, 16])
def test_merge_equals_exact(corpus, queries, exact, num_shards):
    sharded = knn_sharded(corpus, queries, k=K, num_shards=num_shards).toPandas()
    a = exact.sort_values(["query_id", "rank"])[["query_id", "rank", "neighbor_id", "distance"]]
    b = sharded.sort_values(["query_id", "rank"])[["query_id", "rank", "neighbor_id", "distance"]]
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_similarity_join_symmetric_and_thresholded(spark, corpus):
    small = corpus.filter(F.col("vec_id") < 30)
    pairs = similarity_join(small, small, threshold=2.0).toPandas()
    assert (pairs["distance"] < 2.0).all()
    # self-pairs at distance 0 present for every vector
    selfp = pairs[pairs["left_id"] == pairs["right_id"]]
    assert len(selfp) == 30
    assert (selfp["distance"] == 0.0).all()
    # symmetry: (a,b) implies (b,a) with equal distance
    keys = {(a, b): d for a, b, d in pairs.itertuples(index=False)}
    for (a, b), d in keys.items():
        assert keys.get((b, a)) == d


def test_pandas_kernel_matches_sql(corpus, queries, exact):
    """The numpy fast path must return the same neighbors as the SQL kernel
    (distances agree to 1e-6 after the shared rounding policy)."""
    from webscale_vector_search_spark.operators.knn import knn_pandas

    fast = knn_pandas(corpus, queries, k=K).toPandas()
    a = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = fast.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
    assert (a["distance"] - b["distance"]).abs().max() <= 2e-6


def test_cached_search_roundtrip(spark, corpus, queries, exact, tmp_path_factory):
    """S8 results table: first run = all misses; second run = all hits; both
    must equal the direct exact search."""
    from webscale_vector_search_spark.operators.knn import knn
    from webscale_vector_search_spark.plans.rewrite import cached_search

    cache_dir = str(tmp_path_factory.mktemp("results_cache"))
    fn = lambda qs: knn(corpus, qs, k=K)  # noqa: E731
    want = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)

    for attempt in ("miss", "hit"):
        got = (
            cached_search(spark, cache_dir, queries, fn, k=K)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        cols = ["query_id", "rank", "neighbor_id", "distance"]
        assert got[cols].equals(want[cols]), f"cached_search diverged on {attempt} pass"


def test_salted_count_equals_plain(spark):
    from webscale_vector_search_spark.operators.shard import salted_count
    from webscale_vector_search_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, "events", SF_SMOKE)
    plain = (
        ev.groupBy("event_type").count().withColumnRenamed("count", "n")
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    salted = (
        salted_count(ev, ["event_type"], salt_buckets=8)
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    assert plain.equals(salted)
