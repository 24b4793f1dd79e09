"""spread_if_narrow (r13): input-skew repartition of compute-heavy kNN scans.

A single-row-group parquet file is an unsplittable scan — one task does the
whole O(|corpus| x |queries|) distance stage regardless of cluster width
(guide §2.5). spread_if_narrow round-robins such an input across the
session's parallelism; these tests pin the two contracts that make it safe:

1. results are BIT-identical for every caller shape (per-row distances +
   total-order (distance, vec_id) top-k are partitioning-independent);
2. the guard: an input already at/above cluster width is returned UNCHANGED
   (no shuffle is added at scale).
"""

import pytest

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.operators import knn as knn_ops
from webscale_vector_search_spark.operators.knn import spread_if_narrow
from webscale_vector_search_spark.sources.fixtures import (
    load_table,
    queries_from_embeddings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_SMOKE)


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return queries_from_embeddings(spark, SF_SMOKE, 8)


def test_spread_fires_on_single_file_scan(spark, corpus):
    """The sf fixture tables are one single-row-group file each (the exact
    input-skew shape): the spread must widen them to the session's
    parallelism."""
    par = spark.sparkContext.defaultParallelism
    assert corpus.rdd.getNumPartitions() < par  # precondition: narrow scan
    assert spread_if_narrow(corpus).rdd.getNumPartitions() == par


def test_spread_noop_at_or_above_cluster_width(spark, corpus):
    """An input already as wide as the cluster must pass through untouched —
    at 100 TB the corpus arrives in thousands of splits and adding a
    payload shuffle here would be the regression the guard exists to
    prevent."""
    par = spark.sparkContext.defaultParallelism
    wide = corpus.repartition(par)
    assert spread_if_narrow(wide) is wide
    wider = corpus.repartition(2 * par)
    assert spread_if_narrow(wider) is wider


def test_knn_results_identical_under_spread(spark, corpus, queries):
    """knn / knn_sharded over the spread corpus == over the raw corpus,
    including distances (per-row fold) and rank order (total tie-break)."""
    par = spark.sparkContext.defaultParallelism
    raw = corpus  # knn() spreads internally; compare against forced-wide
    a = knn_ops.knn(raw, queries, k=5).orderBy("query_id", "rank").collect()
    b = (
        knn_ops.knn(raw.repartition(par), queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b
    c = (
        knn_ops.knn_sharded(raw, queries, k=5, num_shards=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    d = (
        knn_ops.knn_sharded(raw.repartition(par), queries, k=5, num_shards=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert c == d


def test_knn_pandas_results_identical_under_spread(spark, corpus, queries):
    """The Arrow kernel's per-row dot-expansion distances must not depend on
    which task (or Arrow batch) a corpus row lands in: the spread re-bins
    rows across tasks, so pin kernel output equality raw-vs-wide."""
    from webscale_vector_search_spark.operators.knn import knn_pandas

    par = spark.sparkContext.defaultParallelism
    a = knn_pandas(corpus, queries, k=5).orderBy("query_id", "rank").collect()
    b = (
        knn_pandas(corpus.repartition(par), queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b
