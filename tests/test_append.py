"""Batch append / upsert (r9): the CRUD completion.

append_vectors derives every build parameter from the stored artifact and
drains the rows through the exactly-once streaming machinery; upsert
physically replaces old versions (tombstones can't express replace-by-id —
the exclusion joins on vec_id alone) then appends.

Reference parity note: the reference's only mutation is a full
create_sharded_index rebuild (vector_search_cluster.py:977-1068);
DistributedVectorIndexBuilder (1071-1242) appends between builds but never
replaces. Replace-by-id and attr-consistent append are §2.9 extensions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import recall_at_k
from webscale_vector_search_spark.operators.knn import knn_pandas
from webscale_vector_search_spark.plans.build import (
    append_vectors,
    build_index,
    compact_index,
    delete_vectors,
    search_index,
    upsert_vectors,
)
from webscale_vector_search_spark.sources.fixtures import load_table, queries_from_embeddings
from webscale_vector_search_spark.sources.index_io import open_index, read_metadata

NLIST = 16


@pytest.fixture(scope="module")
def full(spark):
    return load_table(spark, "embeddings", SF_ORACLE).cache()


@pytest.fixture(scope="module")
def corpus(full):
    """First 80% — the initial build."""
    n = full.count()
    return full.filter(F.col("vec_id") < int(n * 0.8)).cache()


@pytest.fixture(scope="module")
def extra(full):
    """Last 20% — the appended batch."""
    n = full.count()
    return full.filter(F.col("vec_id") >= int(n * 0.8)).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return queries_from_embeddings(spark, SF_ORACLE, 10).cache()


def _rows(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["distance"], 6))
        for r in df.collect()
    }


@pytest.mark.parametrize("itype,cfg_kw", [
    ("FLAT", {}),
    ("IVF", {"nlist": NLIST}),
    ("IVFPQ", {"nlist": NLIST, "pq_m": 16}),
    ("HNSW", {"num_shards": 4}),
])
def test_append_equals_full_build(spark, corpus, extra, full, queries,
                                  tmp_path_factory, itype, cfg_kw):
    """Build on 80%, append 20% -> results match the same search over a
    one-shot full build (exact equality where the path is exact, recall
    parity for the approximate ones)."""
    out = str(tmp_path_factory.mktemp(f"app_{itype.lower()}"))
    cfg = EngineConfig(index_type=itype, **cfg_kw)
    build_index(spark, corpus, out, cfg)
    n = append_vectors(spark, out, extra)
    assert n == extra.count()
    meta = read_metadata(out)
    assert meta["total_vectors"] == full.count()
    res = search_index(spark, out, queries, k=10,
                       nprobe=NLIST if itype in ("IVF", "IVFPQ") else None)
    oracle = knn_pandas(full, queries, k=10)
    if itype in ("FLAT", "IVF"):
        assert _rows(res) == _rows(oracle)
    else:
        assert recall_at_k(res, oracle, k=10) >= 0.85


def test_append_requires_attr_columns(spark, corpus, extra, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("app_attr"))
    # "grp" does NOT exist on the fixture (unlike "label", which does)
    attrd = corpus.withColumn("grp", (F.col("vec_id") % 7).cast("int"))
    build_index(spark, attrd, out, EngineConfig(index_type="IVF", nlist=NLIST),
                attr_cols=["grp"])
    with pytest.raises(ValueError, match="attr_cols"):
        append_vectors(spark, out, extra)  # no grp column


def test_append_with_attrs_filters_new_rows(spark, corpus, extra, full,
                                            queries, tmp_path_factory):
    """Appended rows carry attrs; a filtered search sees them."""
    out = str(tmp_path_factory.mktemp("app_attr2"))
    lab = lambda df: df.withColumn("label", (F.col("vec_id") % 7).cast("int"))
    build_index(spark, lab(corpus), out,
                EngineConfig(index_type="IVF", nlist=NLIST), attr_cols=["label"])
    append_vectors(spark, out, lab(extra))
    oracle = knn_pandas(lab(full).filter("label = 3"), queries, k=10)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST, where="label = 3")
    assert _rows(res) == _rows(oracle)


def test_upsert_clears_stale_tombstones(spark, corpus, extra, full, queries,
                                        tmp_path_factory):
    """Delete ids, then UPSERT them back: the rows must be visible again,
    exactly once (physical replace + stale-tombstone clearing — a plain
    append of an existing id would leave two physical rows, which is why
    re-adds are upsert's job)."""
    out = str(tmp_path_factory.mktemp("ups_tomb"))
    build_index(spark, full, out, EngineConfig(index_type="IVF", nlist=NLIST))
    extra_ids = extra.select("vec_id")
    delete_vectors(spark, out, extra_ids)
    # deleted: searches exclude the extra rows
    res1 = search_index(spark, out, queries, k=10, nprobe=NLIST)
    assert _rows(res1) == _rows(knn_pandas(corpus, queries, k=10))
    # upsert them back: full visibility, no duplicates, tombstones gone
    upsert_vectors(spark, out, extra)
    h = open_index(spark, out)
    assert h.tombstones is None
    assert h.vectors.count() == full.count()
    res2 = search_index(spark, h, queries, k=10, nprobe=NLIST)
    assert _rows(res2) == _rows(knn_pandas(full, queries, k=10))


def test_upsert_replaces_rows(spark, full, queries, tmp_path_factory):
    """Upsert moves some vectors to new embeddings: searches see exactly
    the new values, never the old (exact equality vs the mutated corpus)."""
    out = str(tmp_path_factory.mktemp("ups_ivf"))
    build_index(spark, full, out, EngineConfig(index_type="IVF", nlist=NLIST))
    # mutate every 13th vector: reverse its embedding
    moved = (
        full.filter("vec_id % 13 = 0")
        .withColumn("embedding", F.reverse(F.col("embedding")))
    )
    n = upsert_vectors(spark, out, moved)
    assert n == moved.count()
    mutated = full.filter("vec_id % 13 != 0").unionByName(moved)
    h = open_index(spark, out)
    assert h.vectors.count() == full.count()  # replaced, not duplicated
    res = search_index(spark, h, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(knn_pandas(mutated, queries, k=10))


def test_upsert_hnsw_rebuilds_affected_shards(spark, full, queries,
                                              tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ups_hnsw"))
    build_index(spark, full, out, EngineConfig(index_type="HNSW", num_shards=4))
    moved = (
        full.filter("vec_id % 31 = 0")
        .withColumn("embedding", F.reverse(F.col("embedding")))
    )
    upsert_vectors(spark, out, moved)
    h = open_index(spark, out)
    assert h.vectors.count() == full.count()
    # no duplicate ids
    assert h.vectors.select("vec_id").distinct().count() == full.count()
    mutated = full.filter("vec_id % 31 != 0").unionByName(moved)
    res = search_index(spark, h, queries, k=10)
    assert recall_at_k(res, knn_pandas(mutated, queries, k=10), k=10) >= 0.85


def test_upsert_new_ids_is_plain_append(spark, corpus, extra, full, queries,
                                        tmp_path_factory):
    """Upserting ids that don't exist yet degenerates to append."""
    out = str(tmp_path_factory.mktemp("ups_new"))
    build_index(spark, corpus, out, EngineConfig(index_type="IVF", nlist=NLIST))
    upsert_vectors(spark, out, extra)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(knn_pandas(full, queries, k=10))


def test_full_index_lifecycle(spark, full, queries, tmp_path_factory):
    """One index through its whole life: build(attrs) -> delete ->
    filtered search -> append -> compact -> upsert -> final searches match
    a pandas-side oracle at every step. Integration seams (tombstones x
    attrs x compaction x append) are exactly where unit tests miss."""
    out = str(tmp_path_factory.mktemp("lifecycle"))
    lab = lambda df: df.withColumn("label", (F.col("vec_id") % 5).cast("int"))
    n = full.count()
    old = lab(full.filter(F.col("vec_id") < int(n * 0.7)))
    build_index(spark, old, out, EngineConfig(index_type="IVF", nlist=NLIST),
                attr_cols=["label"])

    # 1. delete a slice; filtered search obeys both exclusions
    delete_vectors(spark, out, old.select("vec_id").filter("vec_id % 4 = 0"))
    live1 = old.filter("vec_id % 4 != 0")
    res = search_index(spark, out, queries, k=10, nprobe=NLIST, where="label = 2")
    assert _rows(res) == _rows(knn_pandas(live1.filter("label = 2"), queries, k=10))

    # 2. append new rows (with attrs); they join the searchable set
    new = lab(full.filter(F.col("vec_id") >= int(n * 0.7)))
    append_vectors(spark, out, new)
    live2 = live1.unionByName(new)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(knn_pandas(live2, queries, k=10))

    # 3. compact: tombstones materialize, results unchanged
    compact_index(spark, out)
    assert open_index(spark, out).tombstones is None
    res = search_index(spark, out, queries, k=10, nprobe=NLIST, where="label = 2")
    assert _rows(res) == _rows(knn_pandas(live2.filter("label = 2"), queries, k=10))

    # 4. upsert moved vectors; final state exact
    moved = live2.filter("vec_id % 7 = 0").withColumn(
        "embedding", F.reverse(F.col("embedding"))
    )
    upsert_vectors(spark, out, moved)
    final = live2.filter("vec_id % 7 != 0").unionByName(moved)
    h = open_index(spark, out)
    assert h.vectors.count() == final.count()
    res = search_index(spark, h, queries, k=10, nprobe=NLIST)
    assert _rows(res) == _rows(knn_pandas(final, queries, k=10))
    # the serving path agrees after the whole life
    from webscale_vector_search_spark.plans.serve_local import serve_local

    got = serve_local(h, queries, k=10, nprobe=NLIST)
    want = {(r["query_id"], r["rank"], r["neighbor_id"], round(r["distance"], 6))
            for r in res.collect()}
    have = {(int(a), int(b), int(c), round(float(d), 6))
            for a, b, c, d in zip(got["query_id"], got["rank"],
                                  got["neighbor_id"], got["distance"])}
    assert have == want


def test_append_opq_index_rotates_codes(spark, corpus, extra, full, queries,
                                        tmp_path_factory):
    """The latent-bug regression: appending to a global-OPQ IVFPQ index
    must encode through the STORED rotation — unrotated appended codes
    would silently mis-rank every appended vector."""
    out = str(tmp_path_factory.mktemp("app_opq"))
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="IVFPQ", nlist=NLIST, pq_m=16, pq_opq_iters=1),
    )
    append_vectors(spark, out, extra)
    res = search_index(spark, out, queries, k=10, nprobe=NLIST)
    oracle = knn_pandas(full, queries, k=10)
    assert recall_at_k(res, oracle, k=10) >= 0.9
