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


def test_knn_query_pads_disconnected_component():
    """A shard whose entry reaches fewer than k nodes must pad with
    label -1 / distance inf instead of crashing the serving job."""
    import numpy as np

    from webscale_vector_search_spark.operators.hnsw_partition import PyHNSW

    g = PyHNSW(4, M=4, ef_construction=16)
    rng = np.random.default_rng(3)
    g.add_items(rng.normal(0, 1, (6, 4)))
    # surgically strand nodes: entry keeps links only to node 1
    for i in range(len(g.links)):
        g.links[i] = {lc: [] for lc in g.links[i]}
    other = 1 if g.entry != 1 else 2
    g.links[g.entry][0] = [other]
    g.links[other][0] = [g.entry]
    labels, dists = g.knn_query(rng.normal(0, 1, (3, 4)), k=5, ef=16)
    assert labels.shape == (3, 5)
    assert (labels >= 0).sum(axis=1).max() <= 2  # only the 2-node component
    assert np.isinf(dists[labels == -1]).all()
    assert (labels[:, 0] >= 0).all()  # the found neighbors come first


def test_frozen_bundle_survives_directory_move(spark, tmp_path):
    """Frozen serving bundles fingerprint by basename: moving or copying
    an index directory must not silently demote every load to the slow
    parquet decode path. Legacy bundles (absolute-path fingerprints) are
    normalized, not invalidated."""
    import json
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from webscale_vector_search_spark.operators.hnsw_partition import (
        _load_frozen,
        build_hnsw_graphs,
        freeze_shard_graph,
    )

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(80, dtype="int64"),
            "embedding": [v.tolist() for v in rng.normal(0, 1, (80, 8)).astype("float32")],
        }
    )
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "g")
    from webscale_vector_search_spark.operators.shard import hash_shard

    graphs = build_hnsw_graphs(hash_shard(corpus, 2), m=4, ef_construction=16)
    graphs.write.partitionBy("shard_id").parquet(out)
    shard = os.path.join(out, "shard_id=0")
    freeze_shard_graph(shard)
    assert _load_frozen(shard, 4, 16) is not None
    # move the whole index: copy2 preserves mtimes, like mv/rsync -a
    moved = str(tmp_path / "relocated")
    shutil.copytree(out, moved, copy_function=shutil.copy2)
    assert _load_frozen(os.path.join(moved, "shard_id=0"), 4, 16) is not None
    # legacy bundle: rewrite the fingerprint with pre-r11 absolute paths
    fp_file = os.path.join(shard, "_graph", "fingerprint.json")
    with open(fp_file) as f:
        fp = json.load(f)
    legacy = [[os.path.join(shard, t[0]), t[1], t[2]] for t in fp]
    with open(fp_file, "w") as f:
        json.dump(legacy, f)
    assert _load_frozen(shard, 4, 16) is not None


def test_lopq_sampling_never_drops_a_cell(spark):
    """fit_codebooks_per_list with an aggressive sample_fraction must still
    emit a codebook row for EVERY cell — a dropped small cell would
    KeyError the full-corpus encode."""
    import numpy as np
    import pandas as pd

    from webscale_vector_search_spark.operators.pq import fit_codebooks_per_list

    rng = np.random.default_rng(9)
    # cell 0: 2000 rows; cell 1: 3 rows (the sample will miss it)
    n0, n1 = 2000, 3
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n0 + n1, dtype="int64"),
            "embedding": [v.tolist() for v in rng.normal(0, 1, (n0 + n1, 8))],
            "centroid_id": [0] * n0 + [1] * n1,
        }
    )
    assigned = spark.createDataFrame(pdf)
    cents = spark.createDataFrame(
        pd.DataFrame(
            {"centroid_id": [0, 1], "cvec": [[0.0] * 8, [10.0] * 8]}
        )
    )
    books = fit_codebooks_per_list(
        assigned, m=4, centroids=cents, n_codes=4, sample_fraction=0.05
    )
    cells = {int(r["centroid_id"]) for r in books.select("centroid_id").collect()}
    assert cells == {0, 1}


def test_fit_codebooks_sparse_centroid_ids_match_dense(spark):
    """Residual codebook training must assign samples to REAL centroids
    only: sparse centroid ids (gaps in the id space) must train the same
    books as the identical layout with dense ids — the padded lookup
    array's phantom zero rows must never win an argmin."""
    import numpy as np
    import pandas as pd

    from webscale_vector_search_spark.operators.pq import fit_codebooks

    rng = np.random.default_rng(11)
    # one cluster near the origin: under phantom-row assignment it would
    # pick the zero vector instead of its true (distant-id) centroid
    V = np.concatenate(
        [rng.normal(0.2, 0.05, (50, 8)), rng.normal(8.0, 0.05, (50, 8))]
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(100, dtype="int64"),
            "embedding": [v.tolist() for v in V],
        }
    )
    corpus = spark.createDataFrame(pdf)
    c_vecs = [[0.2] * 8, [8.0] * 8]

    def books_for(ids):
        cents = spark.createDataFrame(
            pd.DataFrame({"centroid_id": ids, "cvec": c_vecs})
        )
        return fit_codebooks(
            corpus, m=4, seed=42, n_codes=4, centroids=cents, n_total=100
        )

    np.testing.assert_array_equal(books_for([0, 1]), books_for([3, 7]))


def test_assign_centroids_gapped_ids_match_sql(spark):
    """assign_centroids must emit REAL centroid ids: non-dense id spaces
    (split_oversized_lists retires parents, adds children past the old max)
    previously got positional argmin labels — vectors filed into wrong or
    retired inverted lists."""
    import pandas as pd

    from webscale_vector_search_spark.operators.ivf import (
        assign_centroids,
        assign_centroids_sql,
    )

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [100, 101, 102],
                "embedding": [[0.1, 0.1], [5.0, 5.1], [9.9, 10.0]],
            }
        )
    )
    cents = spark.createDataFrame(
        pd.DataFrame(
            {
                "centroid_id": [0, 1, 3, 7],
                "cvec": [[0.0, 0.0], [2.0, 2.0], [5.0, 5.0], [10.0, 10.0]],
            }
        )
    )
    a = {r["vec_id"]: r["centroid_id"] for r in assign_centroids(corpus, cents).collect()}
    b = {r["vec_id"]: r["centroid_id"] for r in assign_centroids_sql(corpus, cents).collect()}
    assert a == b == {100: 0, 101: 3, 102: 7}


def test_topk_null_distance_ranks_last(spark):
    """A NULL distance (one corrupt corpus row) must not take rank 1 for
    every query — Spark's asc() is nulls-FIRST; DuckDB's ASC is nulls-last,
    so nulls-last is also the oracle ordering."""
    from webscale_vector_search_spark.operators.knn import topk

    scored = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, None), (1, 12, 0.9)],
        "query_id BIGINT, vec_id BIGINT, distance DOUBLE",
    )
    res = topk(scored, 2).orderBy("rank").collect()
    assert [r["vec_id"] for r in res] == [10, 12]


def test_det_hash_no_overflow_past_3e9(spark):
    """det_hash's split form must produce the EXACT naive-formula value for
    any id (oracle parity) without the BIGINT overflow the naive Spark
    expression hits past ~3.4e9 under ANSI mode."""
    from webscale_vector_search_spark.functions.hashing import (
        _ADD,
        _MOD,
        _seed_mult,
        det_hash,
    )

    ids = [0, 1, 12345, 3_000_000_000, 4_000_000_000, 10**11, 2**46]
    df = spark.createDataFrame([(i,) for i in ids], "id BIGINT").select(
        "id", det_hash(F.col("id"), 42).alias("h")
    )
    got = {r["id"]: r["h"] for r in df.collect()}
    for i in ids:
        assert got[i] == ((i + 42) * _seed_mult(42) + _ADD) % _MOD


def test_distinct_seeds_give_independent_draws(spark):
    """Two samples at different seeds must overlap ~at the product of their
    rates: the old affine det_hash draw made every seed's draw the seed-0
    draw plus a constant (measured 0% overlap where ~1% is expected) —
    eval holdouts systematically excluded from/contained in training
    samples instead of drawn independently. The md5 sample_draw fixes it."""
    from webscale_vector_search_spark.operators.sampling import (
        RATE_DENOM,
        sample_draw,
    )

    n = 200_000
    df = spark.range(n)
    rate = 1000  # 10%
    a = df.filter((sample_draw(F.col("id"), 0) % RATE_DENOM) < rate)
    b = df.filter((sample_draw(F.col("id"), 1) % RATE_DENOM) < rate)
    overlap = a.join(b, "id").count()
    expected = n * 0.1 * 0.1
    assert 0.7 * expected < overlap < 1.3 * expected
    # seed=0 det_hash values are UNCHANGED by the seed-mixing hardening
    # (stored shard layouts depend on them): _seed_mult(0) == _MULT
    from webscale_vector_search_spark.functions.hashing import _MULT, _seed_mult

    assert _seed_mult(0) == _MULT


def test_sample_draw_matches_duckdb_oracle(spark):
    """sample_draw's Spark values must equal its DuckDB oracle twin."""
    import duckdb

    from webscale_vector_search_spark.operators.sampling import (
        sample_draw,
        sample_draw_sql,
    )

    ids = [0, 1, 42, 999_999, 10**12]
    got = {
        r["id"]: r["h"]
        for r in spark.createDataFrame([(i,) for i in ids], "id BIGINT")
        .select("id", sample_draw(F.col("id"), 7).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for i in ids:
        exp = con.execute(f"SELECT {sample_draw_sql(str(i), 7)}").fetchone()[0]
        assert got[i] == exp, (i, got[i], exp)


def test_short_and_null_docs_survive_text_kernels(spark):
    """Docs shorter than the gram width (and NULL texts) must not crash the
    ANSI-mode SQL kernels, and the pandas LSH twin must drop NULL texts
    exactly like the SQL form."""
    from webscale_vector_search_spark.operators.dedup import (
        band_signatures_pandas,
        band_signatures_sql,
        shingles,
        simhash64,
        simhash_feature_hashes,
    )
    from webscale_vector_search_spark.operators.textops import (
        repetition_signals,
        winnow_fingerprint,
    )

    d = spark.createDataFrame(
        [(1, "a b"), (2, "hello"), (3, "a b c d e"), (4, None)],
        "doc_id BIGINT, text STRING",
    )
    sh = {r["doc_id"]: r["s"] for r in d.filter("text IS NOT NULL").select(
        "doc_id", shingles(F.col("text")).alias("s")).collect()}
    assert sh[1] == ["a b"] and sh[2] == ["hello"]  # partial shingles
    assert len(sh[3]) == 3
    # simhash forms run on 1-token docs
    assert d.filter("text IS NOT NULL").select(
        simhash64(F.col("text")), simhash_feature_hashes(F.col("text"))
    ).count() == 3
    # repetition/winnow run on short docs
    sigs = repetition_signals(F.col("text"))
    d.filter("text IS NOT NULL").select(
        winnow_fingerprint(F.col("text")), *[v.alias(k) for k, v in sigs.items()]
    ).collect()
    # the pandas twin stays BIT-IDENTICAL to the SQL twin on NULL text
    # (both emit the empty-shingle signature) instead of crashing
    sig_sql = sorted(map(tuple, band_signatures_sql(d).collect()))
    sig_pd = sorted(map(tuple, band_signatures_pandas(d).collect()))
    assert sig_pd == sig_sql
    assert any(r[0] == 4 for r in sig_pd)
