"""Filtered ANN (r9): search-time predicates over build-time attribute
columns, across all four index types.

Semantics under test:
- FLAT + where == exact brute-force over the pre-filtered corpus (equality).
- IVF + where at nprobe=nlist == the same exact filtered oracle (probing
  every list makes the probed scan the whole corpus, so the filter is the
  only difference — equality, not recall).
- IVF/IVFPQ + where at small nprobe: recall against the filtered oracle.
- HNSW + where: post-filter with oversampling; recall-bounded.
- allowed_ids: the FAISS IDSelector analog (reference has no per-id filter
  API at all — vector_search_cluster.py:761-764's QueryRequest carries only
  vector/k/all_shards; this is a §2.9 extension).
- Plan shape: the attr predicate must reach the probed scan's parquet
  PushedFilters (no join, no post-pass) — asserted on the IVF plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from webscale_vector_search_spark.config import EngineConfig
from webscale_vector_search_spark.operators.ivf import recall_at_k
from webscale_vector_search_spark.operators.knn import knn_pandas
from webscale_vector_search_spark.plans.build import build_index, search_index
from webscale_vector_search_spark.sources.fixtures import load_table, queries_from_embeddings
from webscale_vector_search_spark.sources.index_io import read_metadata

NLIST = 16
WHERE = "label = 3"


@pytest.fixture(scope="module")
def corpus(spark):
    """Embeddings with two attribute columns: label (7-way, the filter
    target) and bucket (unused by filters — proves multi-attr storage)."""
    emb = load_table(spark, "embeddings", SF_ORACLE)
    return (
        emb.withColumn("label", (F.col("vec_id") % 7).cast("int"))
        .withColumn("bucket", (F.col("vec_id") % 100).cast("int"))
        .cache()
    )


@pytest.fixture(scope="module")
def queries(spark):
    return queries_from_embeddings(spark, SF_ORACLE, 12).cache()


@pytest.fixture(scope="module")
def filtered_oracle(corpus, queries):
    """Exact top-10 over only the label=3 rows — ground truth for every arm."""
    return knn_pandas(corpus.filter(WHERE), queries, k=10).cache()


@pytest.fixture(scope="module")
def idx_root(tmp_path_factory):
    return tmp_path_factory.mktemp("filtered_idx")


@pytest.fixture(scope="module")
def flat_dir(spark, corpus, idx_root):
    out = str(idx_root / "flat")
    build_index(spark, corpus, out, EngineConfig(index_type="FLAT"),
                attr_cols=["label", "bucket"])
    return out


@pytest.fixture(scope="module")
def ivf_dir(spark, corpus, idx_root):
    out = str(idx_root / "ivf")
    build_index(spark, corpus, out,
                EngineConfig(index_type="IVF", nlist=NLIST),
                attr_cols=["label", "bucket"])
    return out


@pytest.fixture(scope="module")
def ivfpq_dir(spark, corpus, idx_root):
    out = str(idx_root / "ivfpq")
    build_index(spark, corpus, out,
                EngineConfig(index_type="IVFPQ", nlist=NLIST, pq_m=16),
                attr_cols=["label"])
    return out


@pytest.fixture(scope="module")
def hnsw_dir(spark, corpus, idx_root):
    out = str(idx_root / "hnsw")
    build_index(spark, corpus, out,
                EngineConfig(index_type="HNSW", num_shards=4),
                attr_cols=["label"])
    return out


def _rows(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["distance"], 6))
        for r in df.collect()
    }


def test_metadata_records_attrs(spark, flat_dir, ivf_dir, hnsw_dir):
    assert read_metadata(flat_dir)["attr_cols"] == ["label", "bucket"]
    assert read_metadata(ivf_dir)["attr_cols"] == ["label", "bucket"]
    assert read_metadata(hnsw_dir)["attr_cols"] == ["label"]


def test_attrs_stored_in_rows(spark, ivf_dir):
    """IVF index rows carry the attr columns (scan-side filtering, no join)."""
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivf_dir)
    assert "label" in h.vectors.columns and "bucket" in h.vectors.columns
    assert h.attrs is None  # in-row, no sidecar


def test_hnsw_attrs_sidecar(spark, hnsw_dir, corpus):
    """HNSW graph rows have a fixed schema; attrs live in the sidecar."""
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, hnsw_dir)
    assert "label" not in h.vectors.columns
    assert h.attrs is not None
    assert h.attrs.count() == corpus.count()
    assert set(h.attrs.columns) == {"vec_id", "label"}


def test_flat_filtered_exact(spark, flat_dir, queries, filtered_oracle):
    res = search_index(spark, flat_dir, queries, k=10, where=WHERE)
    assert _rows(res) == _rows(filtered_oracle)


def test_ivf_filtered_full_probe_exact(spark, ivf_dir, queries, filtered_oracle):
    """nprobe=nlist probes everything -> filtered IVF must equal the
    filtered exact oracle bit-for-bit (same kernel, same tie order)."""
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST, where=WHERE)
    assert _rows(res) == _rows(filtered_oracle)


def test_ivf_filtered_recall(spark, ivf_dir, queries, filtered_oracle):
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=8, where=WHERE)
    assert recall_at_k(res, filtered_oracle, k=10) >= 0.9


def test_ivf_filtered_sql_kernel_parity(spark, ivf_dir, queries):
    """SQL and pandas kernels agree under a filter (same total order)."""
    a = search_index(spark, ivf_dir, queries, k=10, nprobe=8, where=WHERE)
    b = search_index(spark, ivf_dir, queries, k=10, nprobe=8, where=WHERE,
                     kernel="sql")
    assert _rows(a) == _rows(b)


def test_ivfpq_filtered_recall(spark, ivfpq_dir, queries, filtered_oracle):
    """Refined filtered ADC: candidates come from the filtered code scan,
    refine re-ranks them exactly -> high recall vs the filtered oracle."""
    res = search_index(spark, ivfpq_dir, queries, k=10, nprobe=NLIST, where=WHERE)
    assert recall_at_k(res, filtered_oracle, k=10) >= 0.9


def test_hnsw_filtered_recall(spark, hnsw_dir, queries, filtered_oracle):
    res = search_index(spark, hnsw_dir, queries, k=10, where=WHERE,
                       filter_oversample=8, ef_search=64)
    assert recall_at_k(res, filtered_oracle, k=10) >= 0.85


def test_hnsw_filtered_results_obey_filter(spark, hnsw_dir, queries, corpus):
    res = search_index(spark, hnsw_dir, queries, k=10, where=WHERE,
                       filter_oversample=8)
    bad = (
        res.join(corpus.select("vec_id", "label"),
                 res.neighbor_id == F.col("vec_id"))
        .filter("label != 3")
        .count()
    )
    assert bad == 0


def test_allowed_ids_flat(spark, flat_dir, corpus, queries):
    """IDSelector analog: restrict to an explicit id set; equals the exact
    search over exactly those rows."""
    ids = corpus.select("vec_id").filter("vec_id % 11 = 0")
    oracle = knn_pandas(corpus.join(ids, "vec_id", "left_semi"), queries, k=10)
    res = search_index(spark, flat_dir, queries, k=10, allowed_ids=ids)
    assert _rows(res) == _rows(oracle)


def test_allowed_ids_ivf(spark, ivf_dir, corpus, queries):
    ids = corpus.select("vec_id").filter("vec_id % 11 = 0")
    oracle = knn_pandas(corpus.join(ids, "vec_id", "left_semi"), queries, k=10)
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST, allowed_ids=ids)
    assert _rows(res) == _rows(oracle)


def test_combined_where_and_allowed_ids(spark, ivf_dir, corpus, queries):
    ids = corpus.select("vec_id").filter("vec_id % 2 = 0")
    oracle = knn_pandas(
        corpus.filter(WHERE).join(ids, "vec_id", "left_semi"), queries, k=10
    )
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST,
                       where=WHERE, allowed_ids=ids)
    assert _rows(res) == _rows(oracle)


def test_empty_filter_returns_no_rows(spark, ivf_dir, queries):
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST,
                       where="label = 99")
    assert res.count() == 0


def test_empty_allowlist_returns_no_rows(spark, ivf_dir, queries):
    """An empty allowlist means no candidates — both paths, no crash."""
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    res = search_index(spark, ivf_dir, queries, k=10, nprobe=4,
                       allowed_ids=[])
    assert res.count() == 0
    h = open_index(spark, ivf_dir)
    pdf = serve_local(h, queries, k=10, nprobe=4, allowed_ids=[])
    assert len(pdf) == 0


def test_allowed_ids_plain_sequence_spark_path(spark, ivf_dir, corpus, queries):
    """search_index coerces plain id sequences (serve_local's form), so a
    routed call is valid on both sides of the batch-size split."""
    ids = [r["vec_id"] for r in
           corpus.select("vec_id").filter("vec_id % 11 = 0").collect()]
    oracle = knn_pandas(
        corpus.filter(F.col("vec_id").isin(ids)), queries, k=10
    )
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=NLIST,
                       allowed_ids=ids)
    assert _rows(res) == _rows(oracle)


def test_attr_cols_validation(spark, corpus, idx_root):
    with pytest.raises(ValueError, match="collide"):
        build_index(spark, corpus, str(idx_root / "bad1"),
                    EngineConfig(index_type="FLAT"), attr_cols=["centroid_id"])
    with pytest.raises(ValueError, match="not in corpus"):
        build_index(spark, corpus, str(idx_root / "bad2"),
                    EngineConfig(index_type="FLAT"), attr_cols=["nope"])


def _canon_pdf(pdf):
    import pandas as pd

    cols = ["query_id", "rank", "neighbor_id", "distance"]
    return (
        pdf[cols]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype({"query_id": "int64", "rank": "int32",
                 "neighbor_id": "int64", "distance": "float64"})
    )


def _assert_serve_identical(spark_df, local_pdf):
    import pandas as pd

    pd.testing.assert_frame_equal(
        _canon_pdf(spark_df.toPandas()), _canon_pdf(local_pdf), check_exact=True
    )


WHERE_FN = staticmethod(lambda a: a["label"] == 3)


def test_serve_ivf_filtered_bit_identical(spark, ivf_dir, queries):
    """Driver-side filtered serving must equal the Spark path exactly —
    same probes, same mask, same tie order."""
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivf_dir)
    want = search_index(spark, h, queries, k=10, nprobe=8, where=WHERE)
    got = serve_local(h, queries, k=10, nprobe=8, where=lambda a: a["label"] == 3)
    _assert_serve_identical(want, got)


def test_serve_flat_filtered_bit_identical(spark, flat_dir, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, flat_dir)
    want = search_index(spark, h, queries, k=10, where=WHERE)
    got = serve_local(h, queries, k=10, where=lambda a: a["label"] == 3)
    _assert_serve_identical(want, got)


def test_serve_ivfpq_filtered_bit_identical(spark, ivfpq_dir, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivfpq_dir)
    want = search_index(spark, h, queries, k=10, nprobe=NLIST, where=WHERE)
    got = serve_local(h, queries, k=10, nprobe=NLIST,
                      where=lambda a: a["label"] == 3)
    _assert_serve_identical(want, got)


def test_serve_hnsw_filtered_bit_identical(spark, hnsw_dir, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, hnsw_dir)
    want = search_index(spark, h, queries, k=10, where=WHERE,
                        filter_oversample=8, ef_search=64)
    got = serve_local(h, queries, k=10, where=lambda a: a["label"] == 3,
                      filter_oversample=8, ef_search=64)
    _assert_serve_identical(want, got)


def test_serve_allowed_ids_bit_identical(spark, ivf_dir, corpus, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    ids_df = corpus.select("vec_id").filter("vec_id % 11 = 0")
    ids_np = [r["vec_id"] for r in ids_df.collect()]
    h = open_index(spark, ivf_dir)
    want = search_index(spark, h, queries, k=10, nprobe=8, allowed_ids=ids_df)
    got = serve_local(h, queries, k=10, nprobe=8, allowed_ids=ids_np)
    _assert_serve_identical(want, got)


def test_serve_rejects_sql_string_where(spark, ivf_dir, queries):
    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivf_dir)
    with pytest.raises(TypeError, match="callable"):
        serve_local(h, queries, k=10, where="label = 3")


def test_routed_sql_where_demotes_to_spark(spark, ivf_dir, queries):
    """A SQL-string filter on a small batch routes to the Spark path (the
    driver path has no SQL parser) and still returns the right rows."""
    from webscale_vector_search_spark.plans.serve_local import search_routed
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivf_dir)
    want = search_index(spark, h, queries, k=10, nprobe=8, where=WHERE)
    got = search_routed(spark, h, queries, k=10, nprobe=8, where=WHERE)
    assert _rows(got) == _rows(want)


def test_filter_reaches_pushed_filters(spark, ivf_dir, queries):
    """The attr predicate must land in the probed scan's parquet
    PushedFilters — scan-side filtering is the entire 100 TB argument
    (a join or post-filter here silently changes the cost class)."""
    res = search_index(spark, ivf_dir, queries, k=10, nprobe=4, where="label = 3")
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if "FileScan" in l and "vectors" in l
    ]
    assert scan_lines, "no FileScan over the index vectors directory in plan"
    line = scan_lines[0]
    assert "PushedFilters" in line
    pushed = line.split("PushedFilters:")[1]
    assert "label" in pushed and "EqualTo" in pushed or "label" in pushed


# ---------------------------------------------------------------------------
# selective-filter fallback (r10): past the oversample cap the post-filter
# beam cannot produce k survivors — the planner must route graph searches
# to the exact filtered scan instead of silently losing recall


@pytest.fixture(scope="module")
def hnsw_rare_dir(spark, corpus, idx_root):
    out = str(idx_root / "hnsw_rare")
    build_index(spark, corpus, out,
                EngineConfig(index_type="HNSW", num_shards=4),
                attr_cols=["bucket"])
    return out


def test_hnsw_selective_filter_falls_back_exact(spark, hnsw_rare_dir, corpus,
                                                queries):
    """bucket = 7 matches ~1% of rows (s < 1/OVERSAMPLE_CAP): the auto
    path must return the EXACT filtered answer, equal to brute force over
    the matching rows — a beam at the widest oversample measurably
    cannot."""
    from webscale_vector_search_spark.sources.attr_stats import (
        OVERSAMPLE_CAP,
        graph_filter_fallback,
        selectivity,
    )
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, hnsw_rare_dir)
    s = selectivity(h, where="bucket = 7", spark=spark)
    assert s is not None and s * OVERSAMPLE_CAP < 1.0
    assert graph_filter_fallback(s)

    oracle = knn_pandas(corpus.filter("bucket = 7"), queries, k=3)
    got = search_index(spark, h, queries, k=3, where="bucket = 7")
    assert _rows(got) == _rows(oracle)


def test_hnsw_selective_fallback_serve_parity(spark, hnsw_rare_dir, queries):
    import numpy as np

    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, hnsw_rare_dir)
    want = search_index(spark, h, queries, k=3, where="bucket = 7")
    qrows = queries.collect()
    q = (
        np.array([r["query_id"] for r in qrows], dtype=np.int64),
        np.stack([r["qvec"] for r in qrows]).astype(np.float64),
    )
    local = serve_local(h, q, k=3, where=lambda a: a["bucket"] == 7)
    local_rows = {
        (int(a), int(b), int(c), round(float(d), 6))
        for a, b, c, d in zip(
            local["query_id"], local["rank"], local["neighbor_id"],
            local["distance"],
        )
    }
    assert local_rows == _rows(want)


def test_hnsw_tiny_allowlist_falls_back_exact(spark, hnsw_dir, corpus,
                                              queries):
    """A 10-id allowlist on a graph index (s_allow ~ 0.02) takes the same
    exact route — and an explicit filter_oversample stays an override
    (the beam runs as asked, results merely stay inside the allowlist)."""
    import numpy as np

    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.index_io import open_index

    allowed = [int(r["vec_id"]) for r in corpus.limit(10).collect()]
    h = open_index(spark, hnsw_dir)
    oracle = knn_pandas(
        corpus.filter(F.col("vec_id").isin(allowed)), queries, k=3
    )
    got = search_index(spark, h, queries, k=3, allowed_ids=allowed)
    assert _rows(got) == _rows(oracle)

    qrows = queries.collect()
    q = (
        np.array([r["query_id"] for r in qrows], dtype=np.int64),
        np.stack([r["qvec"] for r in qrows]).astype(np.float64),
    )
    local = serve_local(h, q, k=3, allowed_ids=allowed)
    local_rows = {
        (int(a), int(b), int(c), round(float(d), 6))
        for a, b, c, d in zip(
            local["query_id"], local["rank"], local["neighbor_id"],
            local["distance"],
        )
    }
    assert local_rows == _rows(got)

    # explicit knob: no fallback, beam semantics honored (valid rows only)
    explicit = search_index(spark, h, queries, k=3, allowed_ids=allowed,
                            filter_oversample=8)
    got_ids = {r["neighbor_id"] for r in explicit.collect()}
    assert got_ids <= set(allowed)


def test_ivfpq_auto_filtered_plan_and_recall(spark, ivfpq_dir, queries,
                                             filtered_oracle):
    """The calibrated auto budget applies to IVFPQ too (cell stats are
    written at build): nprobe=None under the label filter must plan at
    least the 2x floor and keep recall at the explicit-full-probe level."""
    from webscale_vector_search_spark.config import default_nprobe
    from webscale_vector_search_spark.sources.attr_stats import plan_nprobe
    from webscale_vector_search_spark.sources.index_io import open_index

    h = open_index(spark, ivfpq_dir)
    base = default_nprobe(NLIST, "IVFPQ")
    planned = plan_nprobe(h, base, 10, where=WHERE, spark=spark)
    assert planned >= min(NLIST, 2 * base)
    auto = search_index(spark, h, queries, k=10, where=WHERE)
    fixed_full = search_index(spark, h, queries, k=10, nprobe=NLIST,
                              where=WHERE)
    r_auto = recall_at_k(auto, filtered_oracle, k=10)
    r_full = recall_at_k(fixed_full, filtered_oracle, k=10)
    assert r_auto >= r_full - 1e-9  # the planned budget reaches full probe here


def test_hnsw_correlated_filter_falls_back_exact(spark, tmp_path_factory):
    """The r10 bench measured beam recall ~= f for a spatially-concentrated
    filter (f=0.11 -> recall 0.0998): most queries' neighborhoods hold ZERO
    valid candidates, so no oversample recovers. The stats-quantizer
    pseudo-cells must DETECT the concentration (f < 0.5) and route the auto
    path to the exact filtered scan — recall 1.0 — on both paths."""
    import numpy as np
    import pandas as pd

    from webscale_vector_search_spark.plans.serve_local import serve_local
    from webscale_vector_search_spark.sources.attr_stats import (
        cell_coverage,
        graph_filter_fallback,
        selectivity,
    )
    from webscale_vector_search_spark.sources.index_io import open_index

    rng = np.random.default_rng(5)
    ncl, dim, n = 16, 16, 6000
    centers = rng.normal(0.0, 4.0, (ncl, dim))
    ids = np.arange(n)
    cluster = ids % ncl
    vecs = centers[cluster] + rng.normal(0.0, 0.1, (n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": (cluster % 4).astype("int32"),  # label lives in 4/16 clusters
        }
    )
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("hnsw_corr") / "idx")
    build_index(
        spark, corpus, out,
        EngineConfig(index_type="HNSW", num_shards=4, vector_dim=dim),
        attr_cols=["label"],
    )
    h = open_index(spark, out)
    s = selectivity(h, where="label = 1", spark=spark)
    f = cell_coverage(h, "label = 1", spark=spark)
    assert s is not None and s > 1 / 32  # the selectivity rule alone keeps the beam
    assert f is not None and f < 0.5  # ...but the pseudo-cells see the concentration
    assert graph_filter_fallback(s, f)
    # callable form computes the same f (plan parity)
    assert cell_coverage(h, lambda a: a["label"] == 1) == f

    q_pdf = pdf.iloc[:16][["vec_id", "embedding"]].rename(
        columns={"vec_id": "query_id", "embedding": "qvec"}
    )
    queries = spark.createDataFrame(q_pdf)
    oracle = knn_pandas(
        corpus.filter("label = 1").select("vec_id", "embedding"), queries, k=10
    )
    got = search_index(spark, h, queries, k=10, where="label = 1")
    assert _rows(got) == _rows(oracle)

    q = (
        q_pdf["query_id"].to_numpy().astype("int64"),
        np.stack(q_pdf["qvec"].to_list()).astype("float64"),
    )
    local = serve_local(h, q, k=10, where=lambda a: a["label"] == 1)
    local_rows = {
        (int(a), int(b), int(c), round(float(d), 6))
        for a, b, c, d in zip(
            local["query_id"], local["rank"], local["neighbor_id"],
            local["distance"],
        )
    }
    assert local_rows == _rows(got)
