"""Randomized property tests (SURVEY.md §5.2 #2) — seeded hypothesis inputs,
pure-Python oracles, tiny sizes (the Spark overhead dominates, so shapes stay
small; the point is semantic coverage, not scale)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from webscale_vector_search_spark.queries import ORACLE_SQL, QUERIES

DIM = 8


def _brute_force(corpus: list[list[float]], queries: list[list[float]], k: int):
    """Pure-Python reference: left-fold double accumulation + round-6 +
    (distance, vec_id) total order — the engine's exact contract."""
    out = {}
    for qid, q in enumerate(queries):
        scored = []
        for vid, v in enumerate(corpus):
            acc = 0.0
            for a, b in zip(q, v):
                acc += (float(a) - float(b)) * (float(a) - float(b))
            scored.append((round(acc, 6), vid))
        scored.sort()
        out[qid] = scored[:k]
    return out


vec = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False, width=32), min_size=DIM, max_size=DIM
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    corpus=st.lists(vec, min_size=3, max_size=12),
    queries=st.lists(vec, min_size=1, max_size=3),
    k=st.integers(min_value=1, max_value=5),
)
def test_knn_matches_python_oracle(spark, corpus, queries, k):
    corpus_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    queries_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(queries)], "query_id BIGINT, qvec ARRAY<FLOAT>"
    )
    from webscale_vector_search_spark.operators.knn import knn

    got = knn(corpus_df, queries_df, k=k).toPandas()
    # float32 storage: recompute the python oracle on the values Spark holds
    stored = {r["vec_id"]: r["embedding"] for r in corpus_df.collect()}
    stored_q = {r["query_id"]: r["qvec"] for r in queries_df.collect()}
    want = _brute_force(
        [stored[i] for i in range(len(corpus))],
        [stored_q[i] for i in range(len(queries))],
        k,
    )
    for qid, expected in want.items():
        grp = got[got["query_id"] == qid].sort_values("rank")
        assert grp["neighbor_id"].tolist() == [vid for _, vid in expected]
        for got_d, (want_d, _) in zip(grp["distance"], expected):
            assert math.isclose(got_d, want_d, abs_tol=2e-6)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True))
def test_det_hash_shard_stability(spark, ids):
    """Shard assignment is a pure function of the id — permutation- and
    partitioning-invariant."""
    from webscale_vector_search_spark.operators.shard import hash_shard

    df1 = spark.createDataFrame([(i,) for i in ids], "vec_id BIGINT")
    df2 = spark.createDataFrame([(i,) for i in reversed(ids)], "vec_id BIGINT").repartition(3)
    a = hash_shard(df1, 16).toPandas().set_index("vec_id")["shard_id"].to_dict()
    b = hash_shard(df2, 16).toPandas().set_index("vec_id")["shard_id"].to_dict()
    assert a == b
    assert all(0 <= s < 16 for s in a.values())


def test_registry_invariants():
    """Every oracle key has a query; every query is callable; names are
    unique and snake_case."""
    assert set(ORACLE_SQL) <= set(QUERIES)
    for name, fn in QUERIES.items():
        assert callable(fn)
        assert name.startswith("q_") and name == name.lower()


def test_oracle_sql_is_ansi_parseable_by_duckdb():
    """Every oracle statement must at least PREPARE in DuckDB against empty
    tables of the fixture schemas (catches dialect drift without Spark)."""
    import duckdb

    from webscale_vector_search_spark.testing import duckdb_connection

    con = duckdb_connection("/root/testdata/sf0.001")
    for name, sql in ORACLE_SQL.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{name} oracle not DuckDB-parseable: {e}")


def test_repetition_signals_separate_repetitive_docs(spark):
    """A heavily repeated phrase must score low TTR / high repetition; a
    distinct-token doc must sit at the clean extreme (TTR 1, rep3 0)."""
    from pyspark.sql import functions as F

    from webscale_vector_search_spark.operators.textops import repetition_signals

    docs = spark.createDataFrame(
        [
            (0, " ".join(["spam ham eggs"] * 20)),
            (1, " ".join(f"tok{i}" for i in range(60))),
        ],
        "doc_id BIGINT, text STRING",
    )
    sig = repetition_signals(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select("doc_id", *[c.alias(n) for n, c in sig.items()]).collect()
    }
    spammy, clean = rows[0], rows[1]
    assert spammy["n_tokens"] == 60 and clean["n_tokens"] == 60
    assert spammy["type_token_ratio"] == pytest.approx(3 / 60)
    assert clean["type_token_ratio"] == 1.0
    assert spammy["rep3_frac"] == 1.0  # every trigram window recurs
    assert clean["rep3_frac"] == 0.0
    assert spammy["top_bigram_frac"] > 0.3 > clean["top_bigram_frac"]
