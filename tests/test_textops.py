"""Semantic tests for the retrieval/LM-scoring text operators.

The oracle sweep proves Spark == DuckDB; these tests prove both equal an
independently-written pure-python reference (guarding against the same
formula bug landing in both engines)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


DOCS = [
    (0, "hash join hash join hash table scan"),
    (1, "vector scan fast vector index"),
    (2, "slow table scan order by customer"),
    (3, "hash hash hash hash hash"),
    (4, "join the customer order stream"),
    (5, "a b c d e f g"),
]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, terms in queries:
        scores = {}
        for d, tk in toks.items():
            s = 0.0
            hits = 0
            for t in set(terms):
                tf = tk.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if t in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += round(
                    idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl)),
                    12,
                )
                hits += 1
            if hits:
                scores[d] = (round(s, 6), hits)
        out[qid] = scores
    return out


def test_bm25_matches_python_reference(spark):
    from webscale_vector_search_spark.operators.textops import bm25_search

    docs = spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")
    queries = [(0, ["hash", "join"]), (1, ["vector", "customer"])]
    qdf = spark.createDataFrame(queries, "query_id BIGINT, terms ARRAY<STRING>")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["n_terms_hit"])
        for r in bm25_search(docs, qdf, k=10).collect()
    }
    want = _py_bm25(DOCS, queries)
    expect = {
        (qid, d): v for qid, scores in want.items() for d, v in scores.items()
    }
    assert got == expect
    # rank ordering: (score desc, doc_id asc) within each query
    rows = bm25_search(docs, qdf, k=10).orderBy("query_id", "rank").collect()
    for a, c in zip(rows, rows[1:]):
        if a["query_id"] == c["query_id"]:
            assert (a["score"], -a["doc_id"]) >= (c["score"], -c["doc_id"])


def test_lm_cross_entropy_matches_python_reference(spark):
    from webscale_vector_search_spark.operators.textops import lm_cross_entropy

    alpha = 0.5
    docs = spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")
    toks = {i: t.split(" ") for i, t in DOCS}
    pair_counts: dict = {}
    left_counts: dict = {}
    for tk in toks.values():
        for a, c in zip(tk, tk[1:]):
            pair_counts[(a, c)] = pair_counts.get((a, c), 0) + 1
            left_counts[a] = left_counts.get(a, 0) + 1
    vocab = len({w for tk in toks.values() for w in tk})
    expect = {}
    for d, tk in toks.items():
        lps = [
            round(
                math.log(
                    (pair_counts[(a, c)] + alpha) / (left_counts[a] + alpha * vocab)
                ),
                12,
            )
            for a, c in zip(tk, tk[1:])
        ]
        expect[d] = (len(lps), round(-sum(lps) / len(lps), 6))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_cross_entropy(docs, alpha=alpha).collect()
    }
    assert got == expect


def test_lm_cross_entropy_flags_outliers(spark):
    """An out-of-distribution doc must score strictly higher cross-entropy
    than in-distribution repetition."""
    from webscale_vector_search_spark.operators.textops import lm_cross_entropy

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "zxq vvk qqj zzt wwp rrn mml kkd"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(docs).collect()}
    assert got[99] > got[0]
