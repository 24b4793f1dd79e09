"""Property tests for dedup operators (X1/X2 + extensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.operators.dedup import (
    exact_dedup,
    neardup_candidate_pairs,
    simhash64,
)
from webscale_vector_search_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_SMOKE).cache()


def test_exact_dedup_idempotent(docs):
    """Dedup of survivors is a no-op (idempotence)."""
    first = exact_dedup(docs)
    survivors = docs.join(
        first.select(F.col("keeper_doc_id").alias("doc_id")), "doc_id", "inner"
    )
    second = exact_dedup(survivors)
    assert first.count() == second.count()
    assert second.filter(F.col("n_dups") > 1).count() == 0


def test_band_signatures_kernels_identical(docs):
    """The Arrow kernel and the pure-Catalyst expression form must emit
    bit-identical band signatures (discrete strings — no rounding escape
    hatch): same md5-derived Kirsch-Mitzenmacher family, same banding."""
    from webscale_vector_search_spark.operators.dedup import (
        band_signatures_pandas,
        band_signatures_sql,
    )

    sub = docs.filter(F.col("doc_id") < 100)
    a = band_signatures_sql(sub).toPandas().sort_values(["doc_id", "band"]).reset_index(drop=True)
    b = band_signatures_pandas(sub).toPandas().sort_values(["doc_id", "band"]).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_band_signatures_plan_is_map_side(docs):
    """The signature stage must not shuffle (the r1 form exploded
    docs x shingles x 32 rows through a groupBy — ~32x the corpus token
    count at 100 TB). Both kernels: no Exchange anywhere in the plan."""
    from webscale_vector_search_spark.operators.dedup import (
        band_signatures_pandas,
        band_signatures_sql,
    )

    for fn in (band_signatures_sql, band_signatures_pandas):
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{fn.__name__} shuffles:\n{plan}"


def test_neardup_pairs_catch_mutated_copies(spark, docs):
    """LSH banding must pair each doc with a near-identical copy of itself.

    Mutation: drop the first token of the first 30 docs, offset ids by 10^6 —
    shingle-set Jaccard ~ (n-1)/n, so 8 bands x 4 rows catches essentially all.
    """
    mutated = (
        docs.filter(F.col("doc_id") < 30)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("text", F.expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' '))))"))
    )
    corpus = docs.filter(F.col("doc_id") < 30).select("doc_id", "text").union(
        mutated.select("doc_id", "text")
    )
    pairs = neardup_candidate_pairs(corpus).toPandas()
    matched = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    hits = sum((i, i + 1_000_000) in matched for i in range(30))
    assert hits >= 27, f"only {hits}/30 mutated copies caught by LSH bands"


def test_neardup_candidates_verify_as_similar(docs):
    """LSH precision: the fixture corpus contains genuine near-dups; every
    band-collision candidate must verify with high exact shingle Jaccard
    (4-row bands make random collisions astronomically unlikely)."""
    from webscale_vector_search_spark.operators.dedup import ngram_jaccard

    sub = docs.limit(200)
    pairs = neardup_candidate_pairs(sub)
    verified = ngram_jaccard(sub, sub, pairs).toPandas()
    assert len(verified) > 0, "fixture corpus is known to contain near-dups"
    assert (verified["jaccard"] >= 0.5).all(), verified.to_string()


def test_simhash_stability_and_locality(spark, docs):
    """Same text -> same simhash; near-identical text -> small hamming distance."""
    sub = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    h1 = sub.select("doc_id", simhash64(F.col("text")).alias("h")).toPandas()
    h2 = sub.select("doc_id", simhash64(F.col("text")).alias("h")).toPandas()
    assert h1.sort_values("doc_id")["h"].tolist() == h2.sort_values("doc_id")["h"].tolist()

    mutated = sub.withColumn(
        "text", F.expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' '))))")
    )
    hm = mutated.select("doc_id", simhash64(F.col("text")).alias("h")).toPandas()
    merged = h1.merge(hm, on="doc_id", suffixes=("_a", "_b"))
    hamming = [bin(a ^ b).count("1") for a, b in zip(merged["h_a"], merged["h_b"])]
    assert sum(h <= 16 for h in hamming) >= 18, f"hamming distances too large: {hamming}"


def test_simhash_md5_variant_matches_python_reference(spark, docs):
    """The oracle-parity 60-bit md5 SimHash (the form q_doc_fingerprint
    hash-checks against DuckDB) must agree with a direct python
    re-implementation, including the staged hashes->fold composition and
    locality on near-identical text."""
    import hashlib

    from webscale_vector_search_spark.operators.dedup import (
        simhash_feature_hashes,
        simhash_from_hashes,
    )

    sub = docs.filter(F.col("doc_id") < 10).select("doc_id", "text")
    staged = sub.select(
        "doc_id", "text", simhash_feature_hashes("text").alias("_shh")
    )
    got = (
        staged.select("doc_id", "text", simhash_from_hashes("_shh").alias("h"))
        .toPandas()
        .sort_values("doc_id")
    )

    def ref(text: str) -> int:
        t = text.split(" ")
        feats = list(
            dict.fromkeys(
                " ".join(x for x in (t[i], t[i + 1] if i + 1 < len(t) else None) if x is not None)
                for i in range(max(len(t) - 1, 1))
            )
        )
        hs = [int(hashlib.md5(f.encode()).hexdigest()[:15], 16) for f in feats]
        fp = 0
        for b in range(60):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                fp |= 1 << b
        return fp

    for _, row in got.iterrows():
        assert row["h"] == ref(row["text"]), row["doc_id"]

    # locality: dropping the first word flips few of the 60 bits
    mutated = sub.withColumn(
        "text", F.expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' '))))")
    )
    hm = (
        mutated.select("doc_id", simhash_feature_hashes("text").alias("_shh"))
        .select("doc_id", simhash_from_hashes("_shh").alias("h"))
        .toPandas()
    )
    merged = got.merge(hm, on="doc_id", suffixes=("_a", "_b"))
    hamming = [bin(a ^ b).count("1") for a, b in zip(merged["h_a"], merged["h_b"])]
    assert sum(h <= 15 for h in hamming) >= 9, f"hamming distances too large: {hamming}"


def test_mllib_lsh_variant_finds_fixture_neardups(spark, docs):
    """The MLlib MinHashLSH path must surface the fixture's genuine near-dup
    pairs (cross-checked against exact Jaccard on its own candidates)."""
    from webscale_vector_search_spark.operators.dedup import neardup_pairs_mllib, ngram_jaccard

    sub = docs.limit(200).cache()
    pairs = neardup_pairs_mllib(sub, threshold=0.3)
    got = pairs.toPandas()
    assert len(got) > 0
    verified = ngram_jaccard(sub, sub, pairs.select("doc_a", "doc_b")).toPandas()
    assert (verified["jaccard"] >= 0.7).all()


def test_embedding_neardup_ivf_bucketed(spark):
    """The centroid-bucketed (applyInPandas) near-dup path must find most of
    the exact form's pairs and introduce none that the exact form rejects."""
    from tests.conftest import SF_ORACLE
    from webscale_vector_search_spark.operators.dedup import (
        embedding_neardup,
        embedding_neardup_ivf,
    )
    from webscale_vector_search_spark.operators.ivf import train_centroids
    from webscale_vector_search_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", SF_ORACLE).filter(F.col("vec_id") < 200).cache()
    exact = embedding_neardup(emb, threshold=0.68)
    exact_pairs = {(a, b) for a, b in exact.select("vec_a", "vec_b").toPandas().itertuples(index=False)}
    cents = train_centroids(spark, emb, nlist=4, seed=42, sample_fraction=1.0)
    bucketed = embedding_neardup_ivf(emb, cents, threshold=0.68)
    got_pairs = {(a, b) for a, b in bucketed.select("vec_a", "vec_b").toPandas().itertuples(index=False)}
    assert got_pairs <= exact_pairs, "bucketed path must not invent pairs"
    assert len(exact_pairs) > 0
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    # soft 2-assignment recovers nearly all Voronoi-boundary pairs
    # (measured 0.99 on this fixture vs ~0.5-0.7 under single assignment)
    assert recall >= 0.9, f"bucket-blocking recall {recall}"


def test_dedup_clusters_transitive_and_minimal(spark):
    """Connected components: a~b and b~c must land a, b, c in ONE cluster
    labeled by the min id, even when (a, c) was never a candidate pair —
    the exact case pairwise keep-the-smaller dedup gets wrong."""
    from webscale_vector_search_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id BIGINT")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "doc_a BIGINT, doc_b BIGINT"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 1, 4: 4, 6: 6, 7: 7}


def test_dedup_clusters_chain_converges(spark):
    """A path-shaped component (worst diameter) must still fully converge."""
    from webscale_vector_search_spark.operators.dedup import dedup_clusters

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id BIGINT")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a BIGINT, doc_b BIGINT"
    )
    got = dedup_clusters(docs, pairs).collect()
    assert all(r["cluster_id"] == 0 for r in got) and len(got) == n


def test_decontaminate_plants_and_misses(spark):
    """A training doc embedding a benchmark 8-gram verbatim is flagged with
    the right overlap count; unrelated docs are absent from the result."""
    from webscale_vector_search_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    train = spark.createDataFrame(
        [
            (1, "prefix words then " + bench_text + " trailing words"),
            (2, "completely unrelated text with no overlap at all here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r["n_overlap"] for r in decontaminate(train, bench, k=8).collect()}
    # bench text has 9 tokens -> 2 distinct 8-grams; both appear in doc 1
    assert got == {1: 2}


def test_stratified_sample_monotone_and_deterministic(spark):
    from tests.conftest import SF_ORACLE
    from webscale_vector_search_spark.operators.sampling import (
        holdout_split,
        stratified_sample,
    )
    from webscale_vector_search_spark.sources.fixtures import load_table

    docs = load_table(spark, "documents", SF_ORACLE).cache()
    small = stratified_sample(docs, {"en": 0.2}, stratum_col="lang")
    big = stratified_sample(docs, {"en": 0.6}, stratum_col="lang")
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids, "turning a mix weight up must only ADD rows"
    # unlisted strata are dropped entirely
    assert small.filter(F.col("lang") != "en").count() == 0
    # rate lands near target on the en stratum (hash uniformity)
    n_en = docs.filter(F.col("lang") == "en").count()
    assert abs(len(big_ids) / n_en - 0.6) < 0.15
    # identical second run (determinism) and disjoint-exhaustive holdout
    assert {r["doc_id"] for r in stratified_sample(docs, {"en": 0.2}, stratum_col="lang").select("doc_id").collect()} == small_ids
    train, hold = holdout_split(docs, holdout_rate=0.1)
    assert train.count() + hold.count() == docs.count()
    assert train.join(hold, "doc_id").count() == 0


def test_dup_span_stats_planted_duplicates(spark):
    """A shared 8-token span is flagged in both carriers and nowhere else."""
    from webscale_vector_search_spark.operators.dedup import dup_span_stats

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, f"{span} unique tail zero zero0 zero1 zero2 zero3"),
        (1, f"prefix one one0 one1 one2 one3 {span}"),
        (2, "totally different words here nothing shared at all nine ten"),
        (3, "short doc"),  # < w tokens: excluded entirely
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in dup_span_stats(docs, w=8).collect()}
    assert set(out) == {0, 1, 2}  # doc 3 has no 8-gram
    # each carrier holds exactly one copy of the duplicated span
    assert out[0]["dup_grams"] == 1 and out[1]["dup_grams"] == 1
    assert out[2]["dup_grams"] == 0 and out[2]["dup_fraction"] == 0.0
    # coverage ratio = 1 / n_grams
    assert out[0]["dup_fraction"] == round(1 / out[0]["n_grams"], 6)


def test_bigram_lm_counts_and_rank(spark):
    """Conditional probabilities on a hand-checkable corpus."""
    from webscale_vector_search_spark.operators.textops import bigram_lm

    docs = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b x y")], "doc_id BIGINT, text STRING"
    )
    # bigrams: doc0 = ab, ba, ab, ba, ac ; doc1 = ab, bx, xy
    out = bigram_lm(docs, top_n=2, min_left=4).collect()
    by_key = {(r["w1"], r["w2"]): r for r in out}
    # only w1='a' reaches left_count >= 4 (c(a,*) = 4)
    assert set(r["w1"] for r in out) == {"a"}
    ab = by_key[("a", "b")]
    assert ab["pair_count"] == 3 and ab["left_count"] == 4
    assert ab["cond_p"] == 0.75 and ab["rank"] == 1
    ac = by_key[("a", "c")]
    assert ac["pair_count"] == 1 and ac["rank"] == 2


def test_pack_sequences_contiguous_streams(spark):
    """Packing invariants: per-shard offsets are gapless and start at 0;
    seq bookkeeping is consistent with the integer arithmetic."""
    from webscale_vector_search_spark.operators.sampling import pack_sequences

    docs = load_table(spark, "documents", SF_SMOKE)
    ctx = 256
    out = pack_sequences(docs, ctx_len=ctx, num_shards=4).toPandas()
    assert len(out) == docs.count()
    for _, g in out.groupby("shard"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        ends = g["start_offset"] + g["n_tokens"]
        assert g["start_offset"].iloc[0] == 0
        assert (g["start_offset"].iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()
    assert (out["seq_id"] == out["start_offset"] // ctx).all()
    assert (out["seq_pos"] == out["start_offset"] % ctx).all()
    expected_cross = (out["start_offset"] + out["n_tokens"] - 1) // ctx > out["seq_id"]
    assert (out["crosses_boundary"] == expected_cross).all()


def test_filter_funnel_monotone_cumulative(spark):
    """Funnel invariants: each stage's entering equals the previous stage's
    passing, counts never increase, and stage order is preserved."""
    from webscale_vector_search_spark.operators.textops import filter_funnel

    docs = load_table(spark, "documents", SF_SMOKE)
    stages = [
        ("a", F.col("n_chars") > 200),
        ("b", F.col("lang") == "en"),
        ("c", F.col("doc_id") % 2 == 0),
    ]
    out = filter_funnel(docs, stages).orderBy("stage").collect()
    assert [r["name"] for r in out] == ["a", "b", "c"]
    assert out[0]["entering"] == docs.count()
    for prev, cur in zip(out, out[1:]):
        assert cur["entering"] == prev["passing"]
        assert cur["passing"] <= cur["entering"]
    # cumulative conjunction, independently computed
    expect_c = docs.filter(
        (F.col("n_chars") > 200) & (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
    ).count()
    assert out[2]["passing"] == expect_c
