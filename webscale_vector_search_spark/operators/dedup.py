"""Deduplication operators (X1/X2 + training-data-pipeline extensions).

The reference has no dedup beyond its query-result cache; these are the
north-star LLM-pipeline operators (SURVEY.md §2.8), all expressed as
shuffle-lean DataFrame programs:

- exact dedup: hash-groupBy on content (one shuffle on the hash)
- MinHash+LSH banding: shingle -> 32 minhashes -> 8 bands x 4 rows ->
  band-bucket self-join. The classic scale path: candidate generation never
  compares all pairs, only bucket collisions.
- SimHash: 64-bit weighted-bit fingerprint, hamming-bucket grouping
- n-gram Jaccard: exact pairwise similarity on LSH-survivor pairs

Portability note: minhashes are hex-prefix strings of md5 (same in Spark and
DuckDB); lexicographic min over fixed-width hex == numeric min, which keeps
every step oracle-checkable. At 100 TB swap md5 for xxhash64 (cheaper) —
same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3
HASH_WIDTH = 16  # hex chars of md5 kept per minhash


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X1 — survivors = min id per distinct content hash."""
    return df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("content_hash")).agg(
        F.min(id_col).alias("keeper_doc_id"), F.count("*").alias("n_dups")
    )


def shingles(text_col, k: int = SHINGLE_K):
    """Word-level k-shingles as an array column (distinct, order-free set)."""
    toks = F.split(text_col, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]))
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-doc minhash signature: for seed i, min over shingles of
    substr(md5(i || ':' || shingle), 1, 16). Output: (doc_id, seed, minhash)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col))).alias("shingle")
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    hashed = sh.select(
        "doc_id",
        seeds,
        "shingle",
    ).withColumn(
        "h",
        F.substring(
            F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle")).cast("binary")),
            1,
            HASH_WIDTH,
        ),
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def band_signatures(signatures: DataFrame) -> DataFrame:
    """Fold minhashes into per-band signatures: (doc_id, band, band_sig).

    The signature concatenates minhashes in seed order (struct-sort on seed;
    collect_list order is nondeterministic and must not leak into the sig).
    """
    sig_in_seed_order = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda x: x["minhash"]
    )
    return (
        signatures.withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("|", sig_in_seed_order).alias("band_sig"))
    )


def neardup_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """X2 — candidate near-dup pairs: docs sharing any band bucket.

    The self-join happens per bucket (groupBy band_sig), never all-pairs:
    at 100 TB the band signature is the shuffle key and bucket sizes stay
    small for non-pathological corpora (salt oversized buckets if needed).
    """
    bands = band_signatures(minhash_signatures(docs, id_col, text_col))
    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    docs_a: DataFrame,
    docs_b: DataFrame,
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs (verification stage
    after LSH candidate generation — the standard two-phase near-dup design)."""
    sa = docs_a.select(F.col("doc_id").alias(id_a), shingles(F.col(text_col)).alias("sh_a"))
    sb = docs_b.select(F.col("doc_id").alias(id_b), shingles(F.col(text_col)).alias("sh_b"))
    joined = pairs.join(sa, id_a).join(sb, id_b)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        id_a,
        id_b,
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    )


def simhash64(text_col, n_grams: int = 2):
    """SimHash: sign-sum of per-feature 64-bit hashes, bit by bit.

    Features = word 2-shingles; per bit b, count features whose xxhash64 has
    bit b set vs unset; fingerprint bit = majority vote. Returns BIGINT.

    Written as nested SQL higher-order functions because the shift amount is
    a lambda variable (the Python shiftright wrapper only takes int shifts).
    Spark-side only — xxhash64 has no DuckDB twin; the oracle-checked dedup
    queries use the md5-prefix forms instead.
    """
    col_sql = text_col if isinstance(text_col, str) else text_col._jc.toString()
    feats = (
        f"array_distinct(transform("
        f"sequence(0, greatest(size(split({col_sql}, ' ')) - {n_grams}, 0)), "
        f"i -> concat_ws(' ', "
        + ", ".join(f"split({col_sql}, ' ')[i + {j}]" for j in range(n_grams))
        + ")))"
    )
    votes = (
        f"aggregate({feats}, 0, (acc, ft) -> acc + "
        f"CASE WHEN (shiftright(xxhash64(ft), b) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    return F.expr(
        f"aggregate(transform(sequence(0, 63), b -> "
        f"CASE WHEN ({votes}) > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
        f"ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, x) -> a + x)"
    )


def embedding_neardup(
    emb: DataFrame,
    threshold: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: cosine distance < threshold.

    Exact form (crossJoin) for oracle parity; the scale path routes through
    IVF bucketing (operators/ivf.py) so only same-centroid pairs compare.
    """
    from webscale_vector_search_spark.operators.knn import similarity_join

    pairs = similarity_join(emb, emb, threshold=threshold, metric="cosine", left_id=id_col, right_id=id_col, vec_col=vec_col)
    return pairs.filter(F.col("left_id") < F.col("right_id")).select(
        F.col("left_id").alias("vec_a"), F.col("right_id").alias("vec_b"), F.col("distance").alias("cos_dist")
    )


def neardup_pairs_mllib(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """X2 (≈ variant) — MLlib MinHashLSH.approxSimilarityJoin over shingle
    sets, the library twin of the hand-rolled band pipeline above. Checked by
    the property harness (not the oracle): MLlib's hash seeds are internal.

    Returns (doc_a, doc_b, jaccard_dist) pairs with Jaccard distance below
    `threshold`.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    sh = docs.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True).fit(sh)
    vecs = cv.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .distinct()
    )


def embedding_neardup_ivf(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.65,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup, the scale path: bucket by nearest centroid,
    then compare pairs only WITHIN each bucket via applyInPandas.

    The exact form (embedding_neardup) cross-joins N x N; this form is
    N²/nlist-ish per bucket with no global shuffle beyond the centroid
    groupBy. Near-identical vectors share a centroid by construction, so
    recall loss is confined to pairs straddling a Voronoi boundary — the
    standard blocking trade (raise recall by probing 2 nearest centroids).
    Output: (vec_a, vec_b, cos_dist) with vec_a < vec_b.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from webscale_vector_search_spark.operators.ivf import assign_centroids_multi

    # soft 2-assignment recovers pairs straddling a Voronoi boundary
    assigned = assign_centroids_multi(
        emb.select(id_col, vec_col), centroids, n_assign=2, vec_col=vec_col
    )

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cos_dist", T.DoubleType()),
        ]
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_dist": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_dist": "float64"}
            )
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cos = 1.0 - Vn @ Vn.T
        iu, ju = np.triu_indices(n, k=1)
        d = np.round(cos[iu, ju], 6)
        keep = d < threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos_dist": d[keep]})

    pairs = assigned.groupBy("centroid_id").applyInPandas(bucket_pairs, out_schema)
    return pairs.dropDuplicates(["vec_a", "vec_b"])
