"""Deduplication operators (X1/X2 + training-data-pipeline extensions).

The reference has no dedup beyond its query-result cache; these are the
north-star LLM-pipeline operators (SURVEY.md §2.8), all expressed as
shuffle-lean DataFrame programs:

- exact dedup: hash-groupBy on content (one shuffle on the hash)
- MinHash+LSH banding: shingle -> 32 minhashes -> 8 bands x 4 rows ->
  band-bucket self-join. The classic scale path: candidate generation never
  compares all pairs, only bucket collisions.
- SimHash: weighted-bit fingerprint, hamming-bucket grouping — two forms:
  a 64-bit xxhash64 scale form (simhash64) and a 60-bit md5 oracle form
  (simhash_feature_hashes + simhash_from_hashes) whose arithmetic DuckDB
  mirrors exactly (q_doc_fingerprint's simhash_fp column)
- n-gram Jaccard: exact pairwise similarity on LSH-survivor pairs

Hash family: ONE md5 per shingle, split into two u64 halves (h1, h2|1);
the i-th minhash input is h_i = (h1 + i*h2) mod 2^64 — the Kirsch-
Mitzenmacher double-hashing construction (their 2006 result: two hashes
derive k pairwise-good ones without loss for Bloom-filter-class uses).
At 100 TB this is 32x fewer strong hashes than the naive md5(seed:shingle)
family, and the whole signature stage is MAP-SIDE: one row per doc, no
explode, no shuffle (the r1 form shuffled docs x shingles x 32 rows).
Minhash values render as 16-char zero-padded hex so lexicographic min ==
numeric min and band sigs stay oracle-checkable strings in any engine.
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
    """Word-level k-shingles as an array column (distinct, order-free set).

    Short docs (< k tokens) yield one partial shingle: F.get returns NULL
    past the end (a bare toks[i+j] is an ANSI INVALID_ARRAY_INDEX error
    under Spark 4's defaults) and concat_ws skips NULLs — matching the
    pandas kernel's ' '.join(toks[i:i+k]) exactly."""
    toks = F.split(text_col, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)])
        )
    )


_TWO63 = 9223372036854775808
_TWO64 = 18446744073709551616


def _dec_lit(v: int):
    """Decimal literal Column for values beyond BIGINT range (py4j cannot
    ship a python int >= 2^63 as a long literal)."""
    return F.lit(str(v)).cast("decimal(21,0)")


def _hash_pairs(shingles_col):
    """array<struct<h1,h2>> — one md5 per shingle, split into two u64 halves
    (as DECIMAL(20,0): Spark 4 BIGINT is ANSI-overflow-checked, decimals give
    exact mod-2^64 arithmetic). h2 is forced odd (h2 + 1 - h2 % 2) so the
    derived sequence h1 + i*h2 cycles through all residues."""

    def u64(hex16):
        return F.conv(hex16, 16, 10).cast("decimal(20,0)")

    def pair(s):
        d = F.md5(s.cast("binary"))
        h2 = u64(F.substring(d, 17, 16))
        return F.struct(
            u64(F.substring(d, 1, 16)).alias("h1"), (h2 + 1 - h2 % 2).alias("h2")
        )

    return F.transform(shingles_col, pair)


def _hex16(v):
    """Zero-padded 16-char lowercase hex of a mod-2^64 DECIMAL value (via the
    two's-complement BIGINT it maps to — Spark's hex() of a negative long is
    the full 16-digit two's-complement form)."""
    signed = F.when(v >= _dec_lit(_TWO63), v - _dec_lit(_TWO64)).otherwise(v).cast("long")
    return F.lpad(F.lower(F.hex(signed)), HASH_WIDTH, "0")


def minhash_sig_array(pairs_col, n_hashes: int = N_HASHES):
    """Column builder: array<string> of n minhashes from a `_hash_pairs`
    column — Kirsch-Mitzenmacher derivation, entirely map-side.

    For seed i: min over shingles of (h1 + i*h2) mod 2^64, rendered as fixed
    width hex. Nothing explodes, nothing shuffles; the r1 form (explode
    shingles x explode seeds -> groupBy) materialized docs x shingles x 32
    rows through a shuffle — ~32x the corpus token count at 100 TB.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: _hex16(
            F.array_min(
                F.transform(
                    pairs_col,
                    lambda p: (p["h1"] + i.cast("decimal(10,0)") * p["h2"]) % _dec_lit(_TWO64),
                )
            )
        ),
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-doc minhash signature rows: (doc_id, seed, minhash).

    Map-side (posexplode of :func:`minhash_sig_array`) — zero shuffles; the
    rows form is kept for API parity, band folding uses the array directly.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), _hash_pairs(shingles(F.col(text_col))).alias("_hp")
    )
    return base.select(
        "doc_id", F.posexplode(minhash_sig_array(F.col("_hp"), n_hashes)).alias("seed", "minhash")
    )


def band_signatures_sql(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-band LSH signatures: (doc_id, band, band_sig) — pure-Catalyst form.

    Map-side end to end: slice the minhash array into contiguous bands and
    concat_ws each — no groupBy/collect_list (the r1 form shuffled twice:
    once for signatures, once to fold bands). The hash-pair and signature
    arrays are projected into their own columns so the band lambdas share
    one computation instead of inlining the 32-hash expression per band
    (CollapseProject keeps non-cheap multi-referenced projections separate).

    Interpreted higher-order functions make this ~10x slower per row than
    :func:`band_signatures_pandas`, which is the default engine path; this
    form exists as the no-Python variant and the property-test anchor.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), _hash_pairs(shingles(F.col(text_col))).alias("_hp")
    )
    with_sig = base.select("doc_id", minhash_sig_array(F.col("_hp"), n_hashes).alias("_sig"))
    n_bands = n_hashes // ROWS_PER_BAND
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.concat_ws("|", F.slice(F.col("_sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND)),
    )
    return with_sig.select("doc_id", F.posexplode(bands).alias("band", "band_sig"))


def band_signatures_pandas(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-band LSH signatures via an Arrow kernel — the default engine path.

    Same map-side shape as :func:`band_signatures_sql` (one pass, no
    shuffle) but the per-shingle md5 runs through hashlib (C) and the 32
    derived hashes + mins are one vectorized uint64 numpy op per doc
    (unsigned wraparound == mod 2^64). Bit-identical output to the SQL form
    (discrete strings — no float rounding anywhere), property-tested.
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n_bands = n_hashes // ROWS_PER_BAND
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("band_sig", T.StringType()),
        ]
    )
    seeds = np.arange(n_hashes, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            ids: list = []
            band_nos: list = []
            sigs: list = []
            for doc_id, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                if text is None or (isinstance(text, float) and text != text):
                    # NULL text: the SQL twin's concat_ws collapses it to
                    # ONE empty-string shingle (md5("")) — mirror that
                    # instead of crashing on None.split
                    text = ""
                toks = text.split(" ")
                hi = max(len(toks) - SHINGLE_K, 0)
                sh = {" ".join(toks[i : i + SHINGLE_K]) for i in range(hi + 1)}
                h1 = np.empty(len(sh), dtype=np.uint64)
                h2 = np.empty(len(sh), dtype=np.uint64)
                for j, s in enumerate(sh):
                    d = hashlib.md5(s.encode()).digest()
                    h1[j] = int.from_bytes(d[:8], "big")
                    h2[j] = int.from_bytes(d[8:], "big") | 1
                mins = (h1[:, None] + seeds[None, :] * h2[:, None]).min(axis=0)
                mh = [format(v, "016x") for v in mins]
                for b in range(n_bands):
                    ids.append(doc_id)
                    band_nos.append(b)
                    sigs.append("|".join(mh[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "band": np.asarray(band_nos, dtype=np.int32),
                    "band_sig": sigs,
                }
            )

    return docs.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(gen, out_schema)


def band_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    kernel: str = "pandas",
    spread: bool = True,
) -> DataFrame:
    """Per-band LSH signatures: (doc_id, band, band_sig); kernel selects the
    Arrow numpy path (default) or the pure-Catalyst expression form.

    ``spread=False`` skips the input-skew repartition: a caller that KNOWS
    the input is a few hundred rows (an oracle-parity query with a pushed
    id cap) pays only exchange overhead for it — measured at sf0.1, the
    full-corpus pass wins 1.8x from the spread while the 100-doc capped
    pass loses 0.16 s to it (guide §1: measure first).
    """
    from webscale_vector_search_spark.operators.knn import spread_if_narrow

    # the per-shingle md5 + minhash fold is map-side CPU ahead of any
    # exchange; spread an unsplittable narrow input (guide §2.5). Output
    # is per-row discrete strings — partitioning-independent by nature.
    fn = band_signatures_pandas if kernel == "pandas" else band_signatures_sql
    return fn(spread_if_narrow(docs) if spread else docs, id_col, text_col, n_hashes)


def neardup_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", spread: bool = True
) -> DataFrame:
    """X2 — candidate near-dup pairs: docs sharing any band bucket.

    The self-join happens per bucket (groupBy band_sig), never all-pairs:
    at 100 TB the band signature is the shuffle key and bucket sizes stay
    small for non-pathological corpora (salt oversized buckets if needed).
    """
    bands = band_signatures(docs, id_col, text_col, spread=spread)
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
    # get() not [..]: a doc with fewer than n_grams tokens must yield one
    # partial gram (concat_ws skips the NULLs), not an ANSI INVALID_ARRAY_
    # INDEX error. The per-feature xxhash64 array is bound ONCE through a
    # single-element array + transform (hs) — referencing the feature
    # pipeline inside the per-bit lambda would inline and recompute it 64
    # times per row (the same CollapseProject cost simhash_feature_hashes'
    # docstring prices for the md5 form).
    feats = (
        f"array_distinct(transform("
        f"sequence(0, greatest(size(split({col_sql}, ' ')) - {n_grams}, 0)), "
        f"i -> concat_ws(' ', "
        + ", ".join(f"get(split({col_sql}, ' '), i + {j})" for j in range(n_grams))
        + ")))"
    )
    hashes = f"transform({feats}, ft -> xxhash64(ft))"
    votes = (
        "aggregate(hs, 0, (acc, h) -> acc + "
        "CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    return F.expr(
        f"get(transform(array({hashes}), hs -> "
        f"aggregate(transform(sequence(0, 63), b -> "
        f"CASE WHEN ({votes}) > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
        f"ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, x) -> a + x)), 0)"
    )


def simhash_feature_hashes(text_col, n_grams: int = 2):
    """Per-feature 60-bit md5 hashes for the oracle-parity SimHash.

    Features = distinct word n-gram shingles; each hashes to the first 15
    hex chars of its md5 (60 bits — fits signed BIGINT in every engine, so
    DuckDB can mirror the arithmetic exactly). Returns ARRAY<BIGINT>.

    Kept as a SEPARATE stage from the bit-vote fold so the expensive md5
    runs ONCE per feature: the vote loop references this array 60 times,
    and Catalyst's CollapseProject keeps a multiply-referenced non-cheap
    projection in its own stage instead of inlining 60 copies.
    """
    col_sql = text_col if isinstance(text_col, str) else text_col._jc.toString()
    toks = f"split({col_sql}, ' ')"
    feats = (
        f"array_distinct(transform("
        f"sequence(0, greatest(size({toks}) - {n_grams}, 0)), "
        f"i -> concat_ws(' ', "
        # get(): NULL past the end (short docs), not an ANSI index error
        + ", ".join(f"get({toks}, i + {j})" for j in range(n_grams))
        + ")))"
    )
    return F.expr(
        f"transform({feats}, ft -> "
        f"CAST(conv(substr(md5(CAST(ft AS BINARY)), 1, 15), 16, 10) AS BIGINT))"
    )


def simhash_from_hashes(hashes_col):
    """Fold per-feature 60-bit hashes into the SimHash fingerprint.

    Per bit b in 0..59: +1 for every feature hash with bit b set, -1
    otherwise; fingerprint bit b = 1 iff the vote is strictly positive.
    A doc with no features (empty array) votes 0 on every bit -> 0.
    Returns BIGINT. DuckDB twin in queries.py `_FINGERPRINT_DOC_ORACLE`.
    """
    col_sql = hashes_col if isinstance(hashes_col, str) else hashes_col._jc.toString()
    vote = (
        f"aggregate({col_sql}, 0, (acc, h) -> acc + "
        f"CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    return F.expr(
        f"aggregate(transform(sequence(0, 59), b -> "
        f"CASE WHEN ({vote}) > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
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


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 20,
    spread: bool = True,
) -> DataFrame:
    """Near-dup CLUSTER ASSIGNMENT: connected components over candidate
    pairs, cluster_id = min doc_id in the component (singletons cluster to
    themselves). The step after pair generation in every production dedup
    pipeline — keep one representative per cluster, not per pair (pairwise
    keep-the-smaller drops too much when A~B and B~C but A!~C).

    Algorithm: hash-min label propagation — labels start at doc_id; each
    round every node takes the min label among itself and its neighbors;
    converges in <= component-diameter rounds (near-dup components are
    shallow: LSH pairs are mostly cliques of rewrites). Each round is one
    bounded shuffle of |pairs| rows joined against the label table; the
    corpus-sized docs table is touched once (label init). The driver loop
    only checks a 0/1 convergence flag per round — no corpus data ever
    reaches the driver. max_iter bounds adversarial chain-shaped components.

    Returns (doc_id, cluster_id) for EVERY input doc, deterministic.
    """
    if pairs is None:
        pairs = neardup_candidate_pairs(docs, id_col=id_col, spread=spread)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).cache()
    # localCheckpoint, not cache: each round references the previous label
    # table TWICE (neighbor join + convergence check), so lineage doubles
    # per round — the logical plan goes exponential and the driver OOMs
    # planning round ~10+. Checkpointing truncates the plan to the
    # materialized result (on a real cluster, checkpoint to reliable
    # storage if executor loss during the loop must be survivable).
    labels = docs.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint()
    try:
        converged = False
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("node").alias("dst"), F.col("cluster_id").alias("dst_label")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("dst_label").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr_min, labels.node == nbr_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                    ).alias("cluster_id"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        edges.unpersist()
    if not converged:
        # a component of diameter > max_iter would come back SPLIT into
        # several cluster_ids — downstream keep-one-per-cluster then
        # retains near-duplicates. Signal it instead of silent truncation.
        import warnings

        warnings.warn(
            f"dedup_clusters: label propagation did not converge within "
            f"max_iter={max_iter} rounds — a component wider than that is "
            f"split across multiple cluster_ids; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias(id_col), "cluster_id")


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any token k-gram
    with a held-out benchmark set (the standard pre-training hygiene check;
    k=8..13 windows are the common published choice).

    Scale shape: the benchmark side is always tiny relative to the corpus
    (eval suites are MBs, corpora are TBs), so its distinct k-gram set
    BROADCASTS; the training side explodes its per-doc distinct k-grams in
    the map task, survives the broadcast-hash semi-join only on actual
    overlaps, and the single shuffle aggregates hit-counts for matched docs
    only — the clean corpus never reaches an exchange.

    Returns (doc_id, n_overlap) — one row per CONTAMINATED training doc,
    n_overlap = number of distinct shared k-grams.
    """
    bench_grams = benchmark.select(
        F.explode(shingles(F.col(text_col), k)).alias("gram")
    ).distinct()
    train_grams = train.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("gram")
    )
    hits = train_grams.join(F.broadcast(bench_grams), "gram")
    # shingles() is per-doc distinct, so plain count == distinct-gram count
    return hits.groupBy(id_col).agg(F.count("*").alias("n_overlap"))


def dup_span_stats(
    docs: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span statistics — the distributed analog of
    exact-substring training-data dedup (suffix-array ExactSubstr family):
    for every w-token window position, is that window's text repeated in any
    OTHER document?

    Shape (r13): per-doc w-gram positions explode in the map task ONCE;
    one shuffle aggregates positions per (gram, doc); a gram-keyed window
    counts each gram's distinct docs; a final per-doc aggregate folds
    total and duplicated coverage together. The gram key travels as a 16-hex-char
    md5 prefix, not the raw window text, so shuffle width is constant no
    matter how long the windows are — at corpus scale this is the same
    partition-by-fingerprint plan the published Spark/BigQuery substring
    dedup pipelines use (a distributed suffix array would need a global
    sort of every token position; the fixed-w windowed form is the
    shuffle-bounded approximation).

    Returns (doc_id, n_grams, dup_grams, dup_fraction): window count,
    windows whose gram appears in >= 2 distinct docs, and their ratio.
    """
    from webscale_vector_search_spark.operators.knn import spread_if_narrow

    # the tokenize + per-position md5 explode is the expensive stage and it
    # runs BEFORE the first exchange — an unsplittable input (one parquet
    # row group) would pin it to one task (guide §2.5 input skew). All
    # downstream aggregation is exact BIGINT, so the spread cannot change
    # results (measured identical; ~2.7x at sf0.1 on a 32-core session).
    docs = spread_if_narrow(docs)
    toks = F.split(F.lower(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - w)  # empty when size < w
    grams = docs.filter(F.size(toks) >= w).select(
        F.col(id_col),
        F.explode(
            F.transform(idx, lambda i: F.substring(
                F.md5(F.concat_ws(" ", *[toks[i + j] for j in range(w)]).cast("binary")),
                1, HASH_WIDTH,
            ))
        ).alias("gram_hash"),
    )
    # r13 single-scan shape: the former three-branch plan re-ran the
    # tokenize + per-position md5 explode THREE times (duplicated-gram
    # aggregate, join-back, per-doc totals). Pre-aggregate per
    # (gram_hash, doc) once, count the gram's distinct docs as a window
    # over those rows (one row per doc by construction), and fold both
    # per-doc outputs — total positions and positions whose gram appears
    # in >= 2 docs — into ONE conditional aggregate. Identical BIGINT
    # arithmetic, one corpus scan, and no join whose right side (the
    # duplicated-gram set) only broadcasts at test scale.
    from pyspark.sql import Window

    gpc = grams.groupBy("gram_hash", id_col).agg(F.count("*").alias("_c"))
    flagged = gpc.withColumn(
        "_n_docs", F.count("*").over(Window.partitionBy("gram_hash"))
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.sum("_c").alias("n_grams"),
        F.sum(F.when(F.col("_n_docs") >= 2, F.col("_c")).otherwise(F.lit(0))).alias(
            "dup_grams"
        ),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        F.col("dup_grams").cast("long").alias("dup_grams"),
        F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias("dup_fraction"),
    )
