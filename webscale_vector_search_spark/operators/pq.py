"""Product quantization: K7 (encode) and K8 (ADC search), SURVEY.md §2.3.

Reference: IndexIVFPQ with m = max(1, dim // 4) subvectors, 8 bits each
(vector_search_cluster.py:1033-1041) — every vector compresses to m bytes.

Spark-first decomposition:
- codebooks: per-subspace k-means (256 codes) fit on a bounded seeded sample.
  The codebook is index metadata (m x 256 x dsub floats — a few MB), stored
  as a Parquet artifact beside the corpus.
- encode: map-only numpy kernel over Arrow batches -> codes ARRAY<SMALLINT>
  (SMALLINT because Spark's TINYINT is signed and codes span 0..255).
  Column pruning means FLAT scans never read codes and PQ scans never read
  raw vectors (SURVEY.md O5).
- ADC search: per-query lookup table (m x 256 squared-distance table against
  the query's subvectors), then candidate distance = sum of m table lookups.
  Runs as a map-only kernel emitting per-batch partial top-k; the final
  merge is the same rank window as exact search — identical partial/final
  shape to the scatter-gather merge (K2/K3).

At 100 TB the ADC scan reads m bytes/vector instead of 4*dim — a 16x IO cut
at dim=64/m=16 — and never shuffles the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fit_codebooks(
    corpus: DataFrame,
    m: int,
    seed: int = 42,
    sample_n: int = 100_000,
    n_codes: int = 256,
    kmeans_iters: int = 10,
    vec_col: str = "embedding",
) -> np.ndarray:
    """K7 (train) — per-subspace Lloyd k-means on a seeded sample.

    Returns codebooks (m, n_codes, dsub) float64. The sample is bounded
    (default 100k vectors — the reference's own build batch size, 1083), so
    driver memory stays O(sample), never O(corpus). Fixes quirk Q7: the
    sample is drawn uniformly from the whole corpus, not the first batch.
    """
    n_total = corpus.count()
    fraction = min(1.0, sample_n / max(n_total, 1))
    sample = (
        corpus.select(vec_col).sample(fraction=fraction, seed=seed)
        if fraction < 1.0
        else corpus.select(vec_col)
    )
    X = np.stack([r[0] for r in sample.collect()]).astype(np.float64)  # (n, dim)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    k = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, dsub))
    for j in range(m):
        sub = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
        centers = sub[rng.choice(n, size=k, replace=False)]
        for _ in range(kmeans_iters):
            # assignment via the dot expansion (no n x k x dsub intermediate)
            d = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ centers.T) + (centers * centers).sum(1)[None, :]
            labels = d.argmin(1)
            # vectorized center update: per-cluster sums via scatter-add
            sums = np.zeros((k, dsub))
            np.add.at(sums, labels, sub)
            counts = np.bincount(labels, minlength=k).astype(np.float64)
            nonempty = counts > 0
            centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[j, :k] = centers
        if k < n_codes:
            books[j, k:] = centers[0]  # pad unused codes with a valid center
    return books


def encode(corpus: DataFrame, codebooks: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """K7 (encode) — append codes ARRAY<SMALLINT>, map-only numpy kernel."""
    m, n_codes, dsub = codebooks.shape
    schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("codes", T.ArrayType(T.ShortType()))]
    )
    books = codebooks  # closure capture; a few MB broadcast with the task

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = len(V)
            codes = np.empty((n, m), dtype=np.int16)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                cb = books[j]
                d = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T) + (cb * cb).sum(1)[None, :]
                codes[:, j] = d.argmin(1)
            pdf = pdf.copy()
            pdf["codes"] = list(codes)
            yield pdf

    return corpus.mapInPandas(enc, schema)


def adc_distances_sql(codes_df: DataFrame, codebooks: np.ndarray, queries: DataFrame, spark) -> DataFrame:
    """K8 reference form: reconstruct each coded vector from the codebook
    tables and compute exact SQL distances to each query. Used to cross-check
    the numpy ADC kernel on small data (ADC distance == distance to the
    reconstruction, by definition)."""
    m, n_codes, dsub = codebooks.shape
    flat = [
        (j, c, [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(n_codes)
    ]
    cb_df = spark.createDataFrame(flat, "subspace INT, code INT, cvec ARRAY<FLOAT>")
    exploded = codes_df.select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    ).join(F.broadcast(cb_df), ["subspace", "code"])
    recon = (
        exploded.groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("subspace", "cvec"))),
                    lambda x: x["cvec"],
                )
            ).alias("embedding")
        )
    )
    from webscale_vector_search_spark.operators.knn import with_distance

    return with_distance(recon.crossJoin(F.broadcast(queries)))


def adc_search(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """K8 — asymmetric-distance search over PQ codes.

    Map-only kernel: per Arrow batch, build each query's (m x 256) LUT once,
    gather-sum over the batch's codes, emit the batch-local top-k per query.
    The final global top-k is the K3 rank window. Corpus IO is codes-only
    (column pruning drops the raw vectors at the scan).

    With `centroids` + `nprobe` given (IVFPQ), probe selection runs
    driver-side like ivf_search_pandas: the codes scan is statically pruned
    to the union of probed lists AND each query only scores its own probed
    lists via the (query x centroid) mask — per-query inverted-list
    semantics, zero joins.
    """
    m, n_codes, dsub = codebooks.shape
    q_rows = queries.select("query_id", "qvec").collect()
    q_ids = np.array([r["query_id"] for r in q_rows])
    Q = np.stack([r["qvec"] for r in q_rows]).astype(np.float64)  # (nq, dim)
    books = codebooks
    nq = len(q_ids)

    probe_mask = None
    scan_cols = [id_col, "codes"]
    if centroids is not None and nprobe is not None:
        c_rows = centroids.orderBy("centroid_id").collect()
        C = np.stack([r["cvec"] for r in c_rows]).astype(np.float64)
        c_ids = np.array([r["centroid_id"] for r in c_rows], dtype=np.int64)
        cd = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + (C * C).sum(1)[None, :]
        order = np.argsort(cd, axis=1, kind="stable")[:, : min(nprobe, len(c_ids))]
        probe_mask = np.zeros((nq, int(c_ids.max()) + 1), dtype=bool)
        for qi in range(nq):
            probe_mask[qi, c_ids[order[qi]]] = True
        probed = sorted({int(c_ids[c]) for row in order for c in row})
        from pyspark.sql import functions as SF

        codes_df = codes_df.filter(SF.col("centroid_id").isin(probed))
        scan_cols.append("centroid_id")

    # per-query LUT: lut[q, j, c] = ||Q[q, sub_j] - books[j, c]||^2
    lut = np.empty((nq, m, n_codes))
    for j in range(m):
        qs = Q[:, j * dsub : (j + 1) * dsub]  # (nq, dsub)
        cb = books[j]  # (256, dsub)
        lut[:, j, :] = (
            (qs * qs).sum(1)[:, None] - 2.0 * (qs @ cb.T) + (cb * cb).sum(1)[None, :]
        )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            n = len(ids)
            # dist[q, i] = sum_j lut[q, j, codes[i, j]]
            dist = lut[:, np.arange(m)[None, :], codes[:, :]].sum(axis=2)  # (nq, n)
            if probe_mask is not None:
                cent = pdf["centroid_id"].to_numpy(dtype=np.int64)
                dist[~probe_mask[:, cent]] = np.inf
            from webscale_vector_search_spark.operators.knn import batch_topk_rows

            yield pd.DataFrame(batch_topk_rows(dist, ids, q_ids, k))

    partial = codes_df.select(*scan_cols).mapInPandas(scan, out_schema)
    from webscale_vector_search_spark.operators.knn import topk

    ranked = topk(partial, k)
    return ranked.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").alias("neighbor_id"),
        "distance",
    )
