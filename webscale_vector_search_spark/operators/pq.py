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


def _centroid_array(centroids: DataFrame) -> np.ndarray:
    """(max_centroid_id + 1, dim) float64 lookup, indexable by centroid_id."""
    rows = centroids.orderBy("centroid_id").collect()
    dim = len(rows[0]["cvec"])
    C = np.zeros((max(r["centroid_id"] for r in rows) + 1, dim))
    for r in rows:
        C[r["centroid_id"]] = r["cvec"]
    return C


def fit_codebooks(
    corpus: DataFrame,
    m: int,
    seed: int = 42,
    sample_n: int = 100_000,
    n_codes: int = 256,
    kmeans_iters: int = 10,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    n_total: int | None = None,
) -> np.ndarray:
    """K7 (train) — per-subspace Lloyd k-means on a seeded sample.

    Returns codebooks (m, n_codes, dsub) float64. The sample is bounded
    (default 100k vectors — the reference's own build batch size, 1083), so
    driver memory stays O(sample), never O(corpus). Fixes quirk Q7: the
    sample is drawn uniformly from the whole corpus, not the first batch.

    With `centroids` given, codebooks are fit on RESIDUALS v - C[assign(v)]
    (corpus must carry centroid_id — i.e. pass the assigned corpus). This is
    FAISS IndexIVFPQ's encoding (faiss' by_residual default): raw-vector
    codebooks must cover the whole corpus spread, so on clustered data the
    quantization cell is coarser than the within-cluster structure and ADC
    cannot rank inside a cluster (measured: recall@10 0.22 on a 1M clustered
    corpus, vs 0.9+ for residual codes at the same m).
    """
    if n_total is None:  # caller usually knows it (build_index counts once)
        n_total = corpus.count()
    fraction = min(1.0, sample_n / max(n_total, 1))
    # Select the vector column ONLY. assign_centroids is a mapInArrow kernel,
    # so a plan that carries centroid_id runs the full-corpus assignment GEMM
    # just to sample from it (measured as ~2 extra corpus passes per IVFPQ
    # build at the 1M tier); instead the sample's coarse assignment is
    # recomputed driver-side below — same argmin, O(sample) work.
    sample = (
        corpus.select(vec_col).sample(fraction=fraction, seed=seed)
        if fraction < 1.0
        else corpus.select(vec_col)
    )
    rows = sample.collect()
    X = np.stack([r[0] for r in rows]).astype(np.float64)  # (n, dim)
    if centroids is not None:
        C = _centroid_array(centroids)
        d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        X = X - C[d.argmin(1)]
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
            # assignment via the dot expansion, DROPPING the per-row ||x||^2
            # term (constant within a row -> argmin-invariant): the fit is
            # memory-bound on the (n, k) matrix, and skipping the row-norm
            # broadcast-add removes a full read+write pass over it
            d = (centers * centers).sum(1)[None, :] - 2.0 * (sub @ centers.T)
            labels = d.argmin(1)
            # per-cluster sums via bincount (C loop; ~2x np.add.at)
            counts = np.bincount(labels, minlength=k).astype(np.float64)
            sums = np.stack(
                [np.bincount(labels, weights=sub[:, t], minlength=k) for t in range(dsub)],
                axis=1,
            )
            nonempty = counts > 0
            centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[j, :k] = centers
        if k < n_codes:
            books[j, k:] = centers[0]  # pad unused codes with a valid center
    return books


def encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """K7 (encode) — append codes ARRAY<SMALLINT>, map-only numpy kernel.

    With `centroids`, encodes residuals v - C[centroid_id] (pair with
    codebooks fit the same way — see fit_codebooks)."""
    m, n_codes, dsub = codebooks.shape
    schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("codes", T.ArrayType(T.ShortType()))]
    )
    books = codebooks  # closure capture; a few MB broadcast with the task
    C_arr = _centroid_array(centroids) if centroids is not None else None

    def enc(batches):
        import pyarrow as pa

        from webscale_vector_search_spark.operators.knn import list_matrix

        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = list_matrix(batch, vec_col, dtype=np.float64)
            if C_arr is not None:
                cent_idx = batch.schema.get_field_index("centroid_id")
                V = V - C_arr[batch.column(cent_idx).to_numpy().astype(np.int64)]
            n = len(V)
            codes = np.empty((n, m), dtype=np.int16)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                cb = books[j]
                d = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T) + (cb * cb).sum(1)[None, :]
                codes[:, j] = d.argmin(1)
            offsets = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
            codes_arr = pa.ListArray.from_arrays(offsets, pa.array(codes.ravel()))
            yield batch.append_column(pa.field("codes", pa.list_(pa.int16())), codes_arr)

    return corpus.mapInArrow(enc, schema)


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
    residual: bool = False,
    probes=None,
    lut_dtype: str = "float32",
) -> DataFrame:
    """K8 — asymmetric-distance search over PQ codes.

    Map-only kernel: per Arrow batch, build each query's (m x 256) LUT once,
    gather-sum over the batch's codes, emit the batch-local top-k per query.
    The final global top-k is the K3 rank window. Corpus IO is codes-only
    (column pruning drops the raw vectors at the scan).

    With `centroids` + `nprobe` given (IVFPQ), probe selection runs
    driver-side like ivf_search_pandas: the codes scan is statically pruned
    to the union of probed lists AND each batch is scored one inverted list
    at a time with only the queries probing it — per-query inverted-list
    semantics, zero joins, compute ~nprobe/nlist of the exact-code scan.

    With `residual=True` (codes encode v - C[centroid_id]; FAISS IVFPQ
    semantics), the kernel is decode-then-GEMM: reconstruct each coded row
    ONCE per batch (m query-independent codebook gathers -> C_l + r_hat),
    then score every probing query against the reconstructions with the
    same BLAS matmul as exact search. ADC distance IS the distance to the
    reconstruction, so this is algebraically the classic LUT gather-sum —
    but on this substrate a per-(row, query) LUT gather is a random 4-8 B
    read while dgemm streams at memory bandwidth; measured 2x+ faster at a
    1000-query batch, and the scan still reads codes only (the IO cut is
    the point at 100 TB — the reconstruction never exists on disk or in
    the shuffle, only inside the task).

    ``lut_dtype`` ('float32' default) is the precision of the plain-path
    (non-residual) gathered LUT — float32 halves the random-read bytes
    (FAISS precedent; its fast-scan path quantizes LUTs to int8). Absolute
    error ~1e-4 on unit-scale data, three orders below PQ quantization
    error; partial sums still accumulate in float64. Pass 'float64' for
    the bit-exact decomposition (the ADC==reconstruction property tests
    do). The residual path computes in float64 throughout (the GEMM form
    has no LUT to quantize).

    The code tables are built PER TASK inside the kernel, not driver-side:
    at nq=100/m=16 the precomputed tables are ~11 MB (qdot 3.3 MB + cdot
    7+ MB of doubles) and Spark serializes the closure into every task
    binary — measured as the dominant cost of the 1M-corpus IVFPQ search.
    The closure now ships only Q + codebooks + the probed centroid block
    (<1 MB); rebuilding the tables is a handful of (nq x dsub)@(dsub x 256)
    GEMMs — microseconds against a per-task scan of thousands of codes.
    """
    m, n_codes, dsub = codebooks.shape
    books = codebooks
    if residual and probes is None and (centroids is None or nprobe is None):
        raise ValueError("residual ADC requires centroids + nprobe")

    scan_cols = [id_col, "codes"]
    if probes is None and centroids is not None and nprobe is not None:
        from webscale_vector_search_spark.operators.ivf import DriverProbes

        probes = DriverProbes(queries, centroids, nprobe)
    if probes is not None:
        q_ids, Q = probes.q_ids, probes.Q
        codes_df = probes.prune(codes_df)
        scan_cols.append("centroid_id")
        probe_lists = probes.probe_lists
        # probed centroid block + centroid_id -> block-row map (small: the
        # query batch's probed union, never nlist x dim)
        probed_ids = np.array(probes.probed_lists, dtype=np.int64)
        Cp = probes.C[probes.slot_of[probed_ids]]  # (n_probed, dim)
        probed_row = np.full(probes.slot_of.shape[0], -1, dtype=np.int64)
        probed_row[probed_ids] = np.arange(len(probed_ids))
        use_probes = True
    else:
        q_rows = queries.select("query_id", "qvec").collect()
        q_ids = np.array([r["query_id"] for r in q_rows])
        Q = np.stack([r["qvec"] for r in q_rows]).astype(np.float64)  # (nq, dim)
        probe_lists = probed_row = Cp = None
        use_probes = False
    probes = None  # keep the DriverProbes object (qc2/C/slot_of) out of the closure

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def scan(batches):
        from webscale_vector_search_spark.operators.knn import (
            batch_topk_rows,
            list_matrix,
            segment_iter,
            topk_record_batch,
        )

        ldt = np.dtype(lut_dtype)
        # per-task table build (see docstring): tables stay worker-local
        # instead of riding the serialized closure
        j_idx = np.arange(m)[None, :]
        if residual:
            q_sq = (Q * Q).sum(1)  # decode-then-GEMM needs only ||q||^2
        else:
            # plain ADC LUT: lut[q, j, c] = ||Q[q]_subj - books[j,c]||^2,
            # written in lut_dtype DIRECTLY (no float64 intermediate)
            lut = np.empty((len(q_ids), m, n_codes), dtype=ldt)
            for j in range(m):
                cb = books[j]  # (n_codes, dsub)
                qs = Q[:, j * dsub : (j + 1) * dsub]
                lut[:, j, :] = (
                    (qs * qs).sum(1)[:, None]
                    - 2.0 * (qs @ cb.T)
                    + (cb * cb).sum(1)[None, :]
                )

        for batch in batches:
            if batch.num_rows == 0:
                continue
            codes = list_matrix(batch, "codes").astype(np.int64, copy=False)  # (n, m)
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy()
            if not use_probes:
                # accumulate float64 regardless of LUT precision
                dist = lut[:, j_idx, codes[:, :]].sum(axis=2, dtype=np.float64)
                yield topk_record_batch([batch_topk_rows(dist, ids, q_ids, k)])
                continue
            cent = batch.column(batch.schema.get_field_index("centroid_id")).to_numpy()
            if residual:
                # decode ONCE per batch, query-independent: m codebook
                # gathers -> r_hat, + the row's probed centroid -> the
                # reconstruction every probing query scores against
                recon = np.empty((len(codes), m * dsub))
                for j in range(m):
                    recon[:, j * dsub : (j + 1) * dsub] = books[j][codes[:, j]]
                recon += Cp[probed_row[cent.astype(np.int64, copy=False)]]
                recon_sq = (recon * recon).sum(1)
            parts = []
            # one inverted list at a time (segment sort, not per-list rescans)
            for cv, rows in segment_iter(cent.astype(np.int64, copy=False)):
                qsel = probe_lists.get(cv)
                if qsel is None:
                    continue
                if residual:
                    # same BLAS shape as exact search, over reconstructions
                    r = recon[rows]
                    d = (
                        q_sq[qsel][:, None]
                        - 2.0 * (Q[qsel] @ r.T)
                        + recon_sq[rows][None, :]
                    )
                    np.maximum(d, 0.0, out=d)
                else:
                    d = lut[qsel][:, j_idx, codes[rows]].sum(axis=2, dtype=np.float64)
                parts.append(batch_topk_rows(d, ids[rows], q_ids[qsel], k))
            if parts:
                yield topk_record_batch(parts)

    partial = codes_df.select(*scan_cols).mapInArrow(scan, out_schema)
    from webscale_vector_search_spark.operators.knn import topk

    ranked = topk(partial, k)
    return ranked.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").alias("neighbor_id"),
        "distance",
    )
