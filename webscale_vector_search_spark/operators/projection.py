"""Seeded random projection (Johnson-Lindenstrauss transform) for embedding
columns — the standard dimensionality-reduction pre-step before clustering,
near-dup blocking, or ANN on high-dim vectors (project 768-d to 64-d, run the
cheap pipeline there, refine survivors at full dim).

Spark shape: a map-only Arrow kernel — each task derives the SAME projection
matrix deterministically from the seed (splitmix64 counter stream + Box-Muller,
no dependence on numpy RNG version or platform), so nothing ships in the
closure but the seed and dimensions, and the output is identical under any
partitioning. No shuffle, no driver-side matrix broadcast.

The reference has no projection operator; this extends the X3/X19 embedding
family (SURVEY.md §2.8) the same way PQ extends storage: distance-preserving
compression, here with the JL (1 ± eps) pairwise-distance guarantee at
k = O(ln n / eps^2) output dims (property-tested in tests/test_projection.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _splitmix_u64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 counter array — the engine's
    portable deterministic stream (same construction as bench.py's data
    generator and functions/hashing.det_hash's role: reproducible anywhere)."""
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(27)
        z ^= z >> np.uint64(31)
    return z


def projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """(in_dim, out_dim) float64 Gaussian JL matrix, entries N(0, 1/out_dim).

    Entry (i, j) is a pure function of (seed, i, j): two splitmix64 draws at
    counters (2*(i*out_dim+j), +1) feed one Box-Muller cosine branch. Exactly
    reproducible on any worker, any platform, any numpy.
    """
    n = in_dim * out_dim
    idx = np.arange(n, dtype=np.uint64)
    base = np.uint64((seed * 0x9E3779B97F4A7C15) % 2**64)
    with np.errstate(over="ignore"):
        c1 = base + 2 * idx
        c2 = base + 2 * idx + np.uint64(1)
    u1 = _splitmix_u64(c1)
    u2 = _splitmix_u64(c2)
    # map to (0,1]: (x + 1) / 2^64 keeps u1 > 0 so log never sees 0
    f1 = (u1.astype(np.float64) + 1.0) / np.float64(2**64)
    f2 = u2.astype(np.float64) / np.float64(2**64)
    g = np.sqrt(-2.0 * np.log(f1)) * np.cos(2.0 * np.pi * f2)
    return (g / np.sqrt(out_dim)).reshape(in_dim, out_dim)


def random_projection(
    df: DataFrame,
    out_dim: int,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project `vec_col` (ARRAY<FLOAT>, any fixed dim) to `out_dim` dims.

    Map-only: each task rebuilds the matrix from (seed, dims) — closure
    carries three ints — and runs one (batch x in_dim) @ (in_dim x out_dim)
    GEMM per Arrow batch. Replaces `vec_col` unless `out_col` is given.
    """
    out_col = out_col or vec_col
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != out_col]
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def project(batches):
        import pyarrow as pa

        from webscale_vector_search_spark.operators.knn import list_matrix

        P = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = list_matrix(batch, vec_col, dtype=np.float64)
            if P is None:
                P = projection_matrix(V.shape[1], out_dim, seed)
            Y = (V @ P).astype(np.float32)
            n = len(Y)
            offsets = pa.array(np.arange(0, (n + 1) * out_dim, out_dim, dtype=np.int32))
            arr = pa.ListArray.from_arrays(offsets, pa.array(Y.ravel()))
            drop = batch.schema.get_field_index(out_col) if out_col in batch.schema.names else None
            cols = [
                batch.column(i)
                for i in range(batch.num_columns)
                if i != drop
            ]
            names = [nm for i, nm in enumerate(batch.schema.names) if i != drop]
            yield pa.RecordBatch.from_arrays(
                cols + [arr], names=names + [out_col]
            )

    return df.mapInArrow(project, schema)


def projected_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    proj_dim: int = 16,
    coarse_k: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage kNN through the JL projection: coarse top-`coarse_k` in the
    projected space (scan cost proportional to proj_dim/dim), exact refine of
    only those candidates at full dimension — the same candidates-then-refine
    shape as IVFPQ serving, with the projection as the compressor.

    Recall depends on data geometry: clustered corpora (the realistic case)
    measure ~0.82 recall@10 at 64->16 dims with a 0.25% candidate fraction
    (tests/test_projection.py); isotropic random data concentrates distances
    and needs a larger coarse_k. Output: (query_id, rank, neighbor_id,
    distance) with EXACT distances — ranks are exact within the candidate set.
    """
    from webscale_vector_search_spark.operators.knn import knn_pandas, topk, with_distance

    pe = random_projection(corpus, proj_dim, seed=seed, vec_col=vec_col)
    pq = random_projection(queries, proj_dim, seed=seed, vec_col="qvec")
    coarse = knn_pandas(pe, pq, k=coarse_k, id_col=id_col, vec_col=vec_col)
    cands = coarse.select("query_id", F.col("neighbor_id").alias(id_col))
    refine = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cands), id_col)
        .join(F.broadcast(queries.select("query_id", "qvec")), "query_id")
    )
    # order_cols must name the ACTUAL id column — the ('distance','vec_id')
    # default unresolved-column-errors for any non-default id_col
    ranked = topk(
        with_distance(refine, right=vec_col), k, order_cols=("distance", id_col)
    )
    return ranked.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col(id_col).alias("neighbor_id"),
        "distance",
    )
