"""Optional per-partition HNSW (SURVEY.md §7.4 — non-core, import-gated).

The engine's HNSW *capability* ships as IVF + high-recall probing
(plans/build.py, index_type="HNSW"); graph ANN itself is sequential
pointer-chasing with no idiomatic DataFrame form. This module is the
declared escape hatch for deployments that install `hnswlib`: build one
small HNSW graph per shard partition inside mapInPandas (each graph fits a
task), search shard-parallel, merge with the standard K3 window. It is NOT
oracle-checked and NOT part of the declared query set.

Without hnswlib installed (this container), the entry point raises with a
clear message — the plumbing contract (schemas, partition flow) is what the
engine owns; the graph library is a deployment choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where hnswlib is installed
    import hnswlib  # type: ignore

    HAS_HNSWLIB = True
except ImportError:
    hnswlib = None
    HAS_HNSWLIB = False


def hnsw_partition_search(
    corpus_sharded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 32,  # reference build params (vector_search_cluster.py:1044-1045)
    ef_construction: int = 64,
    ef_search: int = 64,  # reference serving param (552)
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-shard HNSW build+search inside one mapInPandas pass, then the K2/K3
    partial/final merge. Requires `hnswlib`."""
    if not HAS_HNSWLIB:
        raise NotImplementedError(
            "hnswlib is not installed in this environment; the engine's HNSW "
            "capability is served by IVF high-recall probing "
            "(build_index(index_type='HNSW')). Install hnswlib to enable the "
            "per-partition graph path."
        )

    import numpy as np
    import pandas as pd

    q_rows = queries.select("query_id", "qvec").collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.stack([r["qvec"] for r in q_rows]).astype(np.float32)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            ids = pdf[id_col].to_numpy()
            index = hnswlib.Index(space="l2", dim=V.shape[1])
            index.init_index(max_elements=len(V), M=m, ef_construction=ef_construction)
            index.add_items(V, np.arange(len(V)))
            index.set_ef(max(ef_search, k))
            labels, dists = index.knn_query(Q, k=min(k, len(V)))
            nq, kk = labels.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, kk),
                    "vec_id": ids[labels.ravel()],
                    "distance": np.round(dists.ravel().astype(np.float64), 6),
                }
            )

    from pyspark.sql import functions as F

    from webscale_vector_search_spark.operators.knn import topk

    partial = corpus_sharded.select(id_col, vec_col).mapInPandas(scan, out_schema)
    ranked = topk(partial, k)
    return ranked.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").alias("neighbor_id"),
        "distance",
    )
