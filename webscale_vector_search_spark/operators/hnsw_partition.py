"""K9 — per-partition HNSW graph search (SURVEY.md §7 hard part (a)).

Graph ANN is sequential pointer-chasing with no idiomatic DataFrame form,
so the Spark-first decomposition is: build ONE small graph per partition
inside a mapInPandas pass (each graph fits a task), search shard-parallel,
merge with the standard K2/K3 partial/final rank window — the same shape as
every other search in this engine.

Reference behavior matched: IndexHNSWFlat(d, 32) build
(vector_search_cluster.py:1043-1045), efSearch serving param (551-552); the
README claims 99%+ recall@10 at sub-linear cost — the cost class this
module restores (the r1 "HNSW slot" probed 3/4 of IVF lists: high recall at
~75% of an exact scan).

Two interchangeable graph backends:
- `hnswlib` when installed (C++, the production path);
- :class:`PyHNSW`, a self-contained numpy implementation of the
  Malkov & Yashunin algorithm (IEEE TPAMI 2018) — always available, used by
  tests to assert BOTH recall AND the sub-linear visit count (it counts
  distance evaluations, which hnswlib does not expose).

Determinism: level draws come from a fixed-seed RNG in insertion order, and
parquet scans enumerate rows deterministically, so repeated runs build the
same graph.
"""

from __future__ import annotations

import heapq
import math
import random

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where hnswlib is installed
    import hnswlib  # type: ignore

    HAS_HNSWLIB = True
except ImportError:
    hnswlib = None
    HAS_HNSWLIB = False


class PyHNSW:
    """Hierarchical Navigable Small World graph, pure python/numpy.

    Faithful to Malkov & Yashunin: geometric level assignment
    (floor(-ln(U) * 1/ln(M))), greedy descent through upper layers, beam
    search (ef candidates) at each build/query layer, bidirectional links
    shrunk to M (2M at layer 0). Neighbor distance evaluations are batched
    through numpy per expanded node.

    `dist_evals` counts every vector-distance computation — the test hook
    for the sub-linear cost-class assertion (evals/query must stay far
    below corpus size and roughly flat as the corpus grows).
    """

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 64, seed: int = 42):
        self.dim = dim
        self.M = M
        self.M0 = 2 * M
        self.ef_construction = max(ef_construction, M)
        self.mult = 1.0 / math.log(M)
        self.rng = random.Random(seed)
        self.V: np.ndarray | None = None
        self.links: list[dict[int, list[int]]] = []  # node -> level -> neighbor ids
        self.entry = -1
        self.max_level = -1
        self.dist_evals = 0

    # -- internals ---------------------------------------------------------

    def _dists(self, q: np.ndarray, ids: list[int]) -> np.ndarray:
        arr = self.V[ids]
        diff = arr - q
        self.dist_evals += len(ids)
        return np.einsum("ij,ij->i", diff, diff)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, level: int):
        """Beam search within one layer; returns ascending [(dist, id), ...]."""
        visited = set(eps)
        d = self._dists(q, eps)
        cand = [(d[i], eps[i]) for i in range(len(eps))]
        heapq.heapify(cand)
        res = [(-d[i], eps[i]) for i in range(len(eps))]
        heapq.heapify(res)
        while cand:
            dc, c = heapq.heappop(cand)
            if dc > -res[0][0] and len(res) >= ef:
                break
            fresh = [u for u in self.links[c].get(level, ()) if u not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            nd = self._dists(q, fresh)
            for du, u in zip(nd, fresh):
                if len(res) < ef or du < -res[0][0]:
                    heapq.heappush(cand, (du, u))
                    heapq.heappush(res, (-du, u))
                    if len(res) > ef:
                        heapq.heappop(res)
        return sorted((-nd, u) for nd, u in res)

    def _insert(self, idx: int) -> None:
        q = self.V[idx]
        level = int(-math.log(max(self.rng.random(), 1e-300)) * self.mult)
        self.links.append({lc: [] for lc in range(level + 1)})
        if self.entry < 0:
            self.entry, self.max_level = idx, level
            return
        ep = [self.entry]
        for lc in range(self.max_level, level, -1):
            ep = [self._search_layer(q, ep, 1, lc)[0][1]]
        for lc in range(min(level, self.max_level), -1, -1):
            cands = self._search_layer(q, ep, self.ef_construction, lc)
            mmax = self.M0 if lc == 0 else self.M
            sel = [u for _, u in cands[: self.M]]
            self.links[idx][lc] = list(sel)
            for u in sel:
                lu = self.links[u][lc]
                lu.append(idx)
                if len(lu) > mmax:  # shrink to the mmax closest of u
                    du = self._dists(self.V[u], lu)
                    order = np.argsort(du, kind="stable")[:mmax]
                    self.links[u][lc] = [lu[j] for j in order]
            ep = [u for _, u in cands]
        if level > self.max_level:
            self.entry, self.max_level = idx, level

    # -- hnswlib-compatible surface ---------------------------------------

    def add_items(self, V: np.ndarray) -> None:
        V = np.asarray(V, dtype=np.float64)
        start = 0 if self.V is None else len(self.V)
        self.V = V if self.V is None else np.vstack([self.V, V])
        for i in range(len(V)):
            self._insert(start + i)

    def knn_query(self, Q: np.ndarray, k: int, ef: int = 64):
        """Top-k (squared-L2, the engine's canonical metric) per query row.

        Returns (labels, dists) shaped (nq, k) like hnswlib.knn_query.
        """
        Q = np.asarray(Q, dtype=np.float64)
        ef = max(ef, k)
        labels = np.empty((len(Q), k), dtype=np.int64)
        dists = np.empty((len(Q), k), dtype=np.float64)
        for qi, q in enumerate(Q):
            ep = [self.entry]
            for lc in range(self.max_level, 0, -1):
                ep = [self._search_layer(q, ep, 1, lc)[0][1]]
            res = self._search_layer(q, ep, ef, 0)[:k]
            labels[qi] = [u for _, u in res]
            dists[qi] = [d for d, _ in res]
        return labels, dists


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
    """Per-partition HNSW build+search inside one mapInPandas pass, then the
    K2/K3 partial/final merge. Uses hnswlib when installed, else PyHNSW —
    same graph algorithm, same result contract."""
    import pandas as pd

    q_rows = queries.select("query_id", "qvec").collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.stack([r["qvec"] for r in q_rows]).astype(np.float64)

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
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            kk = min(k, len(V))
            if HAS_HNSWLIB:  # pragma: no cover - lib absent in this container
                index = hnswlib.Index(space="l2", dim=V.shape[1])
                index.init_index(max_elements=len(V), M=m, ef_construction=ef_construction)
                index.add_items(V.astype(np.float32), np.arange(len(V)))
                index.set_ef(max(ef_search, kk))
                labels, dists = index.knn_query(Q.astype(np.float32), k=kk)
            else:
                index = PyHNSW(V.shape[1], M=m, ef_construction=ef_construction)
                index.add_items(V)
                labels, dists = index.knn_query(Q, k=kk, ef=max(ef_search, kk))
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
