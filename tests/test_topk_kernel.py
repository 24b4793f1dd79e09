"""Parity pins for the shared batch top-k kernel (operators/knn.py).

batch_topk_rows is the ONE tie-stable top-k every numpy kernel shares
(FLAT scan, IVF per-list, PQ ADC, serve_local, recall-curve ground truth).
r13 replaces its per-query lexsort loop with a single flat lexsort keyed
(query-row, rounded distance, vec_id) — these tests pin the output against
an inline reference implementation of the pre-r13 per-query loop across
the shapes the engine actually produces (big FLAT batches, few-queries
IVF cells, nq=1 serving, NaN rows, boundary ties, n < k + tie_margin).
"""

from __future__ import annotations

import numpy as np
import pytest

from webscale_vector_search_spark.operators.knn import batch_topk_rows


def _reference_loop(dist, ids, q_ids, k, tie_margin=64):
    """The pre-r13 per-query form, verbatim semantics."""
    nq, n = dist.shape
    keep = min(k + tie_margin, n)
    part = (
        np.argpartition(dist, keep - 1, axis=1)[:, :keep]
        if keep < n
        else np.broadcast_to(np.arange(n), (nq, n)).copy()
    )
    d = np.round(np.take_along_axis(dist, part, axis=1), 6)
    out_q, out_i, out_d = [], [], []
    take = min(k, keep)
    for qi in range(nq):
        cand_ids = ids[part[qi]]
        order = np.lexsort((cand_ids, d[qi]))[:take]
        sel = np.isfinite(d[qi][order])
        out_q.append(np.full(sel.sum(), q_ids[qi], dtype=np.int64))
        out_i.append(cand_ids[order][sel])
        out_d.append(d[qi][order][sel])
    return {
        "query_id": np.concatenate(out_q),
        "vec_id": np.concatenate(out_i),
        "distance": np.concatenate(out_d),
    }


def _assert_same(a, b):
    for key in ("query_id", "vec_id", "distance"):
        assert np.array_equal(a[key], b[key]), key


@pytest.mark.parametrize(
    "nq,n",
    [
        (1, 300),      # serve_local single-query
        (4, 50),       # IVF cell smaller than k + tie_margin
        (64, 1000),    # recall-curve profiling shape
        (200, 316),    # 10M-tier probed cell
        (1000, 10000), # 1M FLAT Arrow batch
    ],
)
def test_topk_parity_shapes(nq, n):
    rng = np.random.default_rng(nq * 100003 + n)
    dist = rng.random((nq, n))
    ids = rng.permutation(n).astype(np.int64) * 7 + 3
    q_ids = np.arange(nq, dtype=np.int64) + 1_000
    _assert_same(
        _reference_loop(dist, ids, q_ids, 10), batch_topk_rows(dist, ids, q_ids, 10)
    )


def test_topk_parity_ties_and_nan():
    rng = np.random.default_rng(7)
    nq, n = 50, 500
    dist = rng.integers(0, 8, (nq, n)).astype(np.float64) * 1e-6  # dense ties
    dist[5, :] = np.nan            # all-NaN query emits zero rows
    dist[9, ::2] = np.inf          # +inf is non-finite: filtered
    ids = rng.permutation(n).astype(np.int64)
    q_ids = np.arange(nq, dtype=np.int64)
    ref = _reference_loop(dist, ids, q_ids, 10)
    new = batch_topk_rows(dist, ids, q_ids, 10)
    _assert_same(ref, new)
    assert not np.any(new["query_id"] == 5)


def test_topk_rounding_boundary_order():
    """Ordering follows ROUNDED distance then vec_id — two raw distances
    that round equal must tie-break by id, not raw value."""
    dist = np.array([[0.123456421, 0.123456489, 0.5]])  # both round to 0.123456
    ids = np.array([9, 2, 1], dtype=np.int64)
    q_ids = np.array([0], dtype=np.int64)
    ref = _reference_loop(dist, ids, q_ids, 2)
    new = batch_topk_rows(dist, ids, q_ids, 2)
    _assert_same(ref, new)
    # id 2's raw distance is LARGER but rounds equal -> id tie-break wins
    assert new["vec_id"].tolist() == [2, 9]
