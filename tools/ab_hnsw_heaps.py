"""A/B receipt for the heap-loop optimization in PyHNSW beam search.

OldPyHNSW carries the PRE-change `_search_layer` / `_batch_search_layer`
verbatim (r13 session-1 form: visited bitmaps + CSR already in, bound
caching + heappushpop not). Asserts, on random corpora:

  1. construction bit-identity: old-built and new-built graphs have
     IDENTICAL links (construction runs through _search_layer);
  2. search bit-identity: knn_query labels AND distances match exactly on
     both graph forms (mutable dict-of-lists and frozen CSR), several efs,
     batch and nq=1, with and without banned nodes;
  3. paired timing, same process back-to-back (box contention cancels).
"""

import heapq
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from webscale_vector_search_spark.operators.hnsw_partition import PyHNSW
from tests.test_hnsw_kernel import _to_csr


class OldMixin:
    def _search_layer(self, q, eps, ef, level):
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
            fresh = [u for u in self._neighbors(c, level) if u not in visited]
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

    def _batch_search_layer(self, Q, eps_list, ef, level, banned=None):
        B = len(Q)
        n = len(self.V)
        vis = np.zeros((B, n), dtype=bool)
        if banned:
            ban = np.fromiter(banned, dtype=np.int64, count=len(banned))
            vis[:, ban] = True
        for i, eps in enumerate(eps_list):
            vis[i, eps] = True
        flat_q = [i for i, eps in enumerate(eps_list) for _ in eps]
        flat_u = [u for eps in eps_list for u in eps]
        D = self._pair_dists(Q, flat_q, flat_u).tolist()
        cand = [[] for _ in range(B)]
        res = [[] for _ in range(B)]
        pos = 0
        for i, eps in enumerate(eps_list):
            for u in eps:
                d = D[pos]
                pos += 1
                cand[i].append((d, u))
                res[i].append((-d, u))
            heapq.heapify(cand[i])
            heapq.heapify(res[i])
        active = list(range(B))
        heappop, heappush = heapq.heappop, heapq.heappush
        neighbors_arr = self._neighbors_arr
        while active:
            round_qi = []
            round_fresh = []
            still = []
            for i in active:
                fresh = None
                ci, ri = cand[i], res[i]
                vi = vis[i]
                while ci:
                    dc, c = heappop(ci)
                    if dc > -ri[0][0] and len(ri) >= ef:
                        ci.clear()
                        break
                    nb = neighbors_arr(c, level)
                    if nb.size:
                        f = nb[~vi[nb]]
                        if f.size:
                            fresh = f
                            break
                if fresh is None:
                    continue
                vi[fresh] = True
                round_qi.append(i)
                round_fresh.append(fresh)
                still.append(i)
            if not round_qi:
                break
            flat_u = np.concatenate(round_fresh)
            flat_q = np.repeat(
                np.asarray(round_qi, dtype=np.int64),
                [f.size for f in round_fresh],
            )
            D = self._pair_dists(Q, flat_q, flat_u).tolist()
            pos = 0
            for i, f in zip(round_qi, round_fresh):
                ci, ri = cand[i], res[i]
                for u in f.tolist():
                    du = D[pos]
                    pos += 1
                    if len(ri) < ef or du < -ri[0][0]:
                        heappush(ci, (du, u))
                        heappush(ri, (-du, u))
                        if len(ri) > ef:
                            heappop(ri)
            active = still
        if banned:
            return [
                sorted((-nd, u) for nd, u in r if u not in banned) for r in res
            ]
        return [sorted((-nd, u) for nd, u in r) for r in res]


class OldPyHNSW(OldMixin, PyHNSW):
    pass


def check(n=6000, dim=32, nq=200, seed=7):
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, dim))
    Q = rng.standard_normal((nq, dim))
    g_old = OldPyHNSW(dim, M=8, ef_construction=48, seed=3)
    g_old.add_items(V)
    g_new = PyHNSW(dim, M=8, ef_construction=48, seed=3)
    g_new.add_items(V)
    assert g_old.links == g_new.links, "construction diverged"
    assert g_old.entry == g_new.entry and g_old.max_level == g_new.max_level
    print(f"[seed {seed}] construction bit-identical ({n} nodes)")

    s_old = _to_csr(g_old)
    s_new = _to_csr(g_new)
    banned = set(rng.choice(n, size=n // 20, replace=False).tolist())
    for tag, a, b in (("mutable", g_old, g_new), ("csr", s_old, s_new)):
        for ef in (10, 48, 200):
            for ban in (None, banned):
                la, da = a.knn_query(Q, k=10, ef=ef, banned=ban)
                lb, db = b.knn_query(Q, k=10, ef=ef, banned=ban)
                assert np.array_equal(la, lb), (tag, ef, ban is not None)
                assert np.array_equal(da, db), (tag, ef, ban is not None)
            l1a, d1a = a.knn_query(Q[:1], k=10, ef=ef)
            l1b, d1b = b.knn_query(Q[:1], k=10, ef=ef)
            assert np.array_equal(l1a, l1b) and np.array_equal(d1a, d1b)
        print(f"[seed {seed}] {tag}: labels+dists bit-identical "
              f"(ef 10/48/200, banned and not, batch and nq=1)")
    return s_old, s_new, Q


def bench(s_old, s_new, Q, ef=256, reps=5):
    for tag, g in (("old", s_old), ("new", s_new)):
        g.knn_query(Q, k=10, ef=ef)  # warm l0 cache
    t = {}
    for tag, g in (("old", s_old), ("new", s_new), ("old", s_old), ("new", s_new)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            g.knn_query(Q, k=10, ef=ef)
            best = min(best, time.perf_counter() - t0)
        t[tag] = min(t.get(tag, float("inf")), best)
    print(f"paired min-of-{reps}x2 at ef={ef}: old {t['old']:.3f}s "
          f"new {t['new']:.3f}s  ({t['old'] / t['new']:.2f}x)")


if __name__ == "__main__":
    for seed in (7, 11):
        s_old, s_new, Q = check(seed=seed)
    # timing on a bigger graph, serving shape
    rng = np.random.default_rng(0)
    V = rng.standard_normal((30000, 64))
    Q = rng.standard_normal((500, 64))
    g_old = OldPyHNSW(64, M=16, ef_construction=64, seed=0)
    t0 = time.perf_counter()
    g_old.add_items(V)
    t_old_build = time.perf_counter() - t0
    g_new = PyHNSW(64, M=16, ef_construction=64, seed=0)
    t0 = time.perf_counter()
    g_new.add_items(V)
    t_new_build = time.perf_counter() - t0
    assert g_old.links == g_new.links, "construction diverged (30k)"
    print(f"build 30k: old {t_old_build:.1f}s new {t_new_build:.1f}s "
          f"({t_old_build / t_new_build:.2f}x)")
    bench(_to_csr(g_old), _to_csr(g_new), Q, ef=256)
    bench(_to_csr(g_old), _to_csr(g_new), Q, ef=64)
