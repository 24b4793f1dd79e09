"""Profile the PyHNSW batch beam kernel at shard scale, no Spark.

Builds one shard-sized graph (default 62.5k nodes, dim 64, M=16 — the 1M
bench tier's shard shape), freezes it to the CSR serving form, then
cProfiles `knn_query` over a serving-sized batch at the curve-default ef.

Usage: python tools/profile_hnsw_kernel.py [n] [nq] [ef]
"""

import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from webscale_vector_search_spark.operators.hnsw_partition import PyHNSW
from tests.test_hnsw_kernel import _to_csr  # the frozen-bundle decode twin


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 62500
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    ef = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 64))
    Q = rng.standard_normal((nq, 64))
    t0 = time.perf_counter()
    g = PyHNSW(64, M=16, ef_construction=64, seed=0)
    g.add_items(V)
    print(f"build {n} nodes: {time.perf_counter() - t0:.1f}s", flush=True)
    s = _to_csr(g)
    # warm the searched working set (page-in, l0 cache)
    s.knn_query(Q[:64], k=10, ef=ef)
    t0 = time.perf_counter()
    s.knn_query(Q, k=10, ef=ef)
    wall = time.perf_counter() - t0
    print(f"knn_query nq={nq} ef={ef}: {wall:.3f}s "
          f"({wall / nq * 1e3:.3f} ms/q)", flush=True)
    pr = cProfile.Profile()
    pr.enable()
    s.knn_query(Q, k=10, ef=ef)
    pr.disable()
    out = io.StringIO()
    pstats.Stats(pr, stream=out).sort_stats("cumulative").print_stats(25)
    print(out.getvalue())


if __name__ == "__main__":
    main()
