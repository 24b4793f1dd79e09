"""The t2 gate, locally: every declared query hash-matches DuckDB at sf0.001.

(The driver runs the same comparison at sf0.01; sf0.001 keeps the suite fast.
tools/check_oracle.py runs the full sf0.01 sweep on demand.)
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.queries import ORACLE_SQL, QUERIES
from webscale_vector_search_spark.testing import compare, duckdb_connection

ORACLE_NAMES = sorted(ORACLE_SQL)


@pytest.fixture(scope="module")
def duck_smoke():
    return duckdb_connection(SF_SMOKE)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck_smoke, name):
    res = compare(name, QUERIES[name](spark, SF_SMOKE), duck_smoke, ORACLE_SQL[name])
    assert res.ok, str(res)
    assert res.spark_rows > 0, f"{name} returned no rows"


def test_all_queries_have_callables(spark):
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_query_count_within_driver_cap():
    """The correctness driver records at most 50 queries() entries,
    truncated in declaration order (observed: r2 and r3 both declared 51
    and got exactly 50 CORRECTNESS rows, dropping the newest operator).
    Adding a 51st query silently removes the last one from the driver's
    gate — merge variants (like q_ann_ivf's L2+cosine union) instead."""
    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} declared queries exceeds the driver's 50-row cap; "
        "the excess get NO correctness signal"
    )
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_bench_idx_cache_dir_tracks_build_config():
    """The bench's per-index cache dir must change when ANY build knob
    changes (the staleness trap: the build-exists check can't see config
    drift inside a written artifact, so the config hash in the dir name is
    the only rebuild trigger)."""
    import bench
    from webscale_vector_search_spark.config import EngineConfig

    base = EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=64)
    a = bench._idx_cache_dir("/tmp/x", "IVFPQ", base, 100)
    same = bench._idx_cache_dir("/tmp/x", "IVFPQ", EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=64), 100)
    assert a == same  # deterministic for an identical config
    for variant in (
        EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=32),
        EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=64, pq_bits=10),
        EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=64, centroid_polish_iters=2),
        EngineConfig(index_type="IVFPQ", nlist=500, pq_m=64),
        EngineConfig(index_type="IVFPQ", nlist=1000, pq_m=64, seed=7),
    ):
        assert bench._idx_cache_dir("/tmp/x", "IVFPQ", variant, 100) != a, variant
