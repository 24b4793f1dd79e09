from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from webscale_vector_search_spark.session import get_spark

    spark = get_spark("wvss-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from webscale_vector_search_spark.testing import duckdb_connection

    return duckdb_connection(SF_ORACLE)
