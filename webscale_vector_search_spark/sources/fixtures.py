"""Fixture table sources (S1/S6 in SURVEY.md §2.1).

The reference's corpus source is a single eagerly-loaded ``.npy``
(vector_search_cluster.py:995) — whole corpus in driver RAM. Here every source
is a lazy partitioned Parquet scan; at 100 TB the scan parallelizes over
``spark.sql.files.maxPartitionBytes``-sized splits and Catalyst pushes
filters/column pruning into the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscale_vector_search_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    # Declared-query semantics REQUIRE UTC: date_trunc/window and timestamp
    # literals resolve in the session timezone, and the caller's session
    # (e.g. the driver's) may default elsewhere — which would shift every
    # event-time result off the (timezone-naive) DuckDB oracle.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which the Spark reader rejects
    (only DuckDB reads it natively). Read nanos as LONG via the legacy conf,
    then convert with integer arithmetic — `ts div 1000` stays in BIGINT, so
    no double-precision loss at 1.7e18-nanosecond magnitudes."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # A caller-owned session (e.g. the correctness driver's) may have
        # parquet NTZ inference on; watermarks/unix_micros reject NTZ, so
        # normalize to TIMESTAMP (session tz is forced to UTC above, making
        # the cast a wall-clock identity).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def queries_from_embeddings(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, n: int = 20
) -> DataFrame:
    """The Q20 derived fixture (FIXTURES.md): first ``n`` embeddings as a
    query batch ``(query_id, qvec)``. Self-querying makes rank-1 the vector
    itself at distance 0 — a built-in sanity invariant.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
