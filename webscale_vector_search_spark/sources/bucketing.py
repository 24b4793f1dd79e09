"""Bucketed-table layout — shuffle-free co-located joins.

At 100 TB, any join repeated against the same key (embeddings ⋈ documents on
vec_id=doc_id for filtered search, corpus ⋈ per-id feature tables) should not
re-shuffle either side per query. Bucketing pre-partitions AND pre-sorts both
tables by the join key at write time; Spark then plans a SortMergeJoin with
NO Exchange on either side (asserted in tests/test_plans.py).

This complements the index layout (partitionBy centroid_id = pruning;
bucketBy join-key = co-location). Bucketed tables live in the session
warehouse as saved tables — the metastore carries the bucket spec.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed prior write can orphan the managed location without a
    # catalog entry; clear it or saveAsTable refuses the name
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    shutil.rmtree(loc, ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed saved tables on their bucket keys. With matching
    bucket counts the planner elides both exchanges (and both sorts, when
    written sorted)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
