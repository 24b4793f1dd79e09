"""Sharding / partitioning operators (P1-P3, SURVEY.md §2.2).

Reference behaviors re-expressed:
- P1 random shuffle before splitting (np.random.shuffle, unseeded,
  vector_search_cluster.py:1002) -> seeded hash ordering.
- P2 contiguous range split with remainder spread (1005-1015) -> ntile window.
- P3 content-hash sharding (1200-1212 — broken float modulo, quirk Q2) ->
  deterministic id hash, the *intent* of the reference code.

All three are pure column expressions; the physical placement step is
``repartition(n, 'shard_id')`` / ``write.partitionBy('shard_id')`` which at
100 TB gives partition-pruned scans per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webscale_vector_search_spark.functions.hashing import det_hash, pmod_shard


def seeded_shuffle_key(id_col: str = "vec_id", seed: int = 42) -> F.Column:
    """P1 — deterministic stand-in for np.random.shuffle: order by seeded hash."""
    return det_hash(F.col(id_col), seed)


def range_split(
    df: DataFrame, num_shards: int, id_col: str = "vec_id", seed: int = 42, out: str = "shard_id"
) -> DataFrame:
    """P2 — even contiguous split after a seeded shuffle.

    ntile(n) over the shuffled order reproduces the reference's
    remainder-spread-over-first-shards fill (1005-1015) exactly: the first
    ``N % n`` shards get one extra row.

    SCALE CAVEAT: exact ntile requires a global total order — one
    unpartitioned window, i.e. a single-task sort (the reference's own P2 is
    likewise whole-corpus-on-one-node). Use :func:`hash_shard` as the
    at-scale default; range_split exists for reference-semantics parity and
    is oracle-checked on bounded data.
    """
    w = Window.orderBy(seeded_shuffle_key(id_col, seed).asc(), F.col(id_col).asc())
    return df.withColumn(out, (F.ntile(num_shards).over(w) - 1).cast("int"))


def hash_shard(
    df: DataFrame, num_shards: int, id_col: str = "vec_id", seed: int = 0, out: str = "shard_id"
) -> DataFrame:
    """P3 (fixed form) — stable content-independent shard assignment by id hash."""
    return df.withColumn(out, pmod_shard(F.col(id_col), num_shards, seed))


def apply_sharding(
    df: DataFrame, num_shards: int, strategy: str = "hash", id_col: str = "vec_id", seed: int = 42
) -> DataFrame:
    if strategy == "hash":
        return hash_shard(df, num_shards, id_col=id_col)
    if strategy == "range":
        return range_split(df, num_shards, id_col=id_col, seed=seed)
    raise ValueError(f"unknown sharding strategy {strategy!r}")


def salted_count(df: DataFrame, group_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    A hot key (one group holding a large share of 100 TB) turns a plain
    groupBy into a single overloaded reducer. Salting spreads each key over
    `salt_buckets` partial groups (stage 1: groupBy(key, salt)), then merges
    the bounded partials (stage 2: groupBy(key)) — the classic skew-join/agg
    pattern, complementary to AQE's runtime skew splitting (enabled in
    session.py). The salt derives from spark_partition_id, so stage 1's
    partials combine map-side within each task.
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % F.lit(salt_buckets))
    partial = salted.groupBy(*group_cols, "_salt").agg(F.count("*").alias("_partial_n"))
    return partial.groupBy(*group_cols).agg(F.sum("_partial_n").alias("n"))
