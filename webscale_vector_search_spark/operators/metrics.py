"""Metrics aggregations (A1-A7, SURVEY.md §2.4).

The reference keeps driver-side counters and a rolling list of the last 1000
latencies, computing p50/p95/p99 by sorted-index (vector_search_cluster.py:
418-425: ``sorted[n//2]``, ``sorted[int(n*.95)]``, ``sorted[int(n*.99)]``).
Re-expressed relationally:

- counters -> count / count_if aggregates (A1, A4, A5)
- mean     -> exact-DECIMAL sum / count (A2; order-independent, oracle-safe)
- percentiles -> the reference's exact nearest-rank semantics via a rank
  window (A3) — deliberately NOT percentile_approx, so results hash-match any
  engine; at 100 TB swap in percentile_approx (documented trade, §2.6 T3)
- sliding retention -> row_number() <= N over ts desc (A6)

The rank-window percentile shuffles once on the group key; the group sizes
here are metric streams (bounded), not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nearest_rank_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact percentiles with the reference's 0-indexed sorted-list semantics:
    percentile p of n values = sorted[int(n * p)] (p50 uses n // 2 == int(n*0.5)).

    Output: one row per group with count, avg (exact-decimal), p_50/p_95/p_99.
    """
    # nulls-last, like the DuckDB twin's ASC: a NULL value must not take
    # rank 1 and shift every real value's percentile rank (same divergence
    # guard as operators.knn.topk)
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc_nulls_last(), F.col(tie_col).asc_nulls_last()
    )
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(group_col))
    )
    agg_cols = [
        F.max("_n").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double") / F.max("_n"), 6
        ).alias("avg_value"),
    ]
    for p in percentiles:
        label = f"p{int(round(p * 100))}"
        # 0-indexed sorted[int(n*p)] -> 1-indexed rank floor(n*p) + 1
        agg_cols.append(
            F.max(
                F.when(
                    F.col("_rn") == (F.floor(F.col("_n") * F.lit(p)) + 1), F.col(value_col)
                )
            ).alias(label)
        )
    return ranked.groupBy(group_col).agg(*agg_cols)


def nearest_rank_percentiles_sql(
    source: str,
    group_col: str,
    value_col: str,
    tie_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB twin of :func:`nearest_rank_percentiles` (same column names)."""
    pct_cols = ",\n       ".join(
        f"max(CASE WHEN _rn = floor(_n * {p}) + 1 THEN {value_col} END) AS p{int(round(p * 100))}"
        for p in percentiles
    )
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col} ASC, {tie_col} ASC) AS _rn,
         count(*) OVER (PARTITION BY {group_col}) AS _n
  FROM {source}
)
SELECT {group_col},
       max(_n) AS n_events,
       round(CAST(sum(CAST({value_col} AS DECIMAL(18,6))) AS DOUBLE) / max(_n), 6) AS avg_value,
       {pct_cols}
FROM ranked
GROUP BY {group_col}
ORDER BY {group_col}
"""


def retain_last_n(df: DataFrame, group_col: str, ts_col: str, tie_col: str, n: int) -> DataFrame:
    """A6 — the reference's last-1000-samples retention (240-241, 601-603),
    as a deterministic recency window per group."""
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col).desc(), F.col(tie_col).desc())
    return df.withColumn("_recency", F.row_number().over(w)).filter(F.col("_recency") <= n).drop(
        "_recency"
    )


def shard_histogram(df: DataFrame, shard_col: str = "shard_id") -> DataFrame:
    """A7 — vectors per shard plus grand total via rollup (reference sums
    index.ntotal per shard, 1220-1223)."""
    # F.grouping, not isNull: a genuine NULL-valued shard group would
    # otherwise be indistinguishable from the rollup's grand-total row
    return df.rollup(shard_col).agg(
        F.count("*").alias("n_vectors"),
        (F.grouping(shard_col) == 1).alias("is_total"),
    )


def export_json(df: DataFrame, id_cols: tuple[str, ...] = ()) -> DataFrame:
    """E5 (encode side) — serialize each row as a JSON document next to its
    id columns: the result-sink shape for systems consuming JSON payloads
    (the reference's response bodies, 353-359)."""
    payload_cols = [c for c in df.columns if c not in id_cols]
    return df.select(
        *id_cols, F.to_json(F.struct(*payload_cols)).alias("payload_json")
    )
