"""Deterministic sampling / data-mixing operators (training-data pipeline).

No reference analog (the reference is a serving system); these are the
north-star LLM-pipeline operators alongside dedup (SURVEY.md §2.8): every
real pretraining corpus is assembled by *mixing* heterogeneous sources at
target rates, and the mixing must be deterministic (reproducible runs,
stable held-out splits) — so rates are enforced with a hash threshold on
the stable document id, never rand().

Scale posture: both operators are a single map-side filter — no shuffle, no
sampling state, no driver coordination. At 100 TB the filter is pushed into
the scan task; changing the mix re-runs a pure map job.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscale_vector_search_spark.functions.hashing import det_hash, det_hash_sql

# hash-threshold denominator: rates are expressed in basis points (1/10000),
# enough resolution for any practical mix while keeping the threshold exact
# integer arithmetic in every engine
RATE_DENOM = 10_000


def _thresholds(weights: dict[str, float], stratum_col: str) -> Column:
    """CASE stratum WHEN s THEN round(w*denom) ... ELSE 0 — unlisted strata
    are dropped (weight 0), the conservative default for a curated mix."""
    return reduce(
        lambda acc, kv: F.when(F.col(stratum_col) == kv[0], F.lit(kv[1])).otherwise(acc),
        [(s, int(round(w * RATE_DENOM))) for s, w in sorted(weights.items())],
        F.lit(0),
    )


def stratified_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep each row of stratum s with probability weights[s], deterministically:
    kept iff det_hash(id, seed) % 10000 < round(weights[s] * 10000).

    The same id always makes the same draw (stable across runs, partitions
    and cluster sizes), distinct seeds give independent draws (disjoint
    pipelines can sample independently), and the kept set for a smaller
    weight is a SUBSET of the kept set for a larger one — turning the mix
    knob down never resurrects different rows.
    """
    thr = _thresholds(weights, stratum_col)
    return df.filter((det_hash(F.col(id_col), seed) % RATE_DENOM) < thr)


def stratified_sample_sql(
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """The WHERE predicate of :func:`stratified_sample` as ANSI SQL text
    (oracle twin — det_hash_sql is engine-portable)."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(w * RATE_DENOM))}" for s, w in sorted(weights.items())
    )
    return (
        f"(({det_hash_sql(id_col, seed)}) % {RATE_DENOM}) < "
        f"(CASE {stratum_col} {cases} ELSE 0 END)"
    )


def holdout_split(
    df: DataFrame,
    holdout_rate: float = 0.01,
    id_col: str = "doc_id",
    seed: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) — the deterministic complement pair of the same hash
    draw, so the two sides are disjoint and exhaustive by construction."""
    thr = int(round(holdout_rate * RATE_DENOM))
    draw = det_hash(F.col(id_col), seed) % RATE_DENOM
    return df.filter(draw >= thr), df.filter(draw < thr)
