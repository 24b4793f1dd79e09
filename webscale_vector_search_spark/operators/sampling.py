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

from webscale_vector_search_spark.functions.hashing import det_hash

# hash-threshold denominator: rates are expressed in basis points (1/10000),
# enough resolution for any practical mix while keeping the threshold exact
# integer arithmetic in every engine
RATE_DENOM = 10_000


def sample_draw(id_col: Column, seed: int = 0) -> Column:
    """Portable 60-bit draw over (id, seed): md5 of "id:seed", first 15 hex
    chars as BIGINT — the same dual-engine pattern as
    dedup.simhash_feature_hashes. md5's avalanche makes draws at DIFFERENT
    seeds genuinely independent; the affine det_hash cannot provide that
    (its draw at seed s2 is the seed-s1 draw plus a constant — measured 0%
    overlap between two 10% samples where ~1% is expected — and a
    seed-dependent multiplier still leaves LCG lattice correlation on
    consecutive ids). det_hash remains the SHARDING hash (layout-pinned,
    cheap); sampling uses this draw."""
    s = F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("bigint")


def sample_draw_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB oracle twin of :func:`sample_draw` (bit-identical values)."""
    return (
        f"CAST(CAST('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || ':{seed}'),"
        f" 1, 15) AS UBIGINT) AS BIGINT)"
    )


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
    kept iff sample_draw(id, seed) % 10000 < round(weights[s] * 10000).

    The same id always makes the same draw (stable across runs, partitions
    and cluster sizes), distinct seeds give independent draws (disjoint
    pipelines can sample independently), and the kept set for a smaller
    weight is a SUBSET of the kept set for a larger one — turning the mix
    knob down never resurrects different rows.
    """
    thr = _thresholds(weights, stratum_col)
    return df.filter((sample_draw(F.col(id_col), seed) % RATE_DENOM) < thr)


def stratified_sample_sql(
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """The WHERE predicate of :func:`stratified_sample` as ANSI SQL text
    (oracle twin — sample_draw_sql is engine-portable)."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(w * RATE_DENOM))}" for s, w in sorted(weights.items())
    )
    return (
        f"(({sample_draw_sql(id_col, seed)}) % {RATE_DENOM}) < "
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
    draw = sample_draw(F.col(id_col), seed) % RATE_DENOM
    return df.filter(draw >= thr), df.filter(draw < thr)


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 2048,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end to end in token
    space and cut fixed ctx_len training sequences — the standard pretraining
    batch-assembly step (every doc lands at a deterministic token offset;
    sequences are chunks of the concatenated stream).

    A single global stream would serialize on one ordered window (a global
    sort — dead at 100 TB), so packing is per-shard, the way production
    pipelines run one packer per output file: docs hash to num_shards
    deterministic shards (det_hash — reproducible, engine-portable), and the
    running token offset is a cumulative window sum WITHIN each shard,
    ordered by doc id. The only exchange is the hash partition by shard;
    each shard's stream is independent, so shards scale horizontally and a
    re-run reproduces byte-identical placement.

    Returns one row per doc: (doc_id, shard, n_tokens, start_offset,
    seq_id, seq_pos, crosses_boundary) where seq_id = start_offset / ctx_len
    and crosses_boundary marks docs split across two training sequences.
    """
    from pyspark.sql import Window

    # coalesce: a NULL text would make n_tokens NULL, the window sum would
    # skip it, and every downstream offset/seq_id for that doc would be
    # silently NULL — NULL docs pack like empty docs (1 phantom token,
    # split('')=['']), deterministic on both engines (oracle matches)
    toks = F.size(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "))
    sharded = docs.select(
        F.col(id_col),
        (det_hash(F.col(id_col)) % num_shards).cast("int").alias("shard"),
        toks.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_end = sharded.withColumn("_end", F.sum("n_tokens").over(w))
    # integer `div`, not float division + cast: exact at any stream offset
    return with_end.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("_end") - F.col("n_tokens")).alias("start_offset"),
        F.expr(f"(_end - n_tokens) div {ctx_len}").alias("seq_id"),
        ((F.col("_end") - F.col("n_tokens")) % ctx_len).alias("seq_pos"),
        (
            F.expr(f"(_end - 1) div {ctx_len}")
            > F.expr(f"(_end - n_tokens) div {ctx_len}")
        ).alias("crosses_boundary"),
    )
