"""Attribute-value statistics sidecar — the filtered-search planner input.

Filtered ANN has a recall trap: a predicate of selectivity `s` thins every
probed inverted list to ~s of its usual candidates, so a fixed nprobe
measured 0.32 recall at s=0.1 where the unfiltered search measures ~1.0
(BENCH_DETAIL r9 `ann_filtered`). The fix is planner-shaped, not
kernel-shaped: estimate `s` and scale the probe budget ~1/s (the classic
selectivity→cardinality step a SQL optimizer does from table statistics).

At build time, `write_attr_stats` records the exact per-combination row
counts of the declared attr_cols — bounded at MAX_COMBOS combinations
(beyond that the table is skipped and search falls back to the fixed
defaults; attribute filters over near-unique columns should use
`allowed_ids`, whose cardinality is known without statistics). The table
is tiny (≤ MAX_COMBOS rows), lives beside the index, and is maintained as
deltas by append/upsert/compaction — approximate between maintenance
operations is fine: it feeds a probe-budget heuristic, not correctness.

Both search paths read the SAME numbers, so the auto-scaled nprobe /
oversample is identical on the Spark path (SQL-string predicate, evaluated
by Spark against the stats rows) and the serve_local path (vectorized
callable, evaluated by numpy against the same rows) — the bit-identity
contract between the two paths extends to their planning.

Reference parity note: FAISS's IDSelector has no planner — the reference
(vector_search_cluster.py) exposes no filtered search at all; this is
§2.9 extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIRNAME = "attr_stats"
MAX_COMBOS = 10_000
# auto filter_oversample clamp for graph post-filtering: below 4 the
# oversample buys nothing, above 32 the widened beam's cost approaches a
# probed-scan's — heavy filters should run on IVF (docs/SCALE.md)
OVERSAMPLE_FLOOR, OVERSAMPLE_CAP = 4, 32


def write_attr_stats(base: DataFrame, attr_cols: list, out_dir: str) -> bool:
    """One map-side-combined aggregation over the corpus -> the per-combo
    count table. Skipped (returns False) when the attribute domain exceeds
    MAX_COMBOS combinations — a stats table that large stops being a
    broadcast-trivial planner input."""
    counts = base.groupBy(*attr_cols).agg(F.count(F.lit(1)).alias("count"))
    if counts.limit(MAX_COMBOS + 1).count() > MAX_COMBOS:
        return False
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, STATS_DIRNAME)
    )
    return True


def merge_attr_delta(spark: SparkSession, index_dir: str, delta: DataFrame) -> None:
    """Fold a (attr_cols..., count) delta — counts may be negative for
    removals — into the stats table. Driver-cheap: the table is ≤
    MAX_COMBOS rows. The rewrite goes through a temp dir + rename; a crash
    in the window just loses the stats table, and search degrades to the
    fixed defaults (never a wrong answer)."""
    import shutil

    path = os.path.join(index_dir, STATS_DIRNAME)
    if not os.path.isdir(path):
        return
    cur = spark.read.parquet(path)
    attr_cols = [c for c in cur.columns if c != "count"]
    merged = (
        cur.unionByName(delta.select(*cur.columns))
        .groupBy(*attr_cols)
        .agg(F.sum("count").alias("count"))
        .filter(F.col("count") > 0)
    )
    tmp = path + ".rewrite"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


def ensure_attr_stats(spark: SparkSession, index_dir: str) -> bool:
    """Backfill the stats table for an attr_cols index built before the
    planner existed (pre-r10 artifact): recompute from the stored rows
    (row-carried attrs, or the attrs sidecar for graph indexes). No-op
    when stats already exist or the index has no attributes. Returns True
    when a stats table exists afterwards."""
    from webscale_vector_search_spark.sources import index_io

    path = os.path.join(index_dir, STATS_DIRNAME)
    if os.path.isdir(path):
        return True
    meta = index_io.read_metadata(index_dir)
    attr_cols = meta.get("attr_cols")
    if not attr_cols:
        return False
    if meta.get("hnsw_graph"):
        src = spark.read.parquet(index_io.attrs_path(index_dir, meta))
    else:
        src = spark.read.parquet(index_io.vectors_path(index_dir, meta))
    return write_attr_stats(src.select(*attr_cols), attr_cols, index_dir)


def load_stats_pdf(handle):
    """The stats table as pandas, cached on the handle (a full reopen —
    maybe_refresh after append/upsert/compaction — drops the cache with
    the rest of the handle state). None when the index has no stats."""
    if handle.index_dir is None:
        return None
    cached = handle.__dict__.get("_attr_stats_pdf", False)
    if cached is not False:
        return cached
    path = os.path.join(handle.index_dir, STATS_DIRNAME)
    pdf = None
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        import pyarrow.dataset as pads

        pdf = pads.dataset(path, format="parquet").to_table().to_pandas()
    handle._attr_stats_pdf = pdf
    return pdf


def selectivity(handle, where=None, allowed_count=None, spark=None):
    """Estimated fraction of stored rows passing the search filter, or
    None when it can't be estimated (no stats table / predicate the stats
    rows can't answer) — callers then keep their fixed defaults.

    `where` is either the Spark path's SQL string / Column (evaluated by
    Spark against the tiny stats table, cached per predicate per handle)
    or serve_local's vectorized callable (evaluated by numpy on the same
    rows). `allowed_count` is the distinct id-allowlist size; composed
    with `where` under the independence assumption s = s_where * s_allow
    (a deliberate planner approximation — it only sizes the probe
    budget)."""
    s = None
    if where is not None:
        pdf = load_stats_pdf(handle)
        if pdf is None:
            return None
        total = int(pdf["count"].sum())
        if total <= 0:
            return None
        try:
            if callable(where):
                attrs = {
                    c: pdf[c].to_numpy() for c in pdf.columns if c != "count"
                }
                import numpy as np

                mask = np.asarray(where(attrs), dtype=bool)
                matched = int(pdf["count"].to_numpy()[mask].sum())
            else:
                cache = handle.__dict__.setdefault("_selectivity_cache", {})
                key = str(where)
                if key not in cache:
                    sdf = spark.createDataFrame(pdf)
                    cache[key] = int(
                        sdf.filter(where).agg(F.sum("count")).first()[0] or 0
                    )
                matched = cache[key]
        except Exception:
            # predicate references non-attr columns / shape mismatch:
            # unknown, not an error — search keeps its fixed defaults
            return None
        s = matched / total
    if allowed_count is not None:
        tv = handle.meta.get("total_vectors") or 0
        if tv > 0:
            sa = min(1.0, allowed_count / tv)
            s = sa if s is None else s * sa
    return s


def filtered_nprobe(base: int, nlist: int, s) -> int:
    """Scale the probe budget ~1/s so the filtered candidate count matches
    the unfiltered one (recall restoration), capped at probing every list.
    s<=0 (stats say nothing matches) keeps the base — the result is empty
    at any nprobe, don't scan the world to prove it."""
    import math

    if s is None or s <= 0 or s >= 1:
        return base
    return min(nlist, max(base, math.ceil(base / s)))


def filtered_oversample(s) -> int:
    """Auto filter_oversample for graph post-filtering: ~1/s candidates
    surveyed per kept one, clamped to [OVERSAMPLE_FLOOR, OVERSAMPLE_CAP]."""
    import math

    if s is None or s <= 0:
        return OVERSAMPLE_FLOOR
    return min(OVERSAMPLE_CAP, max(OVERSAMPLE_FLOOR, math.ceil(1.0 / s)))
