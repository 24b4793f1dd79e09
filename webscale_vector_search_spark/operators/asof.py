"""As-of (most-recent-preceding) join — a custom operator Spark lacks.

The classic event-pipeline question: for each event of type A, what was the
latest preceding event of type B for the same key? (Trade-to-quote in
finance, click-to-error in telemetry, doc-to-snapshot in training-data
lineage.) Spark has no ASOF JOIN; the SURVEY.md custom-operator policy says
compose from built-ins when semantics allow — and they do:

  union both sides tagged -> per-key window ordered by (ts, event_id) ->
  last(B-timestamp, ignorenulls) over rows-unbounded-preceding.

One shuffle on the key, no join at all — at 100 TB this beats any
range-join formulation (which explodes candidate pairs); it is the same
partial-order trick as the top-k merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    target_type: str,
    source_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """For every `target_type` event, attach the most recent preceding
    `source_type` event's timestamp and id (same key; 'preceding' = earlier
    in the (ts, event_id) total order). Targets with no preceding source
    are kept with NULLs (left-asof semantics).

    Output: (event_id, user_id, ts, prev_source_ts, prev_source_id,
    gap_micros).
    """
    relevant = events.filter(F.col(type_col).isin([target_type, source_type]))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_source = F.col(type_col) == source_type
    annotated = relevant.withColumn(
        "prev_source_ts", F.last(F.when(is_source, F.col(ts_col)), ignorenulls=True).over(w)
    ).withColumn(
        "prev_source_id", F.last(F.when(is_source, F.col(id_col)), ignorenulls=True).over(w)
    )
    return (
        annotated.filter(F.col(type_col) == target_type)
        .select(
            id_col,
            key_col,
            ts_col,
            "prev_source_ts",
            "prev_source_id",
            # cast: unix_micros rejects TIMESTAMP_NTZ inputs; under the UTC
            # session tz the cast is a wall-clock identity (no-op on TIMESTAMP)
            (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col("prev_source_ts").cast("timestamp"))
            ).alias("gap_micros"),
        )
    )
