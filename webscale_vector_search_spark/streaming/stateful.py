"""Custom stateful streaming operators via applyInPandasWithState.

The built-in streaming aggregates (windowed_metrics, streaming_dedup) cover
T2/T3; this module shows the engine's custom-state surface — the Spark
primitive for operators whose state is not a SQL aggregate. The example
operator, a running per-group top-k of smallest values, is exactly the
serving-side state a continuous kNN would keep (best distances seen so far
per query) — the streaming twin of the K3 merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_topk(
    stream: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 10,
) -> DataFrame:
    """Maintain the k smallest (value, id) pairs ever seen per group; emit
    the refreshed top-k after each micro-batch that touches the group.

    State is bounded at k rows per group (the merge keeps only survivors —
    same invariant as the batch partial/final top-k). Tie-break on id keeps
    the ordering total, matching the batch `topk` contract.
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(id_col, T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("values", T.ArrayType(T.DoubleType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            values, ids = state.get
            pairs = list(zip(values, ids))
        else:
            pairs = []
        for pdf in pdfs:
            pairs.extend(zip(pdf[value_col].astype(float), pdf[id_col].astype(int)))
        pairs.sort()
        pairs = pairs[:k]
        state.update((([v for v, _ in pairs]), ([i for _, i in pairs])))
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(pairs),
                "rank": range(1, len(pairs) + 1),
                value_col: [v for v, _ in pairs],
                id_col: [i for _, i in pairs],
            }
        )

    return (
        stream.select(group_col, value_col, id_col)
        .groupBy(group_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
