"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps per-run atomic counters in its checkpoint
(filesProcessed etc., beans/FsCrawlerCheckpoint.java:69-106) updated as
the single thread crawls. The streaming-native form: per-conversation
running counters kept in Spark's managed state store, updated per
micro-batch, exactly-once across restarts via the streaming checkpoint —
arbitrary stateful logic in Arrow-batched pandas, the
'applyInPandasWithState for custom stateful operators' pattern.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

CONV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turns_seen", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_seen", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)


def _update_conv_stats(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (conv_id,) = key
    turns, bytes_in, max_idx = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        turns += len(pdf)
        bytes_in += int(pdf["text"].str.len().fillna(0).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((turns, bytes_in, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns],
            "bytes_in": [bytes_in],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_stats_stream(stream: DataFrame) -> DataFrame:
    """Per-conversation running (turns, bytes, max turn) over a turn
    stream. Emits the updated row for every conv touched by the batch."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_stats,
            outputStructType=CONV_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
