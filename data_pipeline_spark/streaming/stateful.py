"""Custom stateful streaming operators (applyInPandasWithState).

``streaming_dedup_first_seen``: emit each key's FIRST-seen event only,
remembering seen keys in per-key state with a processing-time TTL — the
streaming face of at-least-once → effectively-once delivery for sinks that
cannot fence (the icehouse sink doesn't need this: its epoch registry
already dedups; this operator serves foreign sinks and alert streams, e.g.
the reference's price-change notifications, ``notification_service/main.py``,
which must not re-email on replay).

State design for scale: state is per-key (grouped by key hash), lives in the
state store co-partitioned with the shuffle, and expires via timeout —
bounded by (active keys × TTL), not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_lsn", T.LongType()),
        T.StructField("n_new", T.IntegerType()),
    ]
)
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen_min_lsn", T.LongType())])


def streaming_dedup_first_seen(
    events: DataFrame, key_col: str = "doc_id", ttl_ms: int = 3_600_000
) -> DataFrame:
    """First-seen-only stream: one output row per NEW key per its first
    micro-batch.  Requires a streaming DataFrame with columns
    (``key_col``, ``lsn``).

    The state function is a CLOSURE (pickled by value): executors don't need
    the library on their PYTHONPATH, matching the spark-submit --py-files-
    free usage of a single driver script.
    """

    def _dedup_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL fired (empty batch iterator): expire the key so state stays
            # bounded by active keys × TTL.  Without this branch the
            # state.exists path below would re-register the timeout forever.
            state.remove()
            return
        min_lsn = None
        n = 0
        for pdf in batches:
            n += len(pdf)
            m = int(pdf["lsn"].min())
            min_lsn = m if min_lsn is None else min(min_lsn, m)
        if state.exists:
            # key already emitted once: refresh TTL, emit nothing
            state.setTimeoutDuration(ttl_ms)
            return
        state.update((min_lsn,))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "first_lsn": [min_lsn], "n_new": [n]})

    keyed = events.selectExpr(f"{key_col} as key", "lsn").groupBy("key")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
