"""Custom stateful streaming operator via `applyInPandasWithState` —
the escape hatch for semantics the built-in windows can't express.

Operator: **per-user running activity profile with inactivity close-out**
— for each user, maintain (event count, value sum, last event time)
across micro-batches; each batch APPENDS the updated running profile, and
when the event-time watermark passes a user's last activity + gap, a
final `closed_by_timeout` row is emitted and the state dropped (bounded
state for unbounded streams). `session_window` cannot express this: the
profile is cumulative ACROSS sessions and the close-out row carries
custom state.

Timeouts are EVENT-TIME (watermark-driven), not processing-time: results
are deterministic for a given input, and a bounded run
(trigger(availableNow)) terminates — a processing-time timer would leave
the query cycling in "cleaning up state" until the wall-clock timer
fired (observed; that is why this operator pins event-time).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_epoch", T.LongType()),
        T.StructField("closed_by_timeout", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_epoch", T.LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000  # inactivity gap before a profile closes


def _update_profile(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, s, last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": s,
              "last_ts_epoch": last, "closed_by_timeout": True}]
        )
        return
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += int(len(pdf))
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts_epoch"].max()))
    state.update((n, s, last))
    # event-time timer: close when the watermark passes last + gap
    state.setTimeoutTimestamp(last * 1000 + GAP_MS)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": s,
          "last_ts_epoch": last, "closed_by_timeout": False}]
    )


def user_activity_profile(events: DataFrame, *, watermark: str = "30 minutes") -> DataFrame:
    """Running per-user profile over an event stream; appends the updated
    profile each micro-batch and a close-out row once the watermark
    passes `last activity + 30min`."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    prepped = src.select(
        "ts",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("value"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
