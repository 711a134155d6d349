"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the Spark construct for operators the built-in
windowed aggregations can't express (per-key open-ended sessions).

Semantics match ``analytics.sessionize`` (its batch form is the oracle in
tests): a session closes when no event arrives within ``gap_minutes`` of its
last event; closed sessions are emitted with start/end/count/sum.

State per user: (session_start, last_ts, n_events, sum_value_micros). Sum is
kept in integer micro-units — exact accumulation, same trick as the engine's
decimal sums. A processing-time timeout flushes idle sessions.

Scale: state is partitioned by user_id across executors (RocksDB state store
in production configs); each microbatch touches only keys with new events
plus timed-out keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

# state: start_us, last_us, n_events, sum_micros
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_micros", LongType(), False),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, value) stream → closed-session stream."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, sm = state.get
                closed.append((user_id, start_us, last_us, n, sm / 1e6))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, value in zip(pdf["ts"], pdf["value"]):
                    rows.append((int(ts.value // 1000), float(value)))
            rows.sort()
            if state.exists:
                start_us, last_us, n, sm = state.get
            else:
                start_us, last_us, n, sm = None, None, 0, 0
            for ts_us, value in rows:
                v_us = int(round(value * 1e6))
                if start_us is None:
                    start_us, last_us, n, sm = ts_us, ts_us, 1, v_us
                elif ts_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, sm / 1e6))
                    start_us, last_us, n, sm = ts_us, ts_us, 1, v_us
                else:
                    last_us, n, sm = ts_us, n + 1, sm + v_us
            if start_us is not None:
                state.update((start_us, last_us, n, sm))
                state.setTimeoutDuration(gap_minutes * 60 * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 6) for c in closed],
                }
            )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
