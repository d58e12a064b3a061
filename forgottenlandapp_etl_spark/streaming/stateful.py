"""Custom stateful streaming operator: exact J3 accumulating-merge semantics
via applyInPandasWithState (SURVEY.md §2.9).

The windowed count×5 in streaming/online.py covers the reference's real
behavior; this operator exists for the general case a built-in windowed agg
cannot express — per-key running state with arbitrary merge logic (the
reference's matched→update / unmatched→insert fold, etl.dart:360-382):

    state[user] = (minutes += cadence, level := latest poll's level)

State is one small tuple per key (bounded by |active users|), timeouts
close idle keys, and each micro-batch emits the keys it touched — the
streaming analog of the K3 day-partition upsert.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "minutes LONG, level INT, n_polls LONG, last_ts_us LONG, last_event_id LONG"
)
OUTPUT_SCHEMA = "user_id LONG, minutes LONG, level INT, n_polls LONG"


def _merge_polls(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    minutes_per_poll: int,
    idle_timeout_ms: int,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's polls for one user into the running accumulator.

    Mirrors etl.dart:370-373: every poll adds the cadence to the user's
    minutes and the LATEST poll's level wins. The winning (ts, event_id) is
    PERSISTED IN STATE, not batch-local: a late-arriving micro-batch whose
    newest poll is older than the level already accumulated must not
    overwrite it, and equal-ts ties break on event_id across batch/chunk
    boundaries so re-runs are deterministic.
    """
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        minutes, level, n_polls, last_ts_us, last_eid = state.get
    else:
        minutes, level, n_polls, last_ts_us, last_eid = 0, None, 0, None, None
    for pdf in pdfs:
        n = len(pdf)
        n_polls += n
        minutes += n * minutes_per_poll
        # null ts/event_id rows count toward minutes but can never win the
        # latest-poll contest: pandas sorts NaT/NaN LAST, so without this
        # dropna a null-ts row would be chosen as "latest" (clobbering the
        # level) and int(NaN) would kill the query
        pdf = pdf.dropna(subset=["ts", "event_id"]).sort_values(["ts", "event_id"])
        if not len(pdf):
            continue
        batch_last = pdf.iloc[-1]
        ts_us = int(batch_last["ts"].value // 1000)
        eid = int(batch_last["event_id"])
        if last_ts_us is None or (ts_us, eid) >= (last_ts_us, last_eid):
            last_ts_us, last_eid = ts_us, eid
            lv = batch_last["level"]
            level = None if pd.isna(lv) else int(lv)
    state.update((minutes, level, n_polls, last_ts_us, last_eid))
    if idle_timeout_ms > 0:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "minutes": [minutes],
            "level": [level],
            "n_polls": [n_polls],
        }
    )


def accumulate_online_time(
    polls: DataFrame, minutes_per_poll: int = 5, idle_timeout_ms: int = 0
) -> DataFrame:
    """Streaming per-user online-time accumulator.

    ``polls`` is a streaming DataFrame with (event_id LONG, ts TIMESTAMP,
    user_id LONG, level INT). Output mode must be ``update``: each
    micro-batch emits the new running totals for the users it saw.

    ``idle_timeout_ms=0`` (default) disables state timeouts, which is what a
    bounded ``availableNow`` drain needs — with ProcessingTimeTimeout the
    query keeps scheduling timeout-only batches and never reaches the
    terminated state. Continuous deployments pass a positive timeout (e.g.
    one day) so idle users' state is evicted and the store stays bounded by
    the active-user count.
    """

    def fn(key, pdfs, state):
        yield from _merge_polls(key, pdfs, state, minutes_per_poll, idle_timeout_ms)

    return polls.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )
