"""Custom stateful streaming operators (applyInPandasWithState).

The reference is strictly batch (SURVEY §2.9); these are the additive
streaming capabilities a long-running ingestion of the image/event
stream needs:

 - :func:`running_user_totals` — per-key running aggregates with state
   (GroupState), the streaming analogue of the RAT's dynamically-grown
   zone table;
 - :func:`sessionize` — gap-based session windows over event time; a
   cross-batch late event older than the open session's tail is absorbed
   into that session without rewinding its end (no watermark is applied —
   late data is never dropped, only folded in).

Both use `applyInPandasWithState` (Arrow-batched per group, no per-row
Python) and run identically under `availableNow` for resumable backfill.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) carried in
    GroupState across micro-batches. Output one row per user per batch
    with the post-batch totals."""

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [cnt], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="cnt long, total double",
        # append: each emitted row is final for that (user, batch); file
        # sinks (parquet) only accept Append mode
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: events for a user belong to one session
    while consecutive event-time gaps stay under ``gap_seconds``. A
    session closes when LATER data proves the gap (evidence-based, so it
    is deterministic under ``availableNow`` replays — processing-time
    timeouts do not fire in that trigger); the open tail session rides in
    GroupState across micro-batches and restarts."""

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        closed = []
        ts = rows["ts"].astype("int64") // 1_000_000_000
        ts = ts.sort_values().to_numpy()
        if state.exists:
            s0, s1, n = state.get
        else:
            s0, s1, n = int(ts[0]), int(ts[0]), 0
        for t in ts:
            t = int(t)
            if t - s1 > gap_seconds:
                closed.append((user_id, s0, s1, n))
                s0, n = t, 0
            # a cross-batch late event (t <= stored tail s1) must not
            # rewind session_end — the gap test runs against the running
            # max of the open session's event times
            s1 = max(s1, t)
            n += 1
        state.update((s0, s1, n))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, session_start long, session_end long, n_events long",
        stateStructType="s0 long, s1 long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACTLY-ONCE-per-key dedup for the ingestion pipeline:
    duplicates of a key arriving within the watermark delay are dropped
    (state bounded by the watermark — ``dropDuplicatesWithinWatermark``,
    so the key store does not grow without bound the way a plain
    streaming dropDuplicates would). The batch analogue is
    functions/dedup.exact_dup_groups; this is its re-ingestion guard."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
