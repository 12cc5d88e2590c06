"""Sessionization — batch (window functions) and custom stateful streaming
(``applyInPandasWithState``), the "operator Spark lacks" pattern from
SURVEY.md §2.5: batch semantics defined relationally (lag + cumulative sum,
fully oracle-checkable), streaming variant keeps per-user state with a
processing-time timeout.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_GAP_SECONDS = 30 * 60

def _cents_half_up(value: float) -> int:
    """value → integer cents with HALF_UP rounding, matching Spark's
    ``round()`` in :func:`sessionize_batch` (Python's ``round()`` is
    banker's rounding and would disagree on exact halves, e.g. 0.125)."""
    return int(Decimal(str(value * 100)).quantize(
        Decimal("1"), rounding=ROUND_HALF_UP))


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),   # epoch seconds
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
])


def sessionize_batch(events: DataFrame,
                     gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_seconds``. Pure window functions —
    lag → boundary flag → running sum as session id → aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (events
         .withColumn("prev_ts", F.lag("ts").over(w))
         .withColumn(
             "new_session",
             (F.col("prev_ts").isNull() |
              (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
               > gap_seconds)).cast("long"))
         .withColumn("session_seq", F.sum("new_session").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    return (e.groupBy("user_id", "session_seq")
            .agg(F.min(F.unix_timestamp("ts")).alias("session_start"),
                 F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("value_cents"))
            .select("user_id", "session_start", "n_events", "value_cents"))


# NB: Spark's unix_timestamp() truncates sub-second timestamps; DuckDB's
# epoch() is fractional and its double→int CAST rounds — FLOOR on both the
# gap test and session_start keeps the engines in lockstep.
ORACLE_SQL = f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events),
    f AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                     OR FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts))
                        > {SESSION_GAP_SECONDS}
                THEN 1 ELSE 0 END AS new_session
      FROM e),
    g AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM f)
    SELECT user_id, CAST(FLOOR(MIN(epoch(ts))) AS BIGINT) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS value_cents
    FROM g GROUP BY user_id, session_seq"""


def sessionize_stream(events_stream: DataFrame,
                      gap_seconds: int = SESSION_GAP_SECONDS,
                      watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful streaming operator: per-user open-session state,
    emitted when a gap is observed in-stream or when the *event-time*
    watermark passes the session's gap deadline.

    EventTimeTimeout (not ProcessingTimeTimeout) on purpose: timeouts are a
    function of the data's own clock, so replays/backfills are
    deterministic — and a ProcessingTime-based query under
    ``trigger(availableNow)`` spins unbounded empty micro-batches waiting
    for wall-clock timeouts (observed: 200+ batches before a state-store
    commit race).

    Input stream columns: user_id, ts (timestamp), value (double).
    Output: closed sessions (SESSION_SCHEMA).
    """
    state_schema = "last_ts long, session_start long, n long, cents long"

    def update(key, pdfs, state: GroupState):
        user_id = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                last_ts, start, n, cents = state.get
                closed.append((user_id, start, n, cents))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, value in zip(pdf["ts"], pdf["value"]):
                    rows.append((int(ts.timestamp()),
                                 _cents_half_up(float(value))))
            rows.sort()
            if state.exists:
                last_ts, start, n, cents = state.get
            else:
                last_ts = start = n = cents = None
            for ts_s, cents_i in rows:
                if last_ts is not None and ts_s - last_ts > gap_seconds:
                    closed.append((user_id, start, n, cents))
                    last_ts = start = n = cents = None
                if last_ts is None:
                    start, n, cents, last_ts = ts_s, 0, 0, ts_s
                n += 1
                cents += cents_i
                last_ts = max(last_ts, ts_s)
            state.update((last_ts, start, n, cents))
            # fire when event-time passes the gap deadline (must stay
            # ahead of the current watermark)
            deadline_ms = (last_ts + gap_seconds) * 1000
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start", "n_events", "value_cents"])

    return (events_stream
            .select("user_id", "ts", "value")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update, SESSION_SCHEMA, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))
