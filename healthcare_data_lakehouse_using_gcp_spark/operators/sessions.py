"""Gap-based event sessionization — the standard log-curation
operator for clickstream/telemetry training data.

A new session starts when the gap from the user's previous event
exceeds the threshold. Expressed as lag + conditional running count
over ONE window spec (same partitioning and sort), so the plan pays a
single shuffle keyed on the user and a single per-user sort; both
window functions share the exchange.

Scale: state per partition is one row (lag) — no growth with history;
user-level skew is AQE's problem (or pre-salt pathological users with
operators/joins.salted_join semantics). For the unbounded streaming
variant use streaming/stateful.py's applyInPandasWithState pattern
with an event-time timeout instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(c):
    """Floor epoch seconds of a TIMESTAMP_NTZ, timezone-FREE: NTZ
    cannot cast to long, and unix_timestamp would interpret it in the
    session timezone (DST boundaries would corrupt gaps under an
    arbitrary driver timezone). Date + clock-field arithmetic is
    literal on NTZ and matches DuckDB's date_diff('second', ...)
    boundary-crossing count exactly."""
    return (
        F.unix_date(F.to_date(c)).cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """(user, ts ordering) → is_session_start + per-user session_index.

    ``id_col`` breaks ordering ties (same user, same timestamp), so
    session assignment is deterministic — required for the
    cross-engine oracle.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(ts_col).over(w)
    gap_s = _epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev)
    is_start = prev.isNull() | (gap_s > gap_minutes * 60)
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        is_start.alias("is_session_start"),
        F.sum(is_start.cast("int")).over(run).cast("bigint").alias("session_index"),
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup over sessionize() output: event count and
    duration. groupBy keys are a superset of the window partition key,
    so the aggregation reuses the sessionize exchange."""
    return sessions.groupBy(user_col, "session_index").agg(
        F.count(F.lit(1)).alias("n_events"),
        (_epoch_seconds(F.max(F.col(ts_col))) - _epoch_seconds(F.min(F.col(ts_col))))
        .cast("bigint")
        .alias("duration_s"),
    )
