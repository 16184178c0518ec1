"""Custom stateful streaming operator: per-patient alert episodes.

Beyond-reference capability (the reference's streaming layer is
stateless — SURVEY.md §2.8): track, per patient, how many
consecutive anomalous vitals readings have arrived, emitting an
"episode" row whenever the streak ends or the state times out. This
is the `applyInPandasWithState` pattern for operators Spark's
built-ins can't express (cross-batch per-key state with timeouts).

Scale design: state is keyed by patient_id (hash-partitioned across
executors by the state store); per-key state is O(1) (counts +
timestamps only); processing-time timeout bounds state lifetime for
idle keys, so state size tracks ACTIVE patients, not stream history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EPISODE_SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("alert_count", T.LongType()),
        T.StructField("first_alert_ts", T.StringType()),
        T.StructField("last_alert_ts", T.StringType()),
        T.StructField("closed_by", T.StringType()),  # normal_reading | timeout
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("alert_count", T.LongType()),
        T.StructField("first_ts", T.StringType()),
        T.StructField("last_ts", T.StringType()),
    ]
)


def _update_episodes(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int = 60_000,
) -> Iterator[pd.DataFrame]:
    """State update: accumulate consecutive alerts; emit an episode
    when a normal reading arrives or the key times out."""
    (patient_id,) = key
    if state.hasTimedOut:
        count, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "patient_id": patient_id,
                    "alert_count": count,
                    "first_alert_ts": first_ts,
                    "last_alert_ts": last_ts,
                    "closed_by": "timeout",
                }
            ]
        )
        return

    episodes: list[dict[str, Any]] = []
    count, first_ts, last_ts = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        pdf = pdf.sort_values("timestamp")
        for _, row in pdf.iterrows():
            if bool(row["is_alert"]):
                count += 1
                first_ts = first_ts or str(row["timestamp"])
                last_ts = str(row["timestamp"])
            elif count > 0:
                episodes.append(
                    {
                        "patient_id": patient_id,
                        "alert_count": count,
                        "first_alert_ts": first_ts,
                        "last_alert_ts": last_ts,
                        "closed_by": "normal_reading",
                    }
                )
                count, first_ts, last_ts = 0, None, None
    if count > 0:
        state.update((count, first_ts, last_ts))
        state.setTimeoutDuration(timeout_ms)  # close idle episodes
    elif state.exists:
        state.remove()
    if episodes:
        yield pd.DataFrame(episodes)


def alert_episodes(vitals_stream: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """vitals (streaming) → closed alert episodes per patient.

    Input needs: patient_id, timestamp (string ts), plus alert flags
    (low_oxygen/fever/elevated-HR — the P6 flags); any true flag makes
    the reading an alert.
    """

    def _update(key, pdfs, state):
        yield from _update_episodes(key, pdfs, state, timeout_ms)

    flagged = vitals_stream.select(
        "patient_id",
        "timestamp",
        (
            F.coalesce(F.col("oxygen_saturation") < 95, F.lit(False))
            | F.coalesce(F.col("temperature") > 38.0, F.lit(False))
            | F.coalesce(F.col("heart_rate") > 100, F.lit(False))
        ).alias("is_alert"),
    )
    return flagged.groupBy("patient_id").applyInPandasWithState(
        _update,
        outputStructType=EPISODE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --- streaming sessionization (gap-based, stateful) ------------------

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("session_end", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.StringType()),
        T.StructField("last_ts", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _update_sessions(key, pdfs, state, gap_seconds: int, timeout_ms: int):
    """Per-user gap sessionization across micro-batches: events within
    ``gap_seconds`` of the previous event extend the open session;
    a larger gap closes it and opens a new one; idle keys close by
    processing-time timeout. The streaming counterpart of
    operators/sessions.sessionize (same gap rule)."""
    (user_id,) = key
    if state.hasTimedOut:
        start_ts, last_ts, n = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": start_ts,
                    "session_end": last_ts,
                    "n_events": n,
                    "closed_by": "timeout",
                }
            ]
        )
        return

    closed = []
    start_ts, last_ts, n = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for _, row in pdf.iterrows():
            ts = row["ts"]
            if last_ts is not None and (
                (ts - pd.Timestamp(last_ts)).total_seconds() > gap_seconds
            ):
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": start_ts,
                        "session_end": last_ts,
                        "n_events": n,
                        "closed_by": "gap",
                    }
                )
                start_ts, last_ts, n = None, None, 0
            start_ts = start_ts or str(ts)
            last_ts = str(ts)
            n += 1
    if n > 0:
        state.update((start_ts, last_ts, n))
        state.setTimeoutDuration(timeout_ms)
    elif state.exists:
        state.remove()
    if closed:
        yield pd.DataFrame(closed)


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events stream (user_id, ts timestamp) → closed sessions.

    Scale design: state keyed by user_id (hash-partitioned state
    store), O(1) per key (start/last/count); the processing-time
    timeout closes idle users so state size tracks ACTIVE users in
    the gap horizon, not stream history — the same bounded-state
    argument as alert_episodes, applied to the batch sessionize
    operator's gap rule."""

    def _update(key, pdfs, state):
        yield from _update_sessions(key, pdfs, state, gap_seconds, timeout_ms)

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --- Streaming strict-order funnel ----------------------------------

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_index", T.LongType()),  # 1-based rung reached
        T.StructField("step", T.StringType()),
        T.StructField("reached_ts", T.StringType()),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_step", T.LongType()),  # rungs completed so far
        T.StructField("cur_ts", T.StringType()),  # ts of last completed rung
    ]
)


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    timeout_ms: int = 0,
) -> DataFrame:
    """Streaming counterpart of operators/sessions.funnel: advance each
    user's strict-order ladder incrementally across micro-batches and
    emit one row per rung the user newly reaches — a downstream
    `groupBy(step).count()` over the emitted rows IS the live
    conversion ladder, equal to the batch funnel's n_users when the
    same events have flowed through in event-time order.

    State per user is O(1) — (rungs_completed, ts_of_last_rung) — and
    FROZEN once the ladder completes (no growth with stream length);
    pass timeout_ms > 0 to expire fully-idle users' state entirely.
    Within a micro-batch events are processed in ts order; across
    batches the greedy-earliest chain matches the batch operator
    whenever rung-advancing events arrive in event-time order (the
    usual watermarked-source case). A late out-of-order event can at
    worst advance a rung LATER than the batch result — never skip the
    strict ordering.

    Scale: the state store hash-partitions by user_id; each batch
    touches only users present in it; no joins, no windows — the
    k-rung chain from the batch operator becomes a per-key counter.
    """
    order = {s: i for i, s in enumerate(steps)}

    def _update(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        cur_step, cur_ts = state.get if state.exists else (0, None)
        out = []
        for pdf in pdfs:
            pdf = pdf[pdf["event_type"].isin(order)].sort_values("ts")
            for _, row in pdf.iterrows():
                if cur_step >= len(steps):
                    break
                want = steps[cur_step]
                ts = row["ts"]
                if row["event_type"] == want and (
                    cur_step == 0 or ts > pd.Timestamp(cur_ts)
                ):
                    cur_step += 1
                    cur_ts = str(ts)
                    out.append(
                        {
                            "user_id": user_id,
                            "step_index": cur_step,
                            "step": want,
                            "reached_ts": cur_ts,
                        }
                    )
        if cur_step > 0:
            state.update((cur_step, cur_ts))
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


MSPRT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("period", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cum_mean_diff", T.DoubleType()),
        T.StructField("log_lambda", T.DoubleType()),
        T.StructField("p_always_valid", T.DoubleType()),
        T.StructField("rejected", T.BooleanType()),
        T.StructField("n_late_dropped", T.LongType()),
    ]
)

MSPRT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.DoubleType()),
        T.StructField("sxx", T.DoubleType()),
        T.StructField("max_ll", T.DoubleType()),
        T.StructField("last_period", T.LongType()),
        T.StructField("n_late", T.LongType()),
    ]
)


def msprt_monitor_stream(
    diffs: DataFrame,
    mixture_h: float = 1.0,
    alpha: float = 0.05,
    sigma2: float | None = None,
) -> DataFrame:
    """STREAMING always-valid experiment monitor — the continuous
    form of ``analytics.msprt_always_valid``: per experiment group,
    each arriving period-difference observation extends the running
    (n, Σx, Σx²) state, recomputes log Λ, folds it into the running
    max, and emits the monitoring row (anytime-valid p + rejection
    flag) as the data arrives — peek at the dashboard every
    micro-batch without inflating false positives; that is the whole
    point of the mixture-SPRT construction.

    Input columns: group (string), period (long, the day/bucket
    index), x (double, that period's observed difference).

    σ²: pass a PRE-REGISTERED ``sigma2`` for the statistically
    cleanest prospective guarantee; with ``sigma2=None`` the running
    sample variance is plugged in (n ≥ 2 required before a statistic
    is emitted — earlier rows emit NULL log Λ / p = 1), the standard
    pragmatic monitoring choice. The batch twin uses the FULL-series
    plug-in, so exact numeric parity with the batch operator holds
    when both are given the same fixed ``sigma2``.

    Ordering contract: periods must arrive non-decreasing per group
    ACROSS micro-batches (the upstream daily rollup emits them in
    order); WITHIN a micro-batch arrival order is free — the whole
    batch is materialized and sorted by period before folding, so
    Arrow chunk boundaries cannot reorder rows. A genuinely late
    period (≤ the last period of a PRIOR batch) is DROPPED — never
    silently folded out of order, which would corrupt the running
    max's anytime validity — and surfaces in the ``n_late_dropped``
    counter on every emitted row.

    Scale design: state is 6 scalars per experiment group
    (hash-partitioned by the state store); per-batch work is one
    pass over that group's new rows. No timeout: an experiment
    monitor lives until the stream stops — groups are few (one per
    experiment × metric), so state size is not data-proportional."""
    import math as _math

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if mixture_h <= 0:
        raise ValueError(f"mixture_h must be positive, got {mixture_h}")
    if sigma2 is not None and sigma2 <= 0:
        raise ValueError(f"sigma2 must be positive, got {sigma2}")
    thresh = -_math.log(alpha)
    h = float(mixture_h)

    def _update(key, pdfs, state: GroupState):
        (group,) = key
        n, sx, sxx, max_ll, last_p, n_late = (
            state.get if state.exists else (0, 0.0, 0.0, None, None, 0)
        )
        out: list[dict[str, Any]] = []
        # Materialize the WHOLE micro-batch before sorting: Spark gives
        # no ordering guarantee across the iterator's Arrow chunks, so
        # sorting each chunk independently would let a group that spans
        # chunks deliver an earlier period in a later chunk and the
        # late-row guard below would silently drop an in-batch row,
        # corrupting (n, sx, sxx, max_ll). State is 6 scalars per group
        # and a group's batch slice is one experiment's new periods —
        # bounded, so the concat is not data-proportional.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values("period")
            for _, row in batch.iterrows():
                period = int(row["period"])
                if last_p is not None and period <= last_p:
                    n_late += 1
                    continue
                last_p = period
                x = float(row["x"])
                n += 1
                sx += x
                sxx += x * x
                if sigma2 is not None:
                    s2 = sigma2
                elif n >= 2:
                    s2 = (sxx - sx * sx / n) / (n - 1)
                else:
                    s2 = None
                if s2 is not None and s2 > 0:
                    dbar = sx / n
                    ll = 0.5 * _math.log(s2 / (s2 + n * h)) + (
                        n * n * dbar * dbar * h
                    ) / (2.0 * s2 * (s2 + n * h))
                    max_ll = ll if max_ll is None else max(max_ll, ll)
                else:
                    ll = None
                p = (
                    min(1.0, _math.exp(-max_ll))
                    if max_ll is not None
                    else 1.0
                )
                out.append(
                    {
                        "group": group,
                        "period": period,
                        "n": n,
                        "cum_mean_diff": sx / n,
                        "log_lambda": ll,
                        "p_always_valid": p,
                        "rejected": (
                            max_ll is not None and max_ll > thresh
                        ),
                        "n_late_dropped": n_late,
                    }
                )
        state.update((n, sx, sxx, max_ll, last_p, n_late))
        if out:
            yield pd.DataFrame(out)

    return diffs.select("group", "period", "x").groupBy("group").applyInPandasWithState(
        _update,
        outputStructType=MSPRT_OUT_SCHEMA,
        stateStructType=MSPRT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
