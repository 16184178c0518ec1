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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel over the event stream: how many users
    performed step 1, then step 2 strictly after their first step-1
    event, then step 3 after that, and so on.

    Returns (step_index, step, n_users) — the conversion ladder.

    Scale design (100 TB): each rung is "first qualifying timestamp
    per user" — a hash aggregation joined to the previous rung's
    (user, t) frame. Every shuffle is on user_id, so the k rungs reuse
    one partitioning; per-rung input shrinks monotonically (events of
    one type ⋈ surviving users). No windows, no sorting — min() is a
    mergeable aggregate with map-side partials; k steps cost k linear
    passes over ever-smaller frames."""
    cur = None
    counts = []
    for i, step in enumerate(steps):
        ev_s = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col)
        )
        if cur is None:
            cur = ev_s.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            cur = (
                ev_s.join(cur.select(user_col, "__t"), user_col)
                .filter(F.col(ts_col) > F.col("__t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
                F.lit(i + 1).cast("bigint").alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are grouped by the DATE of their
    first event (the cohort anchor — no week-truncation convention to
    disagree on across engines), and each later active day lands in
    period ``floor(days_since_anchor / period_days)``. Output is one
    row per (cohort_date, period) with the distinct active-user count
    — the classic retention triangle.

    Scale design (100 TB): three shuffles, two of them on the same
    key. (1) first-event dates: min() hash-agg on user_id with
    map-side partials; (2) distinct active (user, day) pairs: the
    dropDuplicates also hash-partitions on user_id, so the join back
    to the anchors frame reuses that exchange (co-partitioned,
    no broadcast needed — both sides are user-keyed); (3) the final
    (cohort, period) rollup moves only the already-deduped pairs.
    countDistinct is exact; at extreme cardinality swap
    approx_count_distinct in the caller's own rollup."""
    day = F.to_date(F.col(ts_col)).alias("__day")
    anchors = events.groupBy(user_col).agg(
        F.min(F.to_date(F.col(ts_col))).alias("cohort_date")
    )
    activity = events.select(F.col(user_col), day).dropDuplicates()
    period = F.floor(
        F.datediff(F.col("__day"), F.col("cohort_date")) / F.lit(float(period_days))
    ).cast("bigint")
    return (
        activity.join(anchors, user_col)
        .select(F.col(user_col), F.col("cohort_date"), period.alias("period"))
        .groupBy("cohort_date", "period")
        .agg(F.countDistinct(user_col).cast("bigint").alias("n_users"))
    )


def repeat_event_within(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    within_days: int = 30,
) -> DataFrame:
    """Repeat-event rate within a horizon — the readmission-rate shape
    (reference dashboards stop at plain encounter counts,
    `dags/healthcare_analytics_dag.py` daily rollups; this is the
    30-day-readmission analogue every clinical quality program asks
    for next). For each (entity, event type), an event is a *repeat
    source* when the SAME entity has another event of the SAME type
    within ``within_days``. Output is one row per event type with the
    event count, repeat-source count, and their ratio.

    Semantics: LEAD over (entity, type) ordered by (ts, tiebreak) —
    only the IMMEDIATE next event is tested, which is equivalent to
    "any later event within the horizon" because events are sorted:
    if any qualifies, the nearest does. Interval arithmetic is literal
    on TIMESTAMP_NTZ (no timezone/DST involvement), matching DuckDB's
    ``ts + INTERVAL n DAY`` exactly; the rate divides two exact
    BIGINTs, so the result is bit-identical cross-engine before the
    deterministic 4-dp rounding.

    Scale design (100 TB): one shuffle keyed on (entity, type) for the
    window sort — per-row state is a single LEAD value — then a
    map-side-combined rollup to |event types| rows. Entity skew is
    bounded by per-entity history length, not table size; AQE handles
    moderate skew, `joins.salted_join` semantics apply if one entity
    is pathological.
    """
    from ..functions.scalars import round_det

    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(F.col(ts_col)).over(w)
    horizon = F.col(ts_col) + F.expr(f"INTERVAL {int(within_days)} DAYS")
    flagged = events.withColumn(
        "__is_repeat", (nxt.isNotNull() & (nxt <= horizon)).cast("int")
    )
    n = F.count(F.lit(1)).cast("bigint")
    rep = F.sum("__is_repeat").cast("bigint")
    return (
        flagged.groupBy(type_col)
        .agg(n.alias("n_events"), rep.alias("n_repeats"))
        .select(
            type_col,
            "n_events",
            "n_repeats",
            round_det(
                F.col("n_repeats").cast("double") / F.col("n_events"), 4
            ).alias("repeat_rate"),
        )
    )


def attribution_last_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("view", "click"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon_days: int = 7,
    unattributed_label: str = "direct",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the user's most recent touch event (view/click/...)
    at or before it, provided that touch falls within
    ``horizon_days``; conversions with no in-horizon touch are
    labeled ``unattributed_label``. Output is one row per channel
    with the conversion count and its share of all conversions.

    Touch ties per (user, ts) resolve to the max-``id_col`` row —
    since r16 via the as-of window's own tie order (right_tie_cols)
    rather than a separate max_by pre-aggregation — so the as-of
    ordering is total and the credited channel is deterministic under
    timestamp ties. Latest touch OVERALL then horizon-filtered ≡
    latest touch within the horizon (any other touch is older still).
    The share divides two exact BIGINTs.

    Scale design (100 TB): the as-of runs as
    ``joins.asof_join_backward``'s union + single keyed window pass —
    one shuffle and one sort regardless of touch density, where a
    horizon band join would explode candidates for heavy users (the
    oracle deliberately takes that band-join form to prove
    equivalence of the two plans). The rollup output is
    |channels|+1 rows; the total joins back via broadcast.
    """
    from ..functions.scalars import round_det
    from .joins import asof_join_backward

    # conv keeps only (user, ts): the union/shuffle/sort must stay as
    # narrow as possible, and per-conversion identity is irrelevant to
    # the channel rollup (duplicate (user, ts) conversions each flow
    # through and each earn a credit). Touches drop NULL users: the
    # window would otherwise pool all NULL-user rows into one
    # pseudo-entity and cross-credit them, where equi-join semantics
    # (the oracle, and any sane attribution) say a NULL-user
    # conversion is unattributable → labeled direct.
    conv = events.filter(F.col(type_col) == conversion_type).select(
        user_col, ts_col
    )
    # Optimization r16 (guide §2.4): the (user, ts) max_by pre-dedup
    # was a full extra exchange of the touch side; the as-of window
    # already sorts per user, so ordering its ties by id_col makes the
    # forward fill pick the max-id touch at each (user, ts) — the
    # identical winner, one exchange earlier. (Docstring contract
    # unchanged: ties still credit deterministically by max id.)
    touch = events.filter(
        F.col(type_col).isin(list(touch_types)) & F.col(user_col).isNotNull()
    ).select(
        user_col, ts_col, F.col(type_col).alias("channel"), F.col(id_col)
    )
    j = asof_join_backward(
        conv,
        touch,
        [user_col],
        ts_col,
        ts_col,
        ["channel"],
        right_tie_cols=[id_col],
    )
    in_horizon = F.col("asof_ts").isNotNull() & (
        F.col("asof_ts")
        >= F.col(ts_col) - F.expr(f"INTERVAL {int(horizon_days)} DAYS")
    )
    labeled = j.select(
        F.when(in_horizon, F.col("asof_channel"))
        .otherwise(F.lit(unattributed_label))
        .alias("channel")
    )
    # checkpoint the |channels|-row rollup: the total branches off it,
    # and without this the whole as-of pipeline would execute twice
    agg = (
        labeled.groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        .localCheckpoint(eager=True)
    )
    tot = agg.agg(F.sum("n_conversions").cast("bigint").alias("__total"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "channel",
        "n_conversions",
        round_det(
            F.col("n_conversions").cast("double")
            / F.col("__total").cast("double"),
            4,
        ).alias("share"),
    )


def interarrival_stats(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    digits: int = 4,
) -> DataFrame:
    """Inter-arrival cadence report per event type: mean and exact
    p50/p90/p99 of the gap (seconds) between consecutive same-type
    events of the same entity — MTBF when the type is an error
    stream, visit cadence when it is encounters. The distribution the
    daily-count views cannot see: a type can hold a flat daily total
    while its per-entity rhythm collapses.

    Gaps are integer second counts (clock-field arithmetic on
    TIMESTAMP_NTZ == DuckDB date_diff('second', …)) and the mean is
    an exact-integer ratio — bit-exact cross-engine. The percentiles
    are NOT bit-exact for non-dyadic quantiles: Spark interpolates
    (1−f)·a + f·b where DuckDB computes a + f·(b−a), which diverge by
    ulps for f ∉ {.25, .5, .75}; p90/p99 therefore rely on the
    far-digit ROUND(…, 4) absorbing the ulp (the a10 "aggregate
    parity rule"), not on bit equality.

    Scale design (100 TB): one shuffle keyed on (entity, type) for
    the LEAD window (O(1) state), then one hash-agg to |types| rows —
    exact percentiles buffer per-group gap lists, right for a
    bounded type vocabulary; pass the gap frame to
    ``analytics.grouped_percentiles(approx=True)`` for
    high-cardinality grouping instead.
    """
    from ..functions.scalars import round_det

    w = Window.partitionBy(user_col, type_col).orderBy(
        ts_col, tiebreak_col
    )
    es = _epoch_seconds(F.col(ts_col))
    gaps = events.select(
        type_col, (F.lead(es).over(w) - es).alias("__gap_s")
    ).filter(F.col("__gap_s").isNotNull())
    agg = gaps.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__gap_s").cast("bigint").alias("__s"),
        F.percentile("__gap_s", F.lit(0.5)).alias("__p50"),
        F.percentile("__gap_s", F.lit(0.9)).alias("__p90"),
        F.percentile("__gap_s", F.lit(0.99)).alias("__p99"),
    )
    return agg.select(
        type_col,
        "n_gaps",
        round_det(
            F.col("__s").cast("double") / F.col("n_gaps").cast("double"),
            digits,
        ).alias("mean_gap_s"),
        F.round("__p50", digits).alias("p50_gap_s"),
        F.round("__p90", digits).alias("p90_gap_s"),
        F.round("__p99", digits).alias("p99_gap_s"),
    )


def churn_flows(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
) -> DataFrame:
    """Period-over-period user flows: for every observed period whose
    calendar successor is also observed, how many of its active users
    RETURNED next period (retained), how many did not (churned), and
    how many next-period users are NEW — the flow decomposition behind
    every "MAU is flat" mystery (flat totals can hide 30% churn
    backfilled by acquisition). Complements ``cohort_retention``
    (anchored triangles) and w8's scalar period deltas with the
    actual set movements between consecutive periods.
    ``period`` is "month" or "week" (ISO Monday weeks).

    All outputs are distinct-user counts — exact integers; bucketing
    is calendar period-start (Spark trunc == DuckDB
    date_trunc::DATE on NTZ timestamps, both ISO-Monday for weeks),
    and "consecutive" means calendar-consecutive, so a silent gap
    period ends a flow rather than bridging it.

    Scale design (100 TB): one dropDuplicates to the (month, user)
    grain (map-side combine), then retained/churned/new are an
    inner, anti, and reversed-anti join ALL on the same
    (month, user) key — the three reuse one hash partitioning — each
    followed by a |months|-row rollup. No windows, nothing global.
    """
    if period not in ("month", "week"):
        raise ValueError(f"period must be 'month' or 'week', got {period!r}")

    def _shift(c, n):
        return (
            F.add_months(c, n) if period == "month" else F.date_add(c, 7 * n)
        )

    mu = (
        events.select(
            F.trunc(F.to_date(F.col(ts_col)), period).alias("m"),
            F.col(user_col).alias("u"),
        )
        .dropDuplicates()
    )
    # presence-in-next-period, recorded at the CURRENT period's key
    nxt = mu.select(_shift(F.col("m"), -1).alias("m"), F.col("u"))
    months = mu.select("m").distinct()
    with_successor = months.alias("a").join(
        months.alias("b"),
        F.col("b.m") == _shift(F.col("a.m"), 1),
    ).select(F.col("a.m").alias("m"))

    active = mu.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    )
    retained = (
        mu.join(nxt, ["m", "u"])
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained_next"))
    )
    churned = (
        mu.join(nxt, ["m", "u"], "left_anti")
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned_next"))
    )
    new = (
        nxt.join(mu, ["m", "u"], "left_anti")
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_next"))
    )
    out = (
        with_successor.join(active, "m")
        .join(retained, "m", "left")
        .join(churned, "m", "left")
        .join(new, "m", "left")
    )
    z = F.lit(0).cast("bigint")
    return out.select(
        "m",
        "active_users",
        F.coalesce("retained_next", z).alias("retained_next"),
        F.coalesce("churned_next", z).alias("churned_next"),
        F.coalesce("new_next", z).alias("new_next"),
    )
