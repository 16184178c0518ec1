"""Gap-based sessionization tests (operators/sessions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark):
    rows = [
        # user 1: two sessions (45-min gap between e3 and e4)
        (1, 1, "2024-06-01T10:00:00"),
        (2, 1, "2024-06-01T10:10:00"),
        (3, 1, "2024-06-01T10:20:00"),
        (4, 1, "2024-06-01T11:05:00"),
        (5, 1, "2024-06-01T11:06:00"),
        # user 2: one event
        (6, 2, "2024-06-01T09:00:00"),
        # user 3: exactly 30-min gap is NOT a new session (> semantics)
        (7, 3, "2024-06-01T08:00:00"),
        (8, 3, "2024-06-01T08:30:00"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_sessionize_gap_semantics(spark):
    out = {r["event_id"]: r for r in sessionize(_events(spark), gap_minutes=30).collect()}
    assert [out[i]["session_index"] for i in (1, 2, 3)] == [1, 1, 1]
    assert out[4]["is_session_start"] and out[4]["session_index"] == 2
    assert out[5]["session_index"] == 2
    assert out[6]["session_index"] == 1
    # boundary: exactly gap_minutes stays in-session
    assert out[8]["is_session_start"] is False


def test_session_stats(spark):
    stats = {
        (r["user_id"], r["session_index"]): r
        for r in session_stats(sessionize(_events(spark), gap_minutes=30)).collect()
    }
    assert stats[(1, 1)]["n_events"] == 3
    assert stats[(1, 1)]["duration_s"] == 1200
    assert stats[(1, 2)]["n_events"] == 2
    assert stats[(2, 1)]["duration_s"] == 0


# --- cohort_retention -------------------------------------------------


def test_cohort_retention_triangle(spark):
    import datetime as dt

    T = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1: first day 1, active day 1 and day 9 (period 1)
            (1, T(2024, 1, 1, 10)), (1, T(2024, 1, 1, 12)), (1, T(2024, 1, 9)),
            # user 2: same cohort day, only period 0
            (2, T(2024, 1, 1)),
            # user 3: cohort day 3, active period 0 and period 2 (day 18)
            (3, T(2024, 1, 3)), (3, T(2024, 1, 18)),
        ],
        "user_id long, ts timestamp",
    )
    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import cohort_retention

    out = {
        (r["cohort_date"].isoformat(), r["period"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-03", 0): 1,
        ("2024-01-03", 2): 1,
    }


def test_cohort_retention_period_zero_counts_every_user(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1 + u)) for u in range(1, 6)],
        "user_id long, ts timestamp",
    )
    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import cohort_retention

    out = cohort_retention(ev)
    p0 = out.filter(F.col("period") == 0).agg(F.sum("n_users")).collect()[0][0]
    assert p0 == 5  # everyone is active in their own cohort period


# --- built-in session windows vs gap-and-island ----------------------


def test_session_window_counts_equals_sessionize_rollup(spark):
    """Spark's native session_window must reproduce the hand-rolled
    lag/cumsum sessionization on the real fixture."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        session_stats,
        sessionize,
    )
    from healthcare_data_lakehouse_using_gcp_spark.sources.readers import load_table
    from healthcare_data_lakehouse_using_gcp_spark.streaming.pipeline import (
        session_window_counts,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "ts"
    )
    native = session_window_counts(ev, gap_seconds=1800)
    classic = session_stats(sessionize(ev, gap_minutes=30))
    got = {
        (r["user_id"], r["n_events"], r["duration_s"] - 1800)
        for r in native.collect()
    }
    want = {
        (r["user_id"], r["n_events"], r["duration_s"])
        for r in classic.collect()
    }
    # native duration includes the closing gap (end = last + gap)
    assert got == want
    assert native.count() == classic.count()


def test_session_window_exact_gap_boundary_merges(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.streaming.pipeline import (
        session_window_counts,
    )

    T = dt.datetime
    ev = spark.createDataFrame(
        [
            (1, 1, T(2024, 1, 1, 0, 0, 0)),
            (1, 2, T(2024, 1, 1, 0, 30, 0)),   # exactly gap later → merges
            (1, 3, T(2024, 1, 1, 1, 0, 1)),    # gap + 1 s → new session
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = session_window_counts(ev, gap_seconds=1800).orderBy("session_start")
    rows = out.collect()
    assert [r["n_events"] for r in rows] == [2, 1]
    assert rows[0]["duration_s"] == 1800 + 1800  # 30 min span + closing gap


def test_repeat_event_within_flags_only_horizon_hits(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        repeat_event_within,
    )

    T = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1, type a: d0 → d10 (repeat), d10 → d50 (40d gap, no),
            # d50 last (no next)
            (1, 1, "a", T(2024, 1, 1)),
            (1, 2, "a", T(2024, 1, 11)),
            (1, 3, "a", T(2024, 2, 20)),
            # user 1, type b: single event — never a repeat source
            (1, 4, "b", T(2024, 1, 5)),
            # user 2, type a: exactly 30 days later — boundary INCLUDES
            (2, 5, "a", T(2024, 3, 1)),
            (2, 6, "a", T(2024, 3, 31)),
            # user 3, type a: same-type event of ANOTHER user inside the
            # horizon must NOT flag user 3
            (3, 7, "a", T(2024, 3, 2)),
        ],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    out = {
        r["event_type"]: r
        for r in repeat_event_within(ev, within_days=30).collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_events"], a["n_repeats"]) == (6, 2)  # d0→d10 and the =30d pair
    assert (b["n_events"], b["n_repeats"]) == (1, 0)
    assert a["repeat_rate"] == 0.3333  # floor(2/6*1e4+0.5)/1e4
    assert b["repeat_rate"] == 0.0


def test_attribution_last_touch_horizon_ties_and_direct(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        attribution_last_touch,
    )

    T = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1: click d1, view d3, purchase d5 → last touch = view
            (1, 1, "click", T(2024, 1, 1)),
            (2, 1, "view", T(2024, 1, 3)),
            (3, 1, "purchase", T(2024, 1, 5)),
            # user 2: view d1, purchase d20 → touch outside 7d → direct
            (4, 2, "view", T(2024, 1, 1)),
            (5, 2, "purchase", T(2024, 1, 20)),
            # user 3: no touches at all → direct
            (6, 3, "purchase", T(2024, 1, 10)),
            # user 4: tie — click AND view at the same instant; max
            # event_id (the view, id 8) must win deterministically
            (7, 4, "click", T(2024, 2, 1, 12, 0, 0)),
            (8, 4, "view", T(2024, 2, 1, 12, 0, 0)),
            (9, 4, "purchase", T(2024, 2, 2)),
            # user 5: touch at the exact conversion instant → attributed
            (10, 5, "click", T(2024, 3, 1, 9, 0, 0)),
            (11, 5, "purchase", T(2024, 3, 1, 9, 0, 0)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r["channel"]: r for r in attribution_last_touch(ev).collect()}
    assert out["view"]["n_conversions"] == 2  # users 1 and 4
    assert out["click"]["n_conversions"] == 1  # user 5 same-instant
    assert out["direct"]["n_conversions"] == 2  # users 2 and 3
    assert out["view"]["share"] == 0.4
    assert out["direct"]["share"] == 0.4
    assert out["click"]["share"] == 0.2


def test_attribution_last_touch_null_users_go_direct(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        attribution_last_touch,
    )

    T = dt.datetime
    # NULL-user rows must never cross-credit each other: the NULL-user
    # purchase is unattributable (direct), matching equi-join semantics
    ev = spark.createDataFrame(
        [
            (1, None, "click", T(2024, 1, 1)),
            (2, None, "purchase", T(2024, 1, 2)),
            (3, 7, "view", T(2024, 1, 1)),
            (4, 7, "purchase", T(2024, 1, 2)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r["channel"]: r["n_conversions"] for r in attribution_last_touch(ev).collect()}
    assert out == {"direct": 1, "view": 1}


def test_interarrival_stats_gaps_and_percentiles(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        interarrival_stats,
    )

    T = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1, type a: gaps 60 s and 120 s
            (1, 1, "a", T(2024, 1, 1, 0, 0, 0)),
            (2, 1, "a", T(2024, 1, 1, 0, 1, 0)),
            (3, 1, "a", T(2024, 1, 1, 0, 3, 0)),
            # user 2, type a: gap 300 s — cross-user gaps never mix
            (4, 2, "a", T(2024, 1, 1, 1, 0, 0)),
            (5, 2, "a", T(2024, 1, 1, 1, 5, 0)),
            # type b: single event per user → no gaps at all
            (6, 1, "b", T(2024, 1, 2)),
            (7, 2, "b", T(2024, 1, 3)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {r["event_type"]: r for r in interarrival_stats(ev).collect()}
    a = out["a"]
    assert a["n_gaps"] == 3  # 60, 120, 300
    assert a["mean_gap_s"] == 160.0
    assert a["p50_gap_s"] == 120.0
    # p90 of sorted [60,120,300]: h = 1.8 → 120 + 0.8·180 = 264
    assert a["p90_gap_s"] == 264.0
    assert "b" not in out  # gap-less types emit nothing


def test_churn_flows_set_decomposition(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import (
        churn_flows,
    )

    T = dt.datetime
    # Jan: users 1,2,3 · Feb: users 2,3,4 · Apr: user 5 (Mar missing —
    # the Feb→Apr gap must NOT be treated as consecutive)
    ev = spark.createDataFrame(
        [
            (1, 1, T(2024, 1, 5)),
            (2, 2, T(2024, 1, 10)),
            (3, 3, T(2024, 1, 15)),
            (4, 2, T(2024, 2, 1)),
            (5, 3, T(2024, 2, 20)),
            (6, 4, T(2024, 2, 28)),
            (7, 5, T(2024, 4, 2)),
            # duplicate activity inside one month: must not double-count
            (8, 2, T(2024, 1, 11)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r["m"].isoformat(): r for r in churn_flows(ev).collect()}
    assert list(out) == ["2024-01-01"]  # Feb has no observed March
    jan = out["2024-01-01"]
    assert jan["active_users"] == 3
    assert jan["retained_next"] == 2  # users 2, 3
    assert jan["churned_next"] == 1  # user 1
    assert jan["new_next"] == 1  # user 4
