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
