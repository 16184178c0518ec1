"""applyInPandasWithState operator test: per-patient alert episodes
across micro-batches."""

from __future__ import annotations

import pytest

import json

from healthcare_data_lakehouse_using_gcp_spark.streaming.stateful import alert_episodes

VITALS_SCHEMA = (
    "patient_id string, timestamp string, heart_rate int,"
    "oxygen_saturation int, temperature double"
)


def _write_batch(path, rows, idx):
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/b{idx:03d}.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def test_alert_episodes_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    # batch 1: P1 two consecutive alerts (streak stays open in state)
    _write_batch(
        inp,
        [
            {"patient_id": "P1", "timestamp": "2024-06-01T10:00:00", "heart_rate": 120,
             "oxygen_saturation": 98, "temperature": 36.8},
            {"patient_id": "P1", "timestamp": "2024-06-01T10:01:00", "heart_rate": 130,
             "oxygen_saturation": 98, "temperature": 36.8},
            {"patient_id": "P2", "timestamp": "2024-06-01T10:00:30", "heart_rate": 80,
             "oxygen_saturation": 99, "temperature": 36.5},
        ],
        1,
    )
    # batch 2 (same dir, second file): P1 normal reading closes the
    # episode. Distinct mtime — the file source orders batches by
    # modification time, and same-second writes tie unpredictably.
    import time

    time.sleep(2)
    _write_batch(
        inp,
        [
            {"patient_id": "P1", "timestamp": "2024-06-01T10:02:00", "heart_rate": 80,
             "oxygen_saturation": 99, "temperature": 36.6},
            {"patient_id": "P2", "timestamp": "2024-06-01T10:02:30", "heart_rate": 85,
             "oxygen_saturation": 99, "temperature": 36.5},
        ],
        2,
    )
    stream = (
        spark.readStream.schema(VITALS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(inp)
    )
    import time

    q = (
        alert_episodes(stream, timeout_ms=3000)
        .writeStream.format("memory")
        .queryName("episodes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # the query can stay alive waiting on state timers; poll for the
    # expected episode instead of awaiting full termination
    deadline = time.time() + 120
    rows = []
    while time.time() < deadline:
        rows = spark.sql("SELECT * FROM episodes").collect()
        if any(r["patient_id"] == "P1" for r in rows):
            break
        if not q.isActive:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)
    eps = {r["patient_id"]: r for r in rows}
    assert "P1" in eps, f"expected P1 episode, got {rows}"
    assert eps["P1"]["alert_count"] == 2
    assert eps["P1"]["closed_by"] == "normal_reading"
    assert eps["P1"]["first_alert_ts"] == "2024-06-01T10:00:00"
    assert "P2" not in eps  # never alerted


@pytest.mark.slow  # ~3 min of mtime-sequenced micro-batches (round-close battery)
def test_streaming_sessions_gap_and_cross_batch(spark, tmp_path):
    """Gap-based streaming sessionization: a > gap jump closes the
    session even when the jump spans micro-batches; within-gap events
    extend it."""
    import time

    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.streaming.stateful import (
        streaming_sessions,
    )

    inp = str(tmp_path / "sess_in")
    # batch 1: u1 two close events; u2 one event
    _write_batch(
        inp,
        [
            {"user_id": 1, "ts": "2024-06-01T10:00:00"},
            {"user_id": 1, "ts": "2024-06-01T10:05:00"},
            {"user_id": 2, "ts": "2024-06-01T09:00:00"},
        ],
        1,
    )
    time.sleep(2)
    # batch 2: u1 jumps 3 hours (gap 30 min) -> closes session 1 and
    # opens a new one that stays in state (not emitted)
    _write_batch(
        inp,
        [
            {"user_id": 1, "ts": "2024-06-01T13:00:00"},
        ],
        2,
    )
    stream = (
        spark.readStream.schema("user_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(inp)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        streaming_sessions(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sess_out").collect()
    # u1's first session MUST close by gap. The still-open sessions
    # (u2's, u1's second) either stay in state or — if wall time
    # between micro-batches exceeded the processing-time timeout —
    # close by timeout; both are correct, so accept either.
    gap_rows = [r for r in rows if r["closed_by"] == "gap"]
    assert len(gap_rows) == 1
    r = gap_rows[0]
    assert r["user_id"] == 1 and r["n_events"] == 2
    assert r["session_start"].startswith("2024-06-01 10:00")
    assert r["session_end"].startswith("2024-06-01 10:05")
    for other in rows:
        if other["closed_by"] == "timeout":
            assert (other["user_id"], other["n_events"]) in {(1, 1), (2, 1)}


def test_streaming_funnel_matches_batch_funnel(spark, tmp_path):
    """Strict-order funnel advances across micro-batches; the emitted
    per-rung rows aggregate to the batch funnel's conversion ladder,
    and rungs reached out of strict order never count."""
    import time

    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import funnel
    from healthcare_data_lakehouse_using_gcp_spark.streaming.stateful import (
        streaming_funnel,
    )

    steps = ["view", "cart", "buy"]
    # u1 completes the ladder across batches; u2 stops at cart;
    # u3's buy PRECEDES its cart (strict order: buy must not count)
    batch1 = [
        {"user_id": 1, "event_type": "view", "ts": "2024-06-01T10:00:00"},
        {"user_id": 2, "event_type": "view", "ts": "2024-06-01T10:00:30"},
        {"user_id": 3, "event_type": "view", "ts": "2024-06-01T10:01:00"},
        {"user_id": 3, "event_type": "buy", "ts": "2024-06-01T10:01:30"},
        {"user_id": 1, "event_type": "cart", "ts": "2024-06-01T10:02:00"},
    ]
    batch2 = [
        {"user_id": 2, "event_type": "cart", "ts": "2024-06-01T10:10:00"},
        {"user_id": 3, "event_type": "cart", "ts": "2024-06-01T10:11:00"},
        {"user_id": 1, "event_type": "buy", "ts": "2024-06-01T10:12:00"},
    ]
    inp = str(tmp_path / "funnel_in")
    _write_batch(inp, batch1, 1)
    time.sleep(2)
    _write_batch(inp, batch2, 2)

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(inp)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        streaming_funnel(stream, steps)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["step"], r["user_id"]): r["step_index"]
        for r in spark.sql("select * from funnel_out").collect()
    }
    assert got == {
        ("view", 1): 1, ("view", 2): 1, ("view", 3): 1,
        ("cart", 1): 2, ("cart", 2): 2, ("cart", 3): 2,
        ("buy", 1): 3,  # u3's early buy must NOT appear
    }

    # live ladder == batch funnel over the same events
    all_rows = [dict(r) for r in batch1 + batch2]
    bdf = spark.createDataFrame(
        [(r["user_id"], r["event_type"], r["ts"]) for r in all_rows],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expected = {
        (r["step_index"], r["step"]): r["n_users"]
        for r in funnel(bdf, steps).collect()
    }
    live = {}
    for (step, _), idx in got.items():
        live[(idx, step)] = live.get((idx, step), 0) + 1
    assert live == expected


def test_msprt_monitor_stream_matches_batch_operator(spark, tmp_path):
    """Cross-batch streaming monitor == the batch msprt operator when
    both use the same pre-registered sigma2; late periods are dropped
    and counted, never folded out of order."""
    import math
    import time

    from healthcare_data_lakehouse_using_gcp_spark.streaming.stateful import (
        msprt_monitor_stream,
    )

    xs = [3.0, -1.0, 4.0, 1.0, -5.0, 9.0, 2.0, -6.0]
    inp = str(tmp_path / "msprt_in")
    _write_batch(
        inp,
        [{"group": "g", "period": d, "x": x} for d, x in enumerate(xs[:4])],
        1,
    )
    time.sleep(2)
    _write_batch(
        inp,
        # second batch: remaining periods + one LATE duplicate of
        # period 1 (must be dropped + counted)
        [{"group": "g", "period": d + 4, "x": x} for d, x in enumerate(xs[4:])]
        + [{"group": "g", "period": 1, "x": 99.0}],
        2,
    )
    stream = (
        spark.readStream.schema("group string, period long, x double")
        .option("maxFilesPerTrigger", 1)
        .json(inp)
    )
    sigma2 = 20.0
    h = 4.0
    out_rows = []
    q = (
        msprt_monitor_stream(stream, mixture_h=h, alpha=0.1, sigma2=sigma2)
        .writeStream.format("memory")
        .queryName("msprt_mon")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out_rows = spark.sql(
            "SELECT * FROM msprt_mon ORDER BY period"
        ).collect()
    finally:
        q.stop()
    assert [r["period"] for r in out_rows] == list(range(8))
    # independent replication with the same fixed sigma2
    run_max = None
    for i, r in enumerate(out_rows):
        n = i + 1
        dbar = sum(xs[: i + 1]) / n
        ll = 0.5 * math.log(sigma2 / (sigma2 + n * h)) + (
            n * n * dbar * dbar * h
        ) / (2 * sigma2 * (sigma2 + n * h))
        run_max = ll if run_max is None else max(run_max, ll)
        assert abs(r["log_lambda"] - ll) < 1e-9
        assert abs(r["p_always_valid"] - min(1.0, math.exp(-run_max))) < 1e-9
        assert abs(r["cum_mean_diff"] - dbar) < 1e-9
    # the late period-1 row was dropped and surfaced in the counter
    assert out_rows[-1]["n_late_dropped"] == 1
    assert all(r["n_late_dropped"] == 0 for r in out_rows[:4])


def test_msprt_monitor_stream_multi_chunk_batch(spark, tmp_path):
    """A group spanning MULTIPLE Arrow chunks within one micro-batch
    must fold all rows in period order — Spark guarantees nothing
    about cross-chunk ordering, so the operator materializes and
    sorts the whole batch before folding. Regression: chunk-local
    sorting would mis-drop in-batch rows as 'late' (ADVICE r13).
    maxRecordsPerBatch=2 forces the 8-row group across 4 chunks, and
    the file carries the periods REVERSED so any chunk-local sort
    sees later periods first."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.streaming.stateful import (
        msprt_monitor_stream,
    )

    xs = [3.0, -1.0, 4.0, 1.0, -5.0, 9.0, 2.0, -6.0]
    inp = str(tmp_path / "msprt_chunks")
    _write_batch(
        inp,
        [
            {"group": "g", "period": d, "x": xs[d]}
            for d in reversed(range(8))
        ],
        1,
    )
    sigma2 = 20.0
    h = 4.0
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema("group string, period long, x double")
            .json(inp)
        )
        q = (
            msprt_monitor_stream(stream, mixture_h=h, alpha=0.1, sigma2=sigma2)
            .writeStream.format("memory")
            .queryName("msprt_chunked")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            out_rows = spark.sql(
                "SELECT * FROM msprt_chunked ORDER BY period"
            ).collect()
        finally:
            q.stop()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    # every period folded exactly once, nothing mis-dropped as late
    assert [r["period"] for r in out_rows] == list(range(8))
    assert all(r["n_late_dropped"] == 0 for r in out_rows)
    run_max = None
    for i, r in enumerate(out_rows):
        n = i + 1
        dbar = sum(xs[: i + 1]) / n
        ll = 0.5 * math.log(sigma2 / (sigma2 + n * h)) + (
            n * n * dbar * dbar * h
        ) / (2 * sigma2 * (sigma2 + n * h))
        run_max = ll if run_max is None else max(run_max, ll)
        assert abs(r["log_lambda"] - ll) < 1e-9
        assert abs(r["cum_mean_diff"] - dbar) < 1e-9
        assert abs(r["p_always_valid"] - min(1.0, math.exp(-run_max))) < 1e-9
