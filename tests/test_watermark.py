"""Watermark / late-data handling (beyond-reference extension,
SURVEY.md §2.8): append-mode windowed aggregation only finalizes
windows once the watermark passes, and drops too-late rows.

Three sequential availableNow runs over one checkpoint give a
deterministic watermark progression (the watermark advances at the
END of each run, from that run's max event time)."""

from __future__ import annotations

import json
import os

from healthcare_data_lakehouse_using_gcp_spark.operators.etl import parse_envelope
from healthcare_data_lakehouse_using_gcp_spark.streaming.pipeline import windowed_counts


def _write(path, rows, idx):
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/b{idx:03d}.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def test_append_mode_drops_late_rows(spark, cfg, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def mk(ts):
        return {
            "data_type": "patient_vitals",
            "patient_id": "P1",
            "timestamp": ts,
            "heart_rate": 80,
            "ingest_timestamp": ts,
        }

    def run_once():
        stream = spark.readStream.text(inp)
        parsed = parse_envelope(stream, cfg)
        q = (
            windowed_counts(
                parsed, ts_col="timestamp", window_seconds=60, watermark_seconds=120
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two events in window [10:00, 10:01) → wm ends at 09:58:20
    _write(inp, [mk("2024-06-01T10:00:10"), mk("2024-06-01T10:00:20")], 1)
    run_once()
    # run 2: event at 10:10 → wm advances to 10:08 at END of run
    _write(inp, [mk("2024-06-01T10:10:00")], 2)
    run_once()
    # run 3: LATE event for the first window (10:00:30 < wm 10:08) —
    # dropped; and the first window (end 10:01 < wm) finalizes with
    # only its on-time rows
    _write(inp, [mk("2024-06-01T10:00:30")], 3)
    run_once()

    rows = {
        str(r["window_start"]): r["record_count"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows.get("2024-06-01 10:00:00") == 2, rows  # late row dropped
    assert "2024-06-01 10:10:00" not in rows  # still-open window unemitted


def test_t3_accumulating_divergence_update_mode(spark, cfg, tmp_path):
    """The documented T3 divergence, exercised end-to-end (VERDICT r4
    item 8; SURVEY §2.8): the reference's Beam pipeline runs
    AccumulationMode.ACCUMULATING with NO watermark
    (healthcare_etl_pipeline.py:259-263) — a late event re-fires its
    window with an updated count FOREVER. Our closest analogue is
    outputMode("update"), which matches the re-fire behavior only
    WITHIN the watermark and intentionally diverges beyond it:

      run 2 — a late-but-within-watermark event re-emits its window
        with the updated count (the ACCUMULATING behavior);
      run 3 — an event older than the watermark is DROPPED and the
        window is NOT re-fired (the reference would emit count 4;
        we emit nothing — bounded state is the point of the
        divergence at 100 TB stream scale).
    """
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple[int, str, int]] = []

    def mk(ts):
        return {
            "data_type": "patient_vitals",
            "patient_id": "P1",
            "timestamp": ts,
            "heart_rate": 80,
            "ingest_timestamp": ts,
        }

    def run_once(idx):
        stream = spark.readStream.text(inp)
        parsed = parse_envelope(stream, cfg)

        def sink(bdf, _bid, _idx=idx):
            emitted.extend(
                (_idx, str(r["window_start"]), r["record_count"])
                for r in bdf.collect()
            )

        q = (
            windowed_counts(
                parsed, ts_col="timestamp", window_seconds=60, watermark_seconds=120
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two on-time events → window 10:00 fires with count 2;
    # watermark ends the run at 10:00:20 − 120 s = 09:58:20
    _write(inp, [mk("2024-06-01T10:00:10"), mk("2024-06-01T10:00:20")], 1)
    run_once(1)
    # run 2: 10:00:30 is late for its window but AHEAD of the 09:58:20
    # watermark → ACCUMULATING-style re-fire with count 3; the 10:10
    # event advances the watermark to 10:08 at end of run
    _write(inp, [mk("2024-06-01T10:00:30"), mk("2024-06-01T10:10:00")], 2)
    run_once(2)
    # run 3: 10:00:40 is BEHIND the 10:08 watermark → dropped, no
    # re-fire (the divergence: Beam ACCUMULATING would emit count 4)
    _write(inp, [mk("2024-06-01T10:00:40")], 3)
    run_once(3)

    w1 = "2024-06-01 10:00:00"
    got_w1 = [(i, c) for (i, w, c) in emitted if w == w1]
    assert got_w1 == [(1, 2), (2, 3)], emitted
    assert [(w, c) for (i, w, c) in emitted if i == 3] == [], emitted
