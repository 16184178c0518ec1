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
