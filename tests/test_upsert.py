"""Idempotent merge-upsert zone tests (ROADMAP 3): replayed batches
converge, untouched partitions are never rewritten."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.sources.upsert import merge_upsert


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "patient_id string, event_date string, heart_rate int, processed_at string"
    )
    return df.withColumns(
        {
            "event_date": F.col("event_date").cast("date"),
            "processed_at": F.col("processed_at").cast("timestamp_ntz"),
        }
    )


def _snapshot(spark, path):
    return {
        (r["patient_id"], str(r["event_date"])): (r["heart_rate"], str(r["processed_at"]))
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_latest_version_wins_and_replay_idempotent(spark, tmp_path):
    path = str(tmp_path / "vitals")
    keys = ["patient_id", "event_date"]

    b1 = _batch(spark, [
        ("P1", "2024-06-01", 70, "2024-06-01T10:00:00"),
        ("P2", "2024-06-01", 80, "2024-06-01T10:00:00"),
        ("P3", "2024-05-31", 90, "2024-06-01T10:00:00"),
    ])
    merge_upsert(spark, b1, path, keys)
    assert len(_snapshot(spark, path)) == 3

    # second batch: updates P1 (newer version), adds P4; P3's old
    # partition is untouched
    b2 = _batch(spark, [
        ("P1", "2024-06-01", 75, "2024-06-01T11:00:00"),
        ("P4", "2024-06-01", 65, "2024-06-01T11:00:00"),
    ])
    merge_upsert(spark, b2, path, keys)
    snap = _snapshot(spark, path)
    assert len(snap) == 4
    assert snap[("P1", "2024-06-01")][0] == 75  # newer version won
    assert snap[("P2", "2024-06-01")][0] == 80  # same-partition key kept
    assert snap[("P3", "2024-05-31")][0] == 90  # untouched partition kept

    # REPLAY b2 (at-least-once delivery): table must not change
    merge_upsert(spark, b2, path, keys)
    assert _snapshot(spark, path) == snap

    # stale replay of b1: older versions must NOT overwrite newer rows
    merge_upsert(spark, b1, path, keys)
    assert _snapshot(spark, path) == snap


def test_upsert_null_partition_rows_survive_merge(spark, tmp_path):
    """Rows whose partition value is NULL land in the hive default
    partition; a later batch that ALSO carries NULL-partition rows must
    merge with them, not silently replace that partition."""
    path = str(tmp_path / "nullpart")
    keys = ["patient_id", "event_date"]
    b1 = _batch(spark, [
        ("P1", None, 70, "2024-06-01T10:00:00"),
        ("P2", "2024-06-01", 80, "2024-06-01T10:00:00"),
    ])
    merge_upsert(spark, b1, path, keys)
    b2 = _batch(spark, [
        ("P3", None, 65, "2024-06-01T11:00:00"),
    ])
    merge_upsert(spark, b2, path, keys)
    snap = _snapshot(spark, path)
    assert len(snap) == 3
    assert snap[("P1", "None")][0] == 70  # prior NULL-partition row kept
    assert snap[("P3", "None")][0] == 65


def test_upsert_missing_table_vs_read_error(spark, tmp_path):
    """A missing path is first-write; an unreadable EXISTING path must
    raise, never silently overwrite partitions with only the batch."""
    import pytest

    path = str(tmp_path / "broken")
    b = _batch(spark, [("P1", "2024-06-01", 70, "2024-06-01T10:00:00")])
    merge_upsert(spark, b, path, ["patient_id", "event_date"])  # first write OK

    # corrupt the table: parquet footer unreadable
    import os
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "wb") as fh:
                    fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        merge_upsert(spark, b, path, ["patient_id", "event_date"])


def test_upsert_intra_batch_duplicates_collapse(spark, tmp_path):
    path = str(tmp_path / "dups")
    b = _batch(spark, [
        ("P1", "2024-06-01", 70, "2024-06-01T10:00:00"),
        ("P1", "2024-06-01", 71, "2024-06-01T10:30:00"),
        ("P1", "2024-06-01", 72, "2024-06-01T09:00:00"),
    ])
    n = merge_upsert(spark, b, path, ["patient_id", "event_date"])
    assert n == 1
    assert _snapshot(spark, path)[("P1", "2024-06-01")][0] == 71  # max version
