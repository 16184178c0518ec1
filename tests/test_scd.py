"""SCD2 dimension versioning (operators/scd): interval construction,
incremental-merge ≡ full-rebuild equivalence, as-of lookup, and the
fail-loud guard against history-corrupting late batches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators import scd

T = dt.datetime


def log_df(spark, rows):
    return spark.createDataFrame(
        rows, "patient_id long, ts timestamp, plan string, change_id long"
    )


LOG1 = [
    (1, T(2024, 1, 1), "bronze", 1),
    (1, T(2024, 3, 1), "silver", 2),
    (2, T(2024, 2, 1), "gold", 3),
]
LOG2 = [
    (1, T(2024, 6, 1), "gold", 4),
    (3, T(2024, 5, 1), "bronze", 5),
]


def test_snapshot_intervals(spark):
    hist = {
        (r["patient_id"], r["plan"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd.scd2_snapshot(
            log_df(spark, LOG1), ["patient_id"], "ts", tie_break="change_id"
        ).collect()
    }
    assert hist[(1, "bronze")] == (T(2024, 1, 1), T(2024, 3, 1), False)
    assert hist[(1, "silver")] == (T(2024, 3, 1), None, True)
    assert hist[(2, "gold")] == (T(2024, 2, 1), None, True)


def test_merge_equals_full_rebuild(spark):
    base = scd.scd2_snapshot(
        log_df(spark, LOG1), ["patient_id"], "ts", tie_break="change_id"
    )
    merged = scd.scd2_merge(
        base, log_df(spark, LOG2), ["patient_id"], "ts", tie_break="change_id"
    )
    rebuilt = scd.scd2_snapshot(
        log_df(spark, LOG1 + LOG2), ["patient_id"], "ts", tie_break="change_id"
    )
    key = lambda r: (r["patient_id"], r["change_id"])
    assert sorted(map(tuple, merged.collect()), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, rebuilt.collect()), key=lambda t: (t[0], t[3])
    )
    # old version of patient 1 is now closed, new one current
    cur = {r["patient_id"]: r["plan"] for r in merged.filter("is_current").collect()}
    assert cur == {1: "gold", 2: "gold", 3: "bronze"}


def test_merge_rejects_late_batch(spark):
    base = scd.scd2_snapshot(
        log_df(spark, LOG1), ["patient_id"], "ts", tie_break="change_id"
    )
    late = log_df(spark, [(1, T(2024, 2, 1), "rewritten", 9)])  # before silver
    with pytest.raises(ValueError, match="older than"):
        scd.scd2_merge(base, late, ["patient_id"], "ts", tie_break="change_id")


def test_asof_lookup(spark):
    hist = scd.scd2_snapshot(
        log_df(spark, LOG1 + LOG2), ["patient_id"], "ts", tie_break="change_id"
    )
    facts = spark.createDataFrame(
        [
            (100, 1, T(2024, 2, 15)),  # during bronze
            (101, 1, T(2024, 3, 1)),   # boundary: silver starts (inclusive)
            (102, 1, T(2024, 12, 1)),  # current gold
            (103, 2, T(2024, 1, 15)),  # before any version → NULL
            (104, 9, T(2024, 6, 1)),   # unknown key → NULL
        ],
        "claim_id long, patient_id long, claim_ts timestamp",
    )
    out = {
        r["claim_id"]: r["plan"]
        for r in scd.scd2_lookup(facts, hist, ["patient_id"], "claim_ts").collect()
    }
    assert out == {100: "bronze", 101: "silver", 102: "gold", 103: None, 104: None}
    # every fact row survives exactly once (intervals are disjoint)
    assert scd.scd2_lookup(facts, hist, ["patient_id"], "claim_ts").count() == 5


# --- snapshot_diff (batch CDC) ---------------------------------------


def snap_df(spark, rows):
    return spark.createDataFrame(rows, "id long, status string, amount double")


def test_snapshot_diff_labels_and_drops_unchanged(spark):
    old = snap_df(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)])
    new = snap_df(spark, [(2, "b", 20.0), (3, "c", 31.0), (4, "d", None), (5, "e", 50.0)])
    out = scd.snapshot_diff(old, new, ["id"], ["status", "amount"])
    rows = {r["id"]: r for r in out.collect()}
    # 1 deleted, 3 updated, 5 inserted; 2 unchanged and 4 (null==null
    # under null-safe compare) dropped
    assert set(rows) == {1, 3, 5}
    assert rows[1]["change_type"] == "delete" and rows[1]["new_status"] is None
    assert rows[3]["change_type"] == "update"
    assert rows[3]["old_amount"] == 30.0 and rows[3]["new_amount"] == 31.0
    assert rows[5]["change_type"] == "insert" and rows[5]["old_status"] is None


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = snap_df(spark, [(1, "a", None)])
    new = snap_df(spark, [(1, "a", 5.0)])
    out = scd.snapshot_diff(old, new, ["id"]).collect()
    assert len(out) == 1 and out[0]["change_type"] == "update"


def test_snapshot_diff_default_compare_cols_exclude_keys(spark):
    old = snap_df(spark, [(1, "a", 1.0)])
    new = snap_df(spark, [(1, "a", 1.0)])
    assert scd.snapshot_diff(old, new, ["id"]).count() == 0


def test_snapshot_diff_feeds_scd2_merge_shape(spark):
    """The update/insert rows carry exactly the new-side values an
    SCD2 merge needs; deletes carry only old-side state."""
    old = snap_df(spark, [(1, "a", 1.0)])
    new = snap_df(spark, [(1, "b", 1.0), (2, "x", 9.0)])
    out = scd.snapshot_diff(old, new, ["id"], ["status"])
    got = {(r["id"], r["change_type"], r["new_status"]) for r in out.collect()}
    assert got == {(1, "update", "b"), (2, "insert", "x")}
