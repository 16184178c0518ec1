"""Data-quality expectations (operators/expectations): check
semantics, single-pass plan, and the gate-feed shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.expectations import expect


def _results(df):
    return {r["check"]: (r["n_violations"], r["passed"]) for r in df.collect()}


def test_expect_all_check_kinds(spark):
    child = spark.createDataFrame(
        [
            (1, "a", 10.0, 100),
            (2, "a", 20.0, 100),
            (2, "zz", -5.0, 200),   # dup key, bad value, out of range
            (None, "b", 30.0, 999),  # null key, orphan FK
        ],
        "id long, status string, amount double, parent_id long",
    )
    parent = spark.createDataFrame([(100,), (200,)], "pid long")
    out = expect(
        child,
        not_null=["id"],
        unique=["id"],
        accepted_values={"status": ["a", "b"]},
        in_range={"amount": (0.0, 100.0)},
        foreign_keys=[("parent_id", parent, "pid")],
    )
    got = _results(out)
    assert got["not_null:id"] == (1, False)
    assert got["unique:id"] == (1, False)  # one extra copy of id=2
    assert got["accepted_values:status"] == (1, False)
    assert got["in_range:amount"] == (1, False)
    assert got["foreign_key:parent_id"] == (1, False)  # 999 orphaned


def test_expect_clean_table_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, status string")
    out = expect(df, not_null=["id", "status"], unique=["id"],
                 accepted_values={"status": ["a", "b"]})
    got = _results(out)
    assert all(v == (0, True) for v in got.values())
    assert len(got) == 4


def test_expect_columnar_checks_are_one_scan(spark):
    df = spark.createDataFrame([(1, "a", 5.0)], "id long, s string, v double")
    out = expect(
        df, not_null=["id", "s"], unique=["id"],
        accepted_values={"s": ["a"]}, in_range={"v": (0, 10)},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every columnar check folds into one aggregation over one scan
    assert plan.count("Scan ") <= 1


def test_expect_nulls_do_not_violate_value_checks(spark):
    # NULLs are not_null's business; accepted_values / in_range /
    # foreign_key skip them (dbt semantics)
    df = spark.createDataFrame(
        [(1, None, None, None)], "id long, s string, v double, fk long"
    )
    parent = spark.createDataFrame([(1,)], "pid long")
    got = _results(
        expect(df, accepted_values={"s": ["a"]}, in_range={"v": (0, 1)},
               foreign_keys=[("fk", parent, "pid")])
    )
    assert all(v == (0, True) for v in got.values())


def test_expectations_feed_the_severity_gate(spark):
    from healthcare_data_lakehouse_using_gcp_spark.config import GatePolicy
    from healthcare_data_lakehouse_using_gcp_spark.plans.reports import (
        expectations_gate,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "zz")], "id long, status string"
    )
    results = expect(df, unique=["id"], accepted_values={"status": ["a"]},
                     not_null=["id"])
    # default policy: any violation is an error
    statuses = expectations_gate(results)
    assert statuses["unique:id"] == "error"
    assert statuses["accepted_values:status"] == "error"
    assert statuses["not_null:id"] == "pass"
    # tolerant policy: small violation counts only warn
    lax = expectations_gate(results, GatePolicy(warn_if=0, error_if=10))
    assert lax["unique:id"] == "warn"
