"""profile_table tests: stats correctness incl. nulls, approx mode,
single-pass plan shape."""

from __future__ import annotations

from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 5.0), (4, "b", 7.5)],
        "id bigint, s string, v double",
    )


def test_profile_counts_and_extremes(spark):
    prof = {r["column_name"]: r for r in profile_table(_df(spark)).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["n_distinct"] == 2
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["s"]["min_value"] == "a" and prof["s"]["max_value"] == "b"


def test_profile_approx_mode_single_pass(spark):
    df = _df(spark)
    prof = {r["column_name"]: r for r in profile_table(df, approx=True).collect()}
    assert prof["s"]["n_distinct"] == 2  # HLL exact at tiny cardinality
    # exact mode EXPANDs the input once per distinct column; approx
    # mode must not
    exact_plan = profile_table(df)._jdf.queryExecution().sparkPlan().toString()
    approx_plan = profile_table(df, approx=True)._jdf.queryExecution().sparkPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    # ADVICE r16 / optimization r17: approx is the documented 100 TB
    # single-pass path — the exact-mode string min/max split (a second
    # scan cross-joined back) must NOT apply to it. One source scan,
    # no join of any kind in the plan.
    assert approx_plan.count("Scan ExistingRDD") + approx_plan.count(
        "Scan parquet"
    ) == 1, approx_plan
    assert "Join" not in approx_plan, approx_plan


def test_profile_column_subset(spark):
    rows = profile_table(_df(spark), ["id"]).collect()
    assert [r["column_name"] for r in rows] == ["id"]


def test_profile_exact_mode_never_sorts(spark):
    # Optimization r16 (guide §2.3/§5): string min/max used to ride in
    # the same aggregate as the exact-distinct Expand pass, whose
    # grouping keys + the immutable string buffer forced a
    # SortAggregate with a REAL Sort of the N×-expanded input. They
    # now live in a separate global (grouping-key-free, hence
    # sort-free) aggregate: the plan must carry a HashAggregate for
    # the expanded distinct pass and no Sort node anywhere.
    import re

    plan = profile_table(_df(spark))._jdf.queryExecution().sparkPlan().toString()
    assert "HashAggregate" in plan
    assert not re.search(r"\bSort \[", plan), plan
    # all-numeric profiles skip the second scan entirely
    numeric_plan = (
        profile_table(_df(spark), ["id", "v"])
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "SortAggregate" not in numeric_plan, numeric_plan


def test_partition_skew_detects_hot_partition(spark):
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import (
        key_skew,
        partition_skew,
        skew_stats,
    )

    # 90% of rows share one key → hash-repartitioning by it piles
    # them into a single partition
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("cold_"), F.col("id"))
        ).alias("k")
    )
    skewed = df.repartition(8, "k")
    stats = skew_stats(skewed)
    assert stats["n_partitions"] == 8
    assert stats["max_rows"] >= 9_000
    assert stats["skew_ratio"] >= 5.0
    # per-partition frame agrees with the summary
    counts = {r["partition_id"]: r["n_rows"] for r in partition_skew(skewed).collect()}
    assert max(counts.values()) == stats["max_rows"]

    # round-robin layout: near-even
    even = skew_stats(df.repartition(8))
    assert even["skew_ratio"] <= 1.5

    # key_skew names the culprit with its share
    top = key_skew(df, ["k"], k=3).collect()
    assert top[0]["k"] == "hot"
    assert top[0]["n_rows"] == 9_000
    assert abs(top[0]["share"] - 0.9) < 1e-6
    assert all(r["n_rows"] == 1 for r in top[1:])


# --- profile_drift ----------------------------------------------------


def test_profile_drift_classifies_all_statuses(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import (
        profile_drift,
        profile_table,
    )

    old = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z"), ("d", None)],
        "keep string, gone string",
    )
    new = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 3.0), ("zz", 4.0)],
        "keep string, fresh double",
    )
    out = {
        r["column_name"]: r
        for r in profile_drift(
            profile_table(old), profile_table(new), null_rate_tol=0.05
        ).collect()
    }
    assert out["gone"]["status"] == "removed"
    assert out["fresh"]["status"] == "added"
    k = out["keep"]
    # null rate 0 → 0.5 and max 'zz' > 'd' → drifted on both signals
    assert k["status"] == "drifted"
    assert k["null_rate_drifted"] and k["range_widened"]
    assert abs(k["null_rate_new"] - 0.5) < 1e-9


def test_profile_drift_stable_profile_is_ok(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import (
        profile_drift,
        profile_table,
    )

    df = spark.createDataFrame([("a", 1), ("b", 2)], "s string, n long")
    p = profile_table(df)
    out = profile_drift(p, p)
    assert {r["status"] for r in out.collect()} == {"ok"}
    assert all(r["distinct_ratio"] == 1.0 for r in out.collect())


# --- psi_drift --------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import psi_drift

    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    out = psi_drift(df, df, "v", bins=10, lo=0.0, hi=100.0)
    psi = sum(r["psi_contrib"] for r in out.collect())
    assert abs(psi) < 1e-12
    assert out.count() == 10  # full spine even for empty bins


def test_psi_detects_shift_and_localizes_it(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import psi_drift

    old = spark.createDataFrame([(float(i % 50),) for i in range(1000)], "v double")
    # new mass moves to the upper half
    new = spark.createDataFrame([(50.0 + float(i % 50),) for i in range(1000)], "v double")
    rows = {r["bin"]: r for r in psi_drift(old, new, "v", bins=10, lo=0.0, hi=100.0).collect()}
    psi = sum(r["psi_contrib"] for r in rows.values())
    assert psi > 0.25  # 'investigate' regime
    # contributions live where the mass moved, both directions
    assert rows[0]["psi_contrib"] > 0.01 and rows[9]["psi_contrib"] > 0.01


def test_psi_outliers_clamp_into_edge_bins(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.profiling import psi_drift

    old = spark.createDataFrame([(5.0,), (-100.0,)], "v double")
    new = spark.createDataFrame([(5.0,), (999.0,)], "v double")
    rows = {r["bin"]: r for r in psi_drift(old, new, "v", bins=4, lo=0.0, hi=8.0).collect()}
    assert rows[0]["p_old"] > rows[0]["p_new"]  # -100 clamps to bin 0
    assert rows[3]["p_new"] > rows[3]["p_old"]  # 999 clamps to bin 3
