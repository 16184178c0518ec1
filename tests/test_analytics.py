"""Distribution / time-series analytics operator tests (A10, W2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
    grouped_percentiles,
    trailing_window,
)


def test_grouped_percentiles_exact(spark):
    """Exact percentile matches numpy's linear interpolation."""
    import numpy as np

    vals = [1.0, 3.0, 7.0, 20.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    row = grouped_percentiles(df, ["grp"], "v").collect()[0]
    for p, col in [(25, "p25"), (50, "p50"), (75, "p75")]:
        assert abs(row[col] - float(np.percentile(vals, p))) < 1e-9


def test_grouped_percentiles_approx_mode(spark):
    """approx=True (sketch path for 100 TB cardinalities) stays within
    a loose tolerance on a well-behaved distribution."""
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 1001)], "grp string, v double"
    )
    row = grouped_percentiles(df, ["grp"], "v", probs=(0.5,), approx=True).collect()[0]
    assert abs(row["p50"] - 500.5) <= 10


def test_trailing_window_ma_and_delta(spark):
    days = [("a", f"2024-06-0{d}", n) for d, n in [(1, 10), (2, 20), (3, 30)]]
    df = spark.createDataFrame(days, "grp string, d string, n long").select(
        "grp", F.to_date("d").alias("d"), "n"
    )
    out = {
        str(r["d"]): r
        for r in trailing_window(df, ["grp"], "d", window_rows=7, value_col="n").collect()
    }
    assert out["2024-06-01"]["ma7"] == 10.0 and out["2024-06-01"]["delta_prev"] == 0
    assert out["2024-06-02"]["ma7"] == 15.0 and out["2024-06-02"]["delta_prev"] == 10
    assert out["2024-06-03"]["ma7"] == 20.0 and out["2024-06-03"]["delta_prev"] == 10


def test_trailing_window_frame_bounds(spark):
    """ROWS frame covers exactly the trailing N rows, not the whole
    partition."""
    rows = [("a", f"2024-06-{d:02d}", 1) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, d string, n long").select(
        "grp", F.to_date("d").alias("d"), "n"
    )
    out = trailing_window(df, ["grp"], "d", window_rows=3, value_col="n")
    assert all(r["ma3"] == 1.0 for r in out.collect())
    # varying values: day k has n=k, ma3 at day 10 = (8+9+10)/3
    df2 = spark.createDataFrame(
        [("a", f"2024-06-{d:02d}", d) for d in range(1, 11)],
        "grp string, d string, n long",
    ).select("grp", F.to_date("d").alias("d"), "n")
    last = sorted(
        trailing_window(df2, ["grp"], "d", window_rows=3, value_col="n").collect(),
        key=lambda r: str(r["d"]),
    )[-1]
    assert last["ma3"] == 9.0 and last["delta_prev"] == 1


def test_dispersion_stats_vs_numpy(spark):
    import numpy as np

    x = [1.0, 2.0, 4.0, 8.0]
    y = [2.0, 3.0, 5.0, 9.0]
    df = spark.createDataFrame(
        [("g", a, b) for a, b in zip(x, y)], "grp string, x double, y double"
    )
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        dispersion_stats,
    )

    r = dispersion_stats(df, ["grp"], "x", "y").collect()[0]
    assert abs(r["stddev"] - np.std(x, ddof=1)) < 1e-12
    assert abs(r["variance"] - np.var(x, ddof=1)) < 1e-12
    assert abs(r["corr"] - np.corrcoef(x, y)[0, 1]) < 1e-12
    assert abs(r["covar"] - np.cov(x, y, ddof=1)[0, 1]) < 1e-12


def test_approx_distinct_within_rsd(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        approx_distinct_counts,
    )

    df = spark.range(20000).selectExpr(
        "'g' AS grp", "id % 1000 AS a", "cast(id % 37 as string) AS b"
    )
    r = approx_distinct_counts(df, ["grp"], ["a", "b"], rsd=0.02).collect()[0]
    assert abs(r["approx_a"] - 1000) <= 1000 * 0.06
    assert abs(r["approx_b"] - 37) <= max(3, 37 * 0.06)


def test_funnel_strict_order(spark):
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.sessions import funnel

    rows = [
        # u1: full ordered funnel
        (1, "view", "2024-06-01T10:00:00"),
        (1, "click", "2024-06-01T10:01:00"),
        (1, "purchase", "2024-06-01T10:02:00"),
        # u2: clicked BEFORE viewing -> stops at view
        (2, "click", "2024-06-01T09:00:00"),
        (2, "view", "2024-06-01T09:30:00"),
        # u3: view+click only
        (3, "view", "2024-06-01T08:00:00"),
        (3, "click", "2024-06-01T08:10:00"),
        # u4: never viewed
        (4, "purchase", "2024-06-01T07:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["step"]: r["n_users"] for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_histogram_binning_and_clamp(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import histogram

    df = spark.createDataFrame(
        [(v,) for v in [0.1, 1.0, 2.5, 4.9, 5.0, 9.9, 42.0]], "v double"
    )
    # bounds [0, 10), 2 bins; 42 clamps into the top bucket
    out = {r["bucket"]: r for r in histogram(df, "v", bins=2, lo=0.0, hi=10.0).collect()}
    assert out[1]["n"] == 4 and out[1]["bucket_lo"] == 0.0 and out[1]["bucket_hi"] == 5.0
    assert out[2]["n"] == 3  # 5.0, 9.9 + clamped 42.0
    # auto-bounds path
    auto = histogram(df, "v", bins=4)
    assert sum(r["n"] for r in auto.collect()) == 7


def test_temperature_mixture_rates(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        stratified_sample,
        temperature_mixture_rates,
    )

    # big source: 10 docs x 100 tokens; small source: 2 docs x 100
    rows = [(i, "big", " ".join(["w"] * 100)) for i in range(10)]
    rows += [(100 + i, "small", " ".join(["w"] * 100)) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    # tau=1: natural mix — rates equal across sources (same budget share)
    r1 = temperature_mixture_rates(df, budget_tokens=600, temperature=1.0)
    assert abs(r1["big"] - 0.5) < 1e-9 and abs(r1["small"] - 0.5) < 1e-9
    # tau=0: uniform source weights — small source up-sampled to cap 1.0
    r0 = temperature_mixture_rates(df, budget_tokens=600, temperature=0.0)
    assert r0["small"] == 1.0
    assert r0["big"] < r1["big"] + 1e-9  # big source share shrinks
    # rates feed the deterministic sampler
    kept = stratified_sample(df, r0, strata_col="source")
    assert kept.count() <= 12


def test_pivot_table_counts_and_sums(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        melt,
        pivot_table,
    )

    rows = [
        ("d1", "click", 1.0), ("d1", "click", 2.0), ("d1", "view", 5.0),
        ("d2", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "date string, et string, v double")
    counts = {r["date"]: r for r in
              pivot_table(df, ["date"], "et", ["click", "view"]).collect()}
    assert (counts["d1"]["click"], counts["d1"]["view"]) == (2, 1)
    # absent combination is 0, not a missing row
    assert (counts["d2"]["click"], counts["d2"]["view"]) == (0, 1)
    sums = {r["date"]: r for r in
            pivot_table(df, ["date"], "et", ["click", "view"],
                        agg_col="v", agg="sum").collect()}
    assert sums["d1"]["click"] == 3.0
    assert sums["d2"]["click"] is None  # non-count aggs keep NULL

    # melt inverts the shape: one row per (input row x value column)
    wide = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], "k string, x double, y double"
    )
    long = melt(wide, ["k"], ["x", "y"]).collect()
    assert len(long) == 4
    assert {(r["k"], r["variable"], r["value"]) for r in long} == {
        ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0), ("b", "y", 4.0)
    }


def test_fill_daily_gaps_zero_and_ffill(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        fill_daily_gaps,
    )

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 5), ("a", d(2024, 1, 4), 7),
        ("b", d(2024, 1, 2), 1),
    ]
    df = spark.createDataFrame(rows, "g string, date date, n bigint")

    zero = {(r["g"], r["date"]): (r["n"], r["was_gap"])
            for r in fill_daily_gaps(df, ["g"], "date", "n", mode="zero").collect()}
    # dense span per group, zeros + flags on the holes
    assert zero[("a", d(2024, 1, 1))] == (5, False)
    assert zero[("a", d(2024, 1, 2))] == (0, True)
    assert zero[("a", d(2024, 1, 3))] == (0, True)
    assert zero[("a", d(2024, 1, 4))] == (7, False)
    assert zero[("b", d(2024, 1, 2))] == (1, False)
    assert len(zero) == 5  # group b's span is a single day

    ffill = {(r["g"], r["date"]): r["n"]
             for r in fill_daily_gaps(df, ["g"], "date", "n", mode="ffill").collect()}
    assert ffill[("a", d(2024, 1, 2))] == 5
    assert ffill[("a", d(2024, 1, 3))] == 5
    assert ffill[("a", d(2024, 1, 4))] == 7


def test_equidepth_histogram(spark):
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        equidepth_histogram,
    )

    df = spark.range(100).select((F.col("id") * 2).alias("v"), F.col("id").alias("k"))
    rows = {r["bucket"]: r for r in
            equidepth_histogram(df, "v", buckets=4, tie_break="k").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(r["n"] == 25 for r in rows.values())  # equal depth
    assert rows[1]["lo"] == 0 and rows[1]["hi"] == 48
    assert rows[4]["lo"] == 150 and rows[4]["hi"] == 198
    # buckets tile the domain in order
    assert rows[1]["hi"] < rows[2]["lo"] <= rows[2]["hi"] < rows[3]["lo"]


def test_winsorize_clips_to_group_bounds(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import winsorize

    rows = [("g", float(v)) for v in range(1, 101)] + [("h", 1000.0), ("h", 2000.0), ("h", 3000.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, ["grp"], "v", lo=0.10, hi=0.90)
    assert out.count() == len(rows)  # winsorize caps, never drops
    g = out.filter(F.col("grp") == "g")
    # exact p10/p90 of 1..100 (linear interpolation): 10.9 and 90.1
    b = g.select("v_lo", "v_hi").first()
    assert abs(b["v_lo"] - 10.9) < 1e-9 and abs(b["v_hi"] - 90.1) < 1e-9
    clipped = [r["v_clipped"] for r in g.collect()]
    assert abs(min(clipped) - 10.9) < 1e-9 and abs(max(clipped) - 90.1) < 1e-9
    # interior values untouched
    assert g.filter((F.col("v") == 50.0) & (F.col("v_clipped") == 50.0)).count() == 1
    # other group's bounds are its own
    h = out.filter(F.col("grp") == "h").select("v_lo").first()
    assert h["v_lo"] > 1000.0


def test_winsorize_bounds_join_is_broadcast(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import winsorize

    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "grp string, v double")
    plan = winsorize(df, ["grp"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fact table never re-shuffles


def test_mad_outliers_survive_what_zscore_misses(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import mad_outliers

    # One massive outlier inflates mean AND stddev so a 3-sigma rule
    # barely catches it and nothing else; MAD stays anchored to the
    # bulk and flags both planted points.
    bulk = [("g", float(v)) for v in range(100)]
    planted = [("g", 500.0), ("g", -400.0)]
    df = spark.createDataFrame(bulk + planted, "grp string, v double")
    out = mad_outliers(df, ["grp"], "v", k=3.0)
    assert out.count() == len(bulk) + len(planted)
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert flagged == {500.0, -400.0}


def test_mad_outliers_plan_is_broadcast_only(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import mad_outliers

    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "grp string, v double")
    plan = (
        mad_outliers(df, ["grp"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_time_weighted_avg_step_interpolation(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        time_weighted_avg,
    )

    T = dt.datetime
    # value 10 held for 30 s, then 20 for 10 s, last sample closes:
    # twavg = (10*30 + 20*10) / 40 = 12.5 — a plain AVG says 16.67
    rows = [
        ("g", T(2024, 1, 1, 0, 0, 0), 10.0),
        ("g", T(2024, 1, 1, 0, 0, 30), 20.0),
        ("g", T(2024, 1, 1, 0, 0, 40), 99.0),
        ("solo", T(2024, 1, 1), 7.0),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {r["grp"]: r for r in time_weighted_avg(df, ["grp"], "ts", "v").collect()}
    assert abs(out["g"]["twavg"] - 12.5) < 1e-9
    assert out["g"]["n_samples"] == 3 and out["g"]["span_s"] == 40
    # single-sample group falls back to the value, zero span
    assert out["solo"]["twavg"] == 7.0 and out["solo"]["span_s"] == 0


def test_trailing_percentile_frame_bounds(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        trailing_percentile,
    )

    rows = [("g", i, float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, d int, v double")
    out = {
        r["d"]: r["p50_3"]
        for r in trailing_percentile(
            df, ["grp"], "d", "v", prob=0.5, window_rows=3
        ).collect()
    }
    assert out[1] == 1.0          # frame = [1]
    assert out[2] == 1.5          # median of [1, 2] interpolates
    assert out[10] == 9.0         # frame = [8, 9, 10]


def test_mode_per_group_deterministic_ties(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mode_per_group,
    )

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
            ("h", "z")]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["grp"]: (r["mode"], r["n_mode"]) for r in
           mode_per_group(df, ["grp"], "v").collect()}
    assert out["g"] == ("a", 2)  # tie between a and b -> smallest value
    assert out["h"] == ("z", 1)


def test_mode_per_group_ignores_nulls(spark):
    """ADVICE r6: NULLs are excluded before counting (SQL aggregate
    convention) — otherwise Spark's NULLS-FIRST ascending tie-break
    would let NULL win ties that DuckDB's NULLS-LAST loses, breaking
    cross-engine reproducibility. All-NULL groups drop out."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mode_per_group,
    )

    rows = [("g", None), ("g", None), ("g", "a"), ("g", "a"), ("g", "b"),
            ("n", None)]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["grp"]: (r["mode"], r["n_mode"]) for r in
           mode_per_group(df, ["grp"], "v").collect()}
    assert out == {"g": ("a", 2)}  # NULL (count 2) never contends; "n" gone


def test_trailing_distinct_counts_unique_ids_in_window(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        trailing_distinct,
    )

    D = dt.date
    rows = [
        (D(2024, 1, 1), 1), (D(2024, 1, 1), 2), (D(2024, 1, 1), 1),  # dup pair
        (D(2024, 1, 2), 2), (D(2024, 1, 2), 3),
        (D(2024, 1, 10), 9),  # outside any earlier 3-day frame
    ]
    df = spark.createDataFrame(rows, "d date, uid long")
    out = {str(r["d"]): r["n_distinct"] for r in
           trailing_distinct(df, "d", "uid", window_days=3).collect()}
    assert out["2024-01-01"] == 2          # {1, 2}
    assert out["2024-01-02"] == 3          # {1, 2, 3} across both days
    assert out["2024-01-10"] == 1          # frame excludes the old days


def test_interpolate_linear_fills_holes(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        interpolate_linear,
    )

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 2), None),   # midpoint of 10 → 30
        ("a", d(2024, 1, 3), 30.0),
        ("a", d(2024, 1, 6), None),   # irregular spacing: 30 + (60-30)*3/4
        ("a", d(2024, 1, 7), 60.0),
        ("b", d(2024, 1, 1), None),   # leading hole clamps to next
        ("b", d(2024, 1, 2), 5.0),
        ("b", d(2024, 1, 3), None),   # trailing hole clamps to prev
    ]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    out = {
        (r["g"], r["d"].isoformat()): (r["v_interp"], r["was_gap"])
        for r in interpolate_linear(df, ["g"], "d", "v").collect()
    }
    assert out[("a", "2024-01-01")] == (10.0, False)
    assert out[("a", "2024-01-02")] == (20.0, True)
    assert abs(out[("a", "2024-01-06")][0] - (30.0 + 30.0 * 3 / 4)) < 1e-12
    assert out[("b", "2024-01-01")] == (5.0, True)
    assert out[("b", "2024-01-03")] == (5.0, True)


def test_ewma_smooth_matches_pandas_adjust(spark):
    import pandas as pd

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ewma_smooth,
    )

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "g string, i long, v double"
    )
    out = ewma_smooth(df, ["g"], ["i"], "v", alpha=0.3, terms=10)
    got = {r["i"]: r["v_ewma"] for r in out.collect()}
    # terms=10 > series length → exact pandas ewm(adjust=True) parity
    want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])


def test_ewma_smooth_skips_nulls_and_validates_alpha(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ewma_smooth,
    )

    df = spark.createDataFrame(
        [("k", 0, 2.0), ("k", 1, None), ("k", 2, 4.0)], "g string, i long, v double"
    )
    got = {r["i"]: r["v_ewma"] for r in ewma_smooth(df, ["g"], ["i"], "v").collect()}
    # row 2: NULL at lag-1 is skipped by renormalization, not zero-filled
    w2 = (1 - 0.3) ** 2
    assert abs(got[2] - (4.0 + w2 * 2.0) / (1.0 + w2)) < 1e-12
    with _pytest.raises(ValueError):
        ewma_smooth(df, ["g"], ["i"], "v", alpha=0.0)


def test_welch_ttest_hand_computed(spark):
    """Welch t and df against a hand-evaluated reference on a 2-group
    frame, plus the undefined-arm NULL contract."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        welch_ttest,
    )

    rows = [
        ("g", False, 1.0), ("g", False, 2.0), ("g", False, 3.0),
        ("g", True, 2.0), ("g", True, 4.0), ("g", True, 6.0), ("g", True, 8.0),
        ("h", False, 5.0), ("h", True, 7.0),  # one row per arm: undefined
    ]
    df = spark.createDataFrame(rows, "grp string, arm boolean, x double")
    out = {
        r["grp"]: r for r in welch_ttest(df, ["grp"], "arm", "x").collect()
    }
    a, b = [1.0, 2.0, 3.0], [2.0, 4.0, 6.0, 8.0]
    ma, mb = sum(a) / 3, sum(b) / 4
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 3
    sea, seb = va / 3, vb / 4
    t = (mb - ma) / math.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (sea**2 / 2 + seb**2 / 3)
    g = out["g"]
    assert (g["n_a"], g["n_b"]) == (3, 4)
    assert g["mean_diff"] == pytest.approx(mb - ma)
    assert g["t_stat"] == pytest.approx(t, rel=1e-12)
    assert g["df_welch"] == pytest.approx(dfw, rel=1e-12)
    h = out["h"]
    assert h["t_stat"] is None and h["df_welch"] is None
    assert (h["n_a"], h["n_b"]) == (1, 1)
    # symmetric arms: swapping the arm flips the sign exactly
    flipped = {
        r["grp"]: r
        for r in welch_ttest(df, ["grp"], ~F.col("arm"), "x").collect()
    }
    assert flipped["g"]["t_stat"] == pytest.approx(-t, rel=1e-12)


def test_chi_square_hand_computed(spark):
    """2x2 chi-square against hand math, including an empty grid
    cell (folded in via the sum-of-expected identity) and the
    independent-mix zero case."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        chi_square_independence,
    )

    # g: perfectly dependent 2x2 — a==b always; margins 2/2 each
    rows = [("g", "a0", "b0")] * 2 + [("g", "a1", "b1")] * 2
    # h: perfectly independent 2x2 (equal cells)
    rows += [("h", "a0", "b0"), ("h", "a0", "b1"), ("h", "a1", "b0"), ("h", "a1", "b1")]
    df = spark.createDataFrame(rows, "grp string, a string, b string")
    out = {r["grp"]: r for r in chi_square_independence(df, ["grp"], "a", "b").collect()}
    # g: e = 1 for all four cells; observed 2,0,0,2 → chi2 = 4·1 = 4
    assert out["g"]["chi2"] == pytest.approx(4.0)
    assert out["g"]["dof"] == 1 and out["g"]["n"] == 4
    assert out["h"]["chi2"] == pytest.approx(0.0)
    assert out["h"]["dof"] == 1


def test_benford_audit_hand_computed(spark):
    """Benford audit on a tiny fixture: digit extraction from exact
    scaled integers, absent digits folded via the identity, and a
    perfectly Benford-proportioned group scoring chi2 ~ 0."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        benford_audit,
    )

    # group "u": 9 rows all starting with digit 1 (1x.xx amounts)
    rows = [("u", 10.00 + i) for i in range(9)]
    # group "b": counts proportional to Benford for digits 1..3 only
    # is impossible with integers; instead hand-compute on 1,2,9
    rows += [("b", 1.23), ("b", 2.34), ("b", 9.87)]
    df = spark.createDataFrame(rows, "grp string, amt double")
    out = {r["grp"]: r for r in benford_audit(df, ["grp"], "amt").collect()}
    p = [math.log10(1 + 1 / d) for d in range(1, 10)]
    # u: o_1 = 9, others 0. chi2 = (9 - 9p1)^2/(9p1) + sum_{d>=2} 9 p_d
    want_chi2 = (9 - 9 * p[0]) ** 2 / (9 * p[0]) + sum(9 * q for q in p[1:])
    assert out["u"]["n"] == 9
    assert out["u"]["chi2"] == pytest.approx(want_chi2, rel=1e-9)
    want_mad = (abs(1 - p[0]) + sum(p[1:])) / 9
    assert out["u"]["mad"] == pytest.approx(want_mad, rel=1e-9)
    # b: one row each for digits 1, 2, 9
    o = {1: 1, 2: 1, 9: 1}
    n = 3
    want_b = sum(
        (o.get(d, 0) - n * p[d - 1]) ** 2 / (n * p[d - 1]) for d in range(1, 10)
    )
    assert out["b"]["chi2"] == pytest.approx(want_b, rel=1e-9)
    # zero amounts are excluded entirely
    df0 = spark.createDataFrame([("z", 0.0), ("z", 5.0)], "grp string, amt double")
    z = benford_audit(df0, ["grp"], "amt").collect()[0]
    assert z["n"] == 1


def test_mann_whitney_hand_computed(spark):
    """U and z against hand math with ties, plus the undefined cases
    (empty arm; all values identical)."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mann_whitney_u,
    )

    # g: a = [1, 2, 2], b = [2, 3]; pooled sorted: 1,2,2,2,3
    # ranks: 1 → 1; the three 2s → avg (2+3+4)/3 = 3; 3 → 5
    rows = [
        ("g", False, 1.0), ("g", False, 2.0), ("g", False, 2.0),
        ("g", True, 2.0), ("g", True, 3.0),
        ("h", False, 7.0), ("h", False, 7.0),  # one arm only
        ("i", False, 5.0), ("i", True, 5.0),   # all tied: var = 0
    ]
    df = spark.createDataFrame(rows, "grp string, arm boolean, x double")
    out = {r["grp"]: r for r in mann_whitney_u(df, ["grp"], "arm", "x").collect()}
    g = out["g"]
    rb = 3.0 + 5.0
    u = rb - 2 * 3 / 2
    na, nb, n = 3.0, 2.0, 5.0
    ties = 3**3 - 3  # one tie group of size 3
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    assert (g["n_a"], g["n_b"]) == (3, 2)
    assert g["u_stat"] == pytest.approx(u)
    assert g["z"] == pytest.approx(z, rel=1e-12)
    assert out["h"]["z"] is None and out["h"]["u_stat"] is None
    assert out["i"]["z"] is None  # tie-only: variance 0, undefined
    assert out["i"]["u_stat"] == pytest.approx(1.5 - 1.0)  # rank avg 1.5


def test_ks_two_sample_hand_computed(spark):
    """KS D against hand-evaluated ECDFs, including a tie across arms
    (right-continuous: the gap is measured AFTER the tied value) and
    the identical-distribution zero case."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ks_two_sample,
    )

    # g: a = [1, 3], b = [2, 3]. Steps: after 1: |1/2-0|=.5; after 2:
    # |1/2-1/2|=0; after 3 (tie, both arms): |1-1| = 0 → D = 0.5
    rows = [
        ("g", False, 1.0), ("g", False, 3.0),
        ("g", True, 2.0), ("g", True, 3.0),
        ("h", False, 1.0), ("h", True, 1.0),  # same dist → D = 0
    ]
    df = spark.createDataFrame(rows, "grp string, arm boolean, x double")
    out = {r["grp"]: r for r in ks_two_sample(df, ["grp"], "arm", "x").collect()}
    import math

    assert out["g"]["ks_d"] == pytest.approx(0.5)
    assert out["g"]["ks_scaled"] == pytest.approx(0.5 * math.sqrt(4 / 4))
    assert out["h"]["ks_d"] == pytest.approx(0.0)
    # disjoint supports → D = 1 (maximal difference)
    rows2 = [("m", False, 1.0), ("m", False, 2.0), ("m", True, 5.0)]
    df2 = spark.createDataFrame(rows2, "grp string, arm boolean, x double")
    m = ks_two_sample(df2, ["grp"], "arm", "x").collect()[0]
    assert m["ks_d"] == pytest.approx(1.0)


def test_cooccurrence_lift_hand_computed(spark):
    """Support/confidence/lift against hand math, duplicate rows in a
    basket counted once, and the mega-basket guard dropping an
    outlier basket entirely."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cooccurrence_lift,
    )

    rows = [
        (1, "x"), (1, "y"), (1, "y"),   # duplicate y: one co-occurrence
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, "basket", "item", min_pair_count=2).collect()
    }
    # N=4 baskets; c_x=3, c_y=3; c_xy=2
    assert set(out) == {("x", "y")}
    xy = out[("x", "y")]
    assert xy["pair_count"] == 2
    assert xy["support"] == pytest.approx(2 / 4)
    assert xy["confidence"] == pytest.approx(2 / 3)
    assert xy["lift"] == pytest.approx(4 * 2 / (3 * 3))
    # guard: a basket above max_basket_size contributes nothing
    big = [(9, f"i{j}") for j in range(10)]
    df2 = spark.createDataFrame(rows + big, "basket bigint, item string")
    guarded = cooccurrence_lift(
        df2, "basket", "item", min_pair_count=2, max_basket_size=5
    )
    assert {
        (r["item_a"], r["item_b"]) for r in guarded.collect()
    } == {("x", "y")}
    # ...and N excludes the dropped basket (4 survivors, not 5)
    g = {(r["item_a"], r["item_b"]): r for r in guarded.collect()}
    assert g[("x", "y")]["support"] == pytest.approx(2 / 4)


def test_degenerate_groups_null_not_ansi_error(spark):
    """The grading session runs ansi.enabled=true: an empty KS arm, a
    single-row Mann-Whitney group, and a single-row Welch arm must
    yield NULL statistics, never a DIVIDE_BY_ZERO error."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ks_two_sample,
        mann_whitney_u,
        welch_ttest,
    )

    one_arm = spark.createDataFrame(
        [("g", False, 1.0), ("g", False, 2.0)], "grp string, arm boolean, x double"
    )
    r = ks_two_sample(one_arm, ["grp"], "arm", "x").collect()[0]
    assert r["ks_d"] is None and r["ks_scaled"] is None
    single = spark.createDataFrame(
        [("g", True, 1.0)], "grp string, arm boolean, x double"
    )
    m = mann_whitney_u(single, ["grp"], "arm", "x").collect()[0]
    assert m["z"] is None
    w = welch_ttest(single, ["grp"], "arm", "x").collect()[0]
    assert w["t_stat"] is None and w["df_welch"] is None


def test_concentration_stats_hand_computed(spark):
    """Entropy/HHI/top-share against hand math, per-group mode, the
    uniform-mix normalization, and the single-category NULL."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        concentration_stats,
    )

    rows = (
        [("g", "a")] * 2 + [("g", "b")] * 2          # uniform over 2
        + [("h", "a")] * 3 + [("h", "b")] * 1        # 3/4 - 1/4
        + [("k", "a")] * 5                           # single category
    )
    df = spark.createDataFrame(rows, "grp string, src string")
    out = {
        r["grp"]: r
        for r in concentration_stats(df, "src", ["grp"]).collect()
    }
    g = out["g"]
    assert g["entropy"] == pytest.approx(math.log(2))
    assert g["entropy_norm"] == pytest.approx(1.0)
    assert g["hhi"] == pytest.approx(0.5) and g["top_share"] == pytest.approx(0.5)
    h = out["h"]
    want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert h["entropy"] == pytest.approx(want)
    assert h["hhi"] == pytest.approx(0.75**2 + 0.25**2)
    assert h["top_share"] == pytest.approx(0.75)
    k = out["k"]
    assert k["entropy"] == pytest.approx(0.0)
    assert k["entropy_norm"] is None  # 0/0: undefined, not 1
    assert k["hhi"] == pytest.approx(1.0) and k["n_categories"] == 1
    # global (no group) mode returns one row over everything
    glob = concentration_stats(df, "src").collect()
    assert len(glob) == 1 and glob[0]["n"] == 13


def test_transition_matrix_hand_computed(spark):
    """Rows normalize per from-state; sequences never leak across
    entities; a single-event entity contributes nothing."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        transition_matrix,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a→b, b→a
        (2, 1, "a"), (2, 2, "a"),                # a→a
        (3, 1, "b"),                             # lone event: no pair
    ]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, s string")
    out = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(df, "uid", ["t"], "s").collect()
    }
    assert out[("a", "b")] == (1, pytest.approx(0.5))
    assert out[("a", "a")] == (1, pytest.approx(0.5))
    assert out[("b", "a")] == (1, pytest.approx(1.0))
    assert set(out) == {("a", "b"), ("a", "a"), ("b", "a")}
    # rows sum to 1 per from_state
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _t), (_n, p) in out.items():
        sums[f] += p
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_rfm_and_abc_contracts(spark):
    """RFM: best tile goes to most-recent / most-frequent / biggest
    spender; ABC: cumulative classes are monotone A→B→C down the
    sorted totals and the top key is always A."""
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        abc_pareto,
        rfm_segments,
    )

    base = dt.date(2024, 1, 1)
    rows = []
    for cust in range(8):
        for k in range(cust + 1):  # cust i places i+1 orders
            rows.append((cust, base + dt.timedelta(days=cust * 10 + k), 100.0 * (cust + 1)))
    o = spark.createDataFrame(rows, "o_custkey bigint, o_orderdate date, o_totalprice double")
    out = {r["o_custkey"]: r for r in rfm_segments(o, n_tiles=4).collect()}
    assert out[7]["r"] == 1 and out[7]["f"] == 1 and out[7]["m"] == 1
    assert out[0]["r"] == 4 and out[0]["f"] == 4 and out[0]["m"] == 4
    assert out[7]["segment"] == "111" and out[0]["segment"] == "444"
    assert out[7]["recency_days"] == 0
    abc = abc_pareto(
        o.selectExpr("o_custkey as k", "o_totalprice as v"), "k", "v"
    ).collect()
    ordered = sorted(abc, key=lambda r: r["cum_share"])
    classes = [r["abc_class"] for r in ordered]
    assert classes == sorted(classes)  # A...B...C monotone
    assert ordered[0]["abc_class"] == "A"
    assert ordered[-1]["cum_share"] == pytest.approx(1.0)


def test_kaplan_meier_textbook(spark):
    """KM against the textbook worked example — censored subjects
    shrink the risk set without an event, no curve row at
    censor-only times, and a risk-set-exhausting event time pins
    survival to exactly 0."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        kaplan_meier,
    )

    rows = [
        ("g", 1, True), ("g", 2, False), ("g", 3, True),
        ("g", 4, True), ("g", 5, False),
    ]
    df = spark.createDataFrame(rows, "grp string, t int, ev boolean")
    out = {r["t"]: r for r in kaplan_meier(df, "t", "ev", ["grp"]).collect()}
    assert set(out) == {1, 3, 4}  # no rows at censor-only times 2, 5
    assert (out[1]["n_risk"], out[1]["d"]) == (5, 1)
    assert out[1]["survival"] == pytest.approx(4 / 5)
    assert (out[3]["n_risk"], out[3]["d"]) == (3, 1)
    assert out[3]["survival"] == pytest.approx(4 / 5 * 2 / 3)
    assert (out[4]["n_risk"], out[4]["d"]) == (2, 1)
    assert out[4]["survival"] == pytest.approx(4 / 5 * 2 / 3 * 1 / 2)
    # exhaustion: everyone events at the last time → survival 0.0
    rows2 = [("h", 1, True), ("h", 2, True), ("h", 2, True)]
    df2 = spark.createDataFrame(rows2, "grp string, t int, ev boolean")
    out2 = {r["t"]: r for r in kaplan_meier(df2, "t", "ev", ["grp"]).collect()}
    assert out2[2]["survival"] == 0.0
    assert out2[1]["survival"] == pytest.approx(2 / 3)


def test_logrank_hand_computed(spark):
    """Log-rank chi2 against the hand-worked two-arm example, the
    identical-curves ~0 case, and the empty-arm NULL."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        logrank_test,
    )

    # arms with identical event times → observed == expected → chi2 0
    same = [("g", t, True, a) for t in (1, 2, 3) for a in (False, True)]
    df = spark.createDataFrame(same, "grp string, t int, ev boolean, arm boolean")
    r = logrank_test(df, "t", "ev", "arm", ["grp"]).collect()[0]
    assert r["chi2"] == pytest.approx(0.0)
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["observed_a"] == 3 and r["expected_a"] == pytest.approx(3.0)
    # hand example: arm a events at t=1 (n1=2,n2=2); arm b events at t=9
    rows = [
        ("h", 1, True, False), ("h", 1, True, False),
        ("h", 9, True, True), ("h", 9, True, True),
    ]
    df2 = spark.createDataFrame(rows, "grp string, t int, ev boolean, arm boolean")
    h = logrank_test(df2, "t", "ev", "arm", ["grp"]).collect()[0]
    # t=1: n=4, d=2, e1 = 2*2/4 = 1, v = 2*2*2*2/(16*3) = 1/3
    # t=9: n=2 (both arm b), d=2 -> n>1 valid, e1 = 0, v = 0
    # O-E = 2-1 = 1; V = 1/3 -> chi2 = 3
    assert h["observed_a"] == 2
    assert h["expected_a"] == pytest.approx(1.0)
    assert h["chi2"] == pytest.approx(3.0)
    # empty arm: variance 0 → NULL
    one = spark.createDataFrame(
        [("k", 1, True, False), ("k", 2, True, False)],
        "grp string, t int, ev boolean, arm boolean",
    )
    k = logrank_test(one, "t", "ev", "arm", ["grp"]).collect()[0]
    assert k["chi2"] is None


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_cox_ph_binary_score_zero_and_symmetry(spark):
    """Cox fit self-consistency: at the returned beta the partial-
    likelihood score recomputed in pure Python is ~0; swapping the
    arm flips beta's sign exactly; hazard_ratio = exp(beta); an
    eventless group fits NULL."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cox_ph_binary,
    )

    # arm=True fails somewhat sooner (interleaved, NOT separated:
    # a monotone-likelihood fixture would have no finite MLE)
    rows = []
    for t, e, a in [
        (2, True, True), (5, True, True), (8, True, True), (10, False, True),
        (3, True, False), (6, True, False), (9, True, False), (12, False, False),
    ]:
        rows.append(("g", t, e, a))
    rows += [("z", 5, False, True), ("z", 6, False, False)]  # no events
    df = spark.createDataFrame(rows, "grp string, t int, ev boolean, arm boolean")
    out = {r["grp"]: r for r in cox_ph_binary(df, "t", "ev", "arm", ["grp"]).collect()}
    g = out["g"]
    assert g["beta"] is not None and g["beta"] > 0
    assert g["hazard_ratio"] == pytest.approx(math.exp(g["beta"]))
    assert g["se"] > 0 and g["z"] == pytest.approx(g["beta"] / g["se"])
    # recompute the Breslow score U(beta) in pure python
    subj = [(t, e, a) for (grp, t, e, a) in rows if grp == "g"]
    times = sorted({t for t, e, _ in subj if e})
    beta = g["beta"]
    U = 0.0
    for t0 in times:
        d = sum(1 for t, e, _ in subj if e and t == t0)
        d1 = sum(1 for t, e, a in subj if e and t == t0 and a)
        n1 = sum(1 for t, _, a in subj if t >= t0 and a)
        n0 = sum(1 for t, _, a in subj if t >= t0 and not a)
        A = n1 * math.exp(beta) / (n0 + n1 * math.exp(beta))
        U += d1 - d * A
    assert abs(U) < 1e-8
    # symmetry: negated arm → negated beta
    flipped = {
        r["grp"]: r
        for r in cox_ph_binary(df, "t", "ev", ~F.col("arm"), ["grp"]).collect()
    }
    assert flipped["g"]["beta"] == pytest.approx(-g["beta"], rel=1e-9)
    # eventless group: no information → NULL fit
    z = out["z"]
    assert z["beta"] is None and z["hazard_ratio"] is None and z["z"] is None


def test_cox_ph_binary_thousand_groups_no_plan_blowup(spark):
    """VERDICT r8 item 4: per-iteration betas enter the plan as a
    broadcast-joined frame, not a |groups|-branch chained CASE — a
    1,000-group fit must complete (the CASE version's expression and
    Catalyst analysis time grew linearly per iteration) and every
    two-arm group with events must fit a finite beta."""
    import math as _math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cox_ph_binary,
    )

    n_groups = 1000
    rows = []
    for gid in range(n_groups):
        # deterministic per-group fixture, interleaved arms (finite MLE)
        for j, (t, e, a) in enumerate(
            [(2, True, True), (5, True, True), (9, False, True),
             (3, True, False), (7, True, False), (11, False, False)]
        ):
            rows.append((f"g{gid:04d}", t + (gid + j) % 3, e, a))
    df = spark.createDataFrame(rows, "grp string, t int, ev boolean, arm boolean")
    out = cox_ph_binary(df, "t", "ev", "arm", ["grp"], iterations=4).collect()
    assert len(out) == n_groups
    fitted = [r for r in out if r["beta"] is not None]
    assert len(fitted) == n_groups
    assert all(_math.isfinite(r["beta"]) and r["se"] > 0 for r in fitted)


def test_rolling_zscore_anomaly_manual_baseline(spark):
    import datetime as dt
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        rolling_zscore_anomaly,
    )

    # one event per (day, copies): flat 10/day for 7 days, then a 30 spike
    T = dt.datetime
    rows = []
    eid = 0
    counts = [10, 10, 11, 9, 10, 10, 10, 30]
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, 7, "x", T(2024, 1, 1 + d, 12, 0, 0)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        r["day"].isoformat(): r
        for r in rolling_zscore_anomaly(
            ev, lookback=7, min_baseline=3, threshold=2.5
        ).collect()
    }
    # cold start: first row 0 baseline, rows 2-3 below min_baseline=3
    assert out["2024-01-01"]["z"] is None and not out["2024-01-01"]["is_anomaly"]
    assert out["2024-01-03"]["z"] is None
    # spike day: baseline = the 7 prior counts, manual two-pass z
    base = counts[:7]
    m = sum(base) / 7.0
    sd = math.sqrt(sum((x - m) ** 2 for x in base) / 6.0)
    want = math.floor((30 - m) / sd * 10000 + 0.5) / 10000
    spike = out["2024-01-08"]
    assert spike["n_baseline"] == 7
    assert abs(spike["z"] - want) < 1e-9
    assert spike["is_anomaly"]
    # a flat mid-series day scores small and unflagged
    assert abs(out["2024-01-07"]["z"]) < 1.5
    assert not out["2024-01-07"]["is_anomaly"]


def test_rolling_zscore_anomaly_zero_variance_baseline_is_null(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        rolling_zscore_anomaly,
    )

    T = dt.datetime
    rows = []
    eid = 0
    for d in range(5):  # constant 3/day → zero baseline variance
        for _ in range(3):
            eid += 1
            rows.append((eid, 1, "y", T(2024, 2, 1 + d)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = rolling_zscore_anomaly(ev, lookback=7, min_baseline=3).collect()
    assert all(r["z"] is None for r in out)
    assert not any(r["is_anomaly"] for r in out)


def test_cusum_shift_accumulates_drift_and_resets(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cusum_shift,
    )

    # 7-day flat baseline of 10/day (mean exactly 10), then a +2 drift:
    # each post day adds 12 - 10 - 0.5 = 1.5; alarm (>=5) on post day 4
    T = dt.datetime
    rows, eid = [], 0
    for d, c in enumerate([10] * 7 + [12] * 5):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "x", T(2024, 1, 1 + d)))
    # a second type that dips BELOW the mean: accumulator must floor at 0
    for d, c in enumerate([10] * 7 + [5, 10]):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "y", T(2024, 1, 1 + d)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = cusum_shift(ev).collect()
    x = sorted(
        (r for r in out if r["event_type"] == "x"), key=lambda r: r["day"]
    )
    assert [r["cusum"] for r in x] == [1.5, 3.0, 4.5, 6.0, 7.5]
    assert [r["alarm"] for r in x] == [False, False, False, True, True]
    y = sorted(
        (r for r in out if r["event_type"] == "y"), key=lambda r: r["day"]
    )
    # dip day: d = 5 - 10 - 0.5 = -5.5 → clamps to 0; recovery day:
    # d = -0.5, still clamped (running min tracks the dip)
    assert [r["cusum"] for r in y] == [0.0, 0.0]
    assert not any(r["alarm"] for r in y)
    # baseline days emit no rows
    assert len(x) == 5 and len(y) == 2


def test_quantile_normalize_calibrates_across_groups(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        quantile_normalize,
    )

    # two "sources" with wildly different raw scales; identical group
    # sizes → identical quantile grids regardless of raw values
    rows = [(i, "strict", i * 1) for i in range(1, 5)] + [
        (i + 10, "lenient", 1000 + i * 7) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = quantile_normalize(df).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r["q"])
    assert sorted(by_group["strict"]) == sorted(by_group["lenient"]) == [
        0.2, 0.4, 0.6, 0.8
    ]
    # ties break on doc_id: equal values get distinct, ordered quantiles
    tied = spark.createDataFrame(
        [(1, "s", 5), (2, "s", 5), (3, "s", 5)],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r["q"] for r in quantile_normalize(tied).collect()
    }
    assert got == {1: 0.25, 2: 0.5, 3: 0.75}


def test_seasonal_adjust_flattens_weekly_pattern(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        seasonal_adjust,
    )

    # 4 full weeks: Sundays always 5 events, all other days 10 —
    # perfect multiplicative seasonality, so deseasonalized counts
    # are the overall mean everywhere
    T = dt.datetime
    rows, eid = [], 0
    start = dt.date(2024, 1, 7)  # a Sunday
    for d in range(28):
        day = start + dt.timedelta(days=d)
        c = 5 if day.weekday() == 6 else 10  # python weekday: Sunday=6
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "x", T(day.year, day.month, day.day)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = seasonal_adjust(ev).collect()
    assert len(out) == 28
    overall_mean = (5 * 4 + 10 * 24) / 28.0  # = 9.2857...
    for r in out:
        assert abs(r["deseasonalized"] - round(overall_mean, 4)) < 2e-4
        if r["dow"] == 1:  # Spark convention: 1 = Sunday
            assert r["cnt"] == 5
            assert abs(r["seasonal_index"] - round(5 / overall_mean, 4)) < 2e-4
        else:
            assert r["cnt"] == 10
            assert abs(r["seasonal_index"] - round(10 / overall_mean, 4)) < 2e-4


def test_dispersion_report_fano_and_cv2(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        dispersion_report,
    )

    T = dt.datetime
    rows, eid = [], 0
    for d, c in enumerate([10, 10, 10, 10]):  # constant → fano 0
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "x", T(2024, 1, 1 + d)))
    for d, c in enumerate([5, 15, 5, 15]):  # mean 10, var 100/3
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "y", T(2024, 1, 1 + d)))
    eid += 1
    rows.append((eid, 1, "z", T(2024, 1, 1)))  # single day → NULLs
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["event_type"]: r for r in dispersion_report(ev).collect()}
    assert out["x"]["fano"] == 0.0 and out["x"]["cv2"] == 0.0
    assert out["y"]["mean_daily"] == 10.0
    assert out["y"]["var_daily"] == 33.3333  # 100/3 rounded
    assert out["y"]["fano"] == 3.3333
    assert out["y"]["cv2"] == 0.3333
    assert out["z"]["var_daily"] is None and out["z"]["fano"] is None


def test_gini_utilization_closed_form(spark):
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        gini_utilization,
    )

    T = dt.datetime
    rows, eid = [], 0
    # type x: per-user counts 1, 1, 2, 4 → G = (2·25 − 5·8)/(4·8) = 0.3125
    for u, c in [(1, 1), (2, 1), (3, 2), (4, 4)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, u, "x", T(2024, 1, 1)))
    # type y: perfectly even 3/3/3 → G = 0
    for u in (1, 2, 3):
        for _ in range(3):
            eid += 1
            rows.append((eid, u, "y", T(2024, 1, 2)))
    # type z: a single user → G = 0 by the closed form
    for _ in range(5):
        eid += 1
        rows.append((eid, 9, "z", T(2024, 1, 3)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["event_type"]: r for r in gini_utilization(ev).collect()}
    assert out["x"]["gini"] == 0.3125
    assert (out["x"]["n_users"], out["x"]["total_events"]) == (4, 8)
    assert out["y"]["gini"] == 0.0
    assert out["z"]["gini"] == 0.0


def test_grouped_rank_auto_two_phase_matches_window_and_plan_shape(spark):
    """VERDICT r10 item 3: the measured dispatch behind
    gini_utilization / quantile_normalize. A synthetic single-group
    skew (one group holding ~90% of rows) forced over the threshold
    must (a) pick the two-phase strategy, (b) produce EXACTLY the
    keyed-window ranks, and (c) show the two-phase plan shape — the
    local window is keyed by (__pid, group), never by the group
    alone, so no reducer ever holds a whole group."""
    import io
    import contextlib

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        grouped_rank_auto,
    )

    rows = [("big", i % 37, i) for i in range(450)] + [
        ("small", i % 5, 10_000 + i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v long, tie long")

    ranked_w, strat_w = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk", skew_threshold=10**9
    )
    assert strat_w == "window"
    ranked_2, strat_2 = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk", skew_threshold=100
    )
    assert strat_2 == "two_phase"
    want = sorted(tuple(r) for r in ranked_w.collect())
    got = sorted(tuple(r) for r in ranked_2.collect())
    assert got == want

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranked_2.explain("formatted")
    plan = buf.getvalue()
    assert "__pid" in plan, plan  # local windows keyed by (pid, group)

    # group_count_name parity between the two paths
    nw, _ = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk",
        skew_threshold=10**9, group_count_name="n",
    )
    n2, _ = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk",
        skew_threshold=100, group_count_name="n",
    )
    assert sorted(tuple(r) for r in n2.collect()) == sorted(
        tuple(r) for r in nw.collect()
    )


def test_trailing_distinct_auto_dispatch_and_hll_plan_shape(spark):
    """VERDICT r11 item 4a: the w9 allowlist's named HLL alternative
    is now a CODE dispatch, not a docstring. Below the threshold the
    probe picks the exact collect_set path; forced over it, the HLL
    path must (a) tag itself, (b) window over the |days|-sized daily
    sketch rollup (plan shows the sketch agg, no collect_set), and
    (c) estimate within the sketch's error of the exact counts."""
    import contextlib
    import io
    import datetime as dt

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        trailing_distinct_auto,
    )

    rows = [
        (dt.date(2024, 3, 1 + d), f"u{(i * 7 + d) % 40}")
        for d in range(10)
        for i in range(3 + d)
    ]
    df = spark.createDataFrame(rows, "d date, id string")

    exact, strat = trailing_distinct_auto(df, "d", "id", window_days=7)
    assert strat == "exact"
    hll, strat_h = trailing_distinct_auto(
        df, "d", "id", window_days=7, distinct_threshold=0
    )
    assert strat_h == "hll"

    e = {r["d"]: r["n_distinct"] for r in exact.collect()}
    h = {r["d"]: r["n_distinct"] for r in hll.collect()}
    assert set(e) == set(h)
    # tiny universes are exact in HLL's sparse mode; allow 2% anyway
    for day, n in e.items():
        assert abs(h[day] - n) <= max(1, 0.02 * n), (day, n, h[day])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hll.explain("formatted")
    plan = buf.getvalue()
    assert "hll_union_agg" in plan or "hll_sketch" in plan, plan
    assert "collect_set" not in plan, plan


def test_equidepth_histogram_auto_dispatch_and_no_window_plan(spark):
    """VERDICT r11 item 4b: the a14 allowlist's named
    approx_percentile alternative is now a CODE dispatch. Below the
    threshold the probe keeps the exact ntile path; forced over it,
    the sketch path must (a) tag itself, (b) carry NO window node at
    all (cutpoints from one mergeable agg + comparison binning), and
    (c) partition the value range (counts sum to n, buckets
    near-equal depth)."""
    import contextlib
    import io

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        equidepth_histogram_auto,
    )

    df = spark.createDataFrame(
        [(i, float((i * 37) % 1000)) for i in range(1000)], "k long, x double"
    )
    exact, strat = equidepth_histogram_auto(df, "x", buckets=4, tie_break="k")
    assert strat == "exact"
    approx, strat_a = equidepth_histogram_auto(
        df, "x", buckets=4, row_threshold=10
    )
    assert strat_a == "approx_percentile"

    rows = approx.collect()
    assert sum(r["n"] for r in rows) == 1000
    assert {r["bucket"] for r in rows} == {1, 2, 3, 4}
    # near-equal depth: every bucket within 20% of the ideal 250
    assert all(abs(r["n"] - 250) <= 50 for r in rows), rows
    # buckets tile the range in order without overlap
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "percentile" not in plan  # cutpoints resolved driver-side

    # schema parity across the dispatch boundary (code-review r12):
    # ntile emits int, the approx path long — the auto aligns both
    assert dict(exact.dtypes)["bucket"] == dict(approx.dtypes)["bucket"]


def test_weighted_percentiles_hand_computed(spark):
    """grouped_percentiles(weight_col=...) must equal the exact
    percentile of the EXPANDED multiset (each row repeated weight
    times) — hand-computed here — and collapse to the unweighted
    form when every weight is 1. approx=True with a weight raises
    (approx_percentile has no frequency parameter)."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        grouped_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 10.0, 3), ("a", 20.0, 1), ("b", 5.0, 2), ("b", 7.0, 2)],
        "g string, v double, w long",
    )
    rows = {
        r["g"]: r
        for r in grouped_percentiles(
            df, ["g"], "v", probs=(0.25, 0.5), weight_col="w"
        ).collect()
    }
    # a expands to [10,10,10,20]: p25 → 10.0, p50 → 10.0
    assert (rows["a"]["p25"], rows["a"]["p50"]) == (10.0, 10.0)
    # b expands to [5,5,7,7]: p50 interpolates the middle pair → 6.0
    assert rows["b"]["p50"] == 6.0

    ones = df.withColumn("w", df.w * 0 + 1)
    w1 = grouped_percentiles(ones, ["g"], "v", weight_col="w").collect()
    plain = grouped_percentiles(df, ["g"], "v").collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, plain))

    with _pytest.raises(ValueError, match="frequency"):
        grouped_percentiles(df, ["g"], "v", approx=True, weight_col="w")


def test_equidepth_histogram_auto_null_column_and_one_bucket(spark):
    """Code-review r12 edge cases: an all-NULL value column past the
    threshold must not crash the approx path (NULL cutpoints → one
    bucket), and buckets=1 must skip the cutpoint aggregation
    entirely instead of passing an empty percentage array."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        equidepth_histogram_auto,
    )

    nulls = spark.createDataFrame(
        [(i, None) for i in range(50)], "k long, x double"
    )
    h, strat = equidepth_histogram_auto(nulls, "x", buckets=4, row_threshold=10)
    assert strat == "approx_percentile"
    rows = h.collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 1 and rows[0]["n"] == 50
    assert rows[0]["lo"] is None and rows[0]["hi"] is None

    one = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k long, x double"
    )
    h1, strat1 = equidepth_histogram_auto(one, "x", buckets=1, row_threshold=10)
    assert strat1 == "approx_percentile"
    r1 = h1.collect()
    assert len(r1) == 1 and r1[0]["n"] == 50
    assert (r1[0]["lo"], r1[0]["hi"]) == (0.0, 49.0)


def test_gini_and_quantile_normalize_skew_path_oracle_unchanged(spark):
    """The two consumers must emit identical rows whichever rank path
    the dispatch picks (oracle unchanged — VERDICT r10 item 3's
    done-bar)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        gini_utilization,
        quantile_normalize,
    )

    ev = spark.createDataFrame(
        [("x", i % 23) for i in range(300)]
        + [("y", i % 7) for i in range(40)],
        "event_type string, user_id long",
    )
    g_window = sorted(tuple(r) for r in gini_utilization(ev).collect())
    g_two = sorted(
        tuple(r) for r in gini_utilization(ev, skew_threshold=5).collect()
    )
    assert g_two == g_window

    docs = spark.createDataFrame(
        [(f"d{i}", "src_a" if i % 10 else "src_b", (i * 7) % 101)
         for i in range(200)],
        "doc_id string, source string, n_chars long",
    )
    q_window = sorted(tuple(r) for r in quantile_normalize(docs).collect())
    q_two = sorted(
        tuple(r)
        for r in quantile_normalize(docs, skew_threshold=5).collect()
    )
    assert q_two == q_window


def test_mann_whitney_and_ks_distinct_value_plan_matches_bruteforce(spark):
    """r11 scale rewrite (the mleval_auc technique): both stats now
    aggregate to the distinct-value frame before any window. On a
    heavy-tie fixture the results must match a from-scratch per-row
    reference exactly (ranks are exact halves; ECDF gaps are exact
    integer ratios), and the window input must be the collapsed
    frame, not raw rows."""
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ks_two_sample,
        mann_whitney_u,
    )

    rng = random.Random(13)
    rows = [
        ("g%d" % (i % 2), i % 3 == 0, float(rng.randrange(0, 8)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, arm boolean, x double")

    # --- reference: per-row average ranks + ECDF gaps ---
    def ref(grp):
        vals = [(x, a) for g, a, x in rows if g == grp]
        xs = sorted(x for x, _ in vals)
        rank = {}
        i = 0
        while i < len(xs):
            j = i
            while j < len(xs) and xs[j] == xs[i]:
                j += 1
            rank[xs[i]] = (i + 1 + j) / 2.0  # avg of ranks i+1..j
            i = j
        rb = sum(rank[x] for x, a in vals if a)
        nb = sum(1 for _, a in vals if a)
        na = len(vals) - nb
        u = rb - nb * (nb + 1) / 2
        steps = sorted(set(xs))
        amax = 0.0
        for s in steps:
            ca = sum(1 for x, a in vals if not a and x <= s)
            cb = sum(1 for x, a in vals if a and x <= s)
            amax = max(amax, abs(ca / na - cb / nb))
        return u, amax, na, nb

    got_u = {
        r["grp"]: r for r in mann_whitney_u(df, ["grp"], "arm", "x").collect()
    }
    got_ks = {
        r["grp"]: r for r in ks_two_sample(df, ["grp"], "arm", "x").collect()
    }
    for grp in ("g0", "g1"):
        u, d, na, nb = ref(grp)
        assert got_u[grp]["u_stat"] == u, grp
        assert (got_u[grp]["n_a"], got_u[grp]["n_b"]) == (na, nb)
        assert got_ks[grp]["ks_d"] == d, grp

    # plan shape: the window consumes a HashAggregate (the collapsed
    # distinct-value frame), never the raw scan
    import io
    import contextlib

    for frame in (
        mann_whitney_u(df, ["grp"], "arm", "x"),
        ks_two_sample(df, ["grp"], "arm", "x"),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            frame.explain("formatted")
        plan = buf.getvalue()
        win = plan.index("Window")
        assert "HashAggregate" in plan[win:], plan


def test_mann_whitney_null_arm_rows_are_excluded(spark):
    """Code-review r11: a two-sample test is defined over exactly the
    two samples — NULL-arm rows are excluded BEFORE ranking (were
    they to occupy rank slots, U could exceed its [0, n_a·n_b] range
    and z's null mean would no longer match the pooled ranking).
    Pinned so the distinct-value rewrite keeps valid statistics for
    nullable arm flags."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [
            ("g", False, 1.0), ("g", True, 2.0),
            ("g", None, 1.5),  # excluded: belongs to neither sample
            ("g", False, 3.0), ("g", True, 4.0),
        ],
        "grp string, arm boolean, x double",
    )
    row = mann_whitney_u(df, ["grp"], "arm", "x").collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    # pooled ranks (NULL row gone): 1.0→1, 2.0→2, 3.0→3, 4.0→4
    # R_b = 2 + 4 = 6; U = 6 − 2·3/2 = 3 — inside [0, n_a·n_b] = [0, 4]
    assert row["u_stat"] == 3.0
    assert 0 <= row["u_stat"] <= row["n_a"] * row["n_b"]


def test_mann_whitney_all_null_arm_group_still_surfaces(spark):
    """ADVICE r11: the NULL-arm exclusion is per-ROW, not per-group —
    a group whose rows ALL carry a NULL arm must still emit a row
    (n_a = n_b = 0, NULL statistics), matching ks_two_sample and the
    pre-r11 convention, so callers iterating groups never silently
    lose one."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        ks_two_sample,
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [
            ("mixed", False, 1.0), ("mixed", True, 2.0),
            ("allnull", None, 5.0), ("allnull", None, 6.0),
        ],
        "grp string, arm boolean, x double",
    )
    rows = {r["grp"]: r for r in mann_whitney_u(df, ["grp"], "arm", "x").collect()}
    assert set(rows) == {"mixed", "allnull"}
    r = rows["allnull"]
    assert (r["n_a"], r["n_b"]) == (0, 0)
    assert r["u_stat"] is None and r["z"] is None
    # same convention as KS (which never had the filter)
    ks = {r["grp"]: r for r in ks_two_sample(df, ["grp"], "arm", "x").collect()}
    assert set(ks) == {"mixed", "allnull"}
    assert (ks["allnull"]["n_a"], ks["allnull"]["n_b"]) == (0, 0)


def test_grouped_rank_two_phase_keeps_null_group_rows(spark):
    """Code-review r11: the two-phase join must be NULL-SAFE on the
    group keys — a NULL group is a real window partition to the
    window path, so rows with NULL group keys must rank identically
    (not silently vanish) when the dispatch crosses the threshold."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        grouped_rank_auto,
    )

    rows = [("a", i, i) for i in range(5)] + [(None, i, 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, v long, tie long")
    ranked_w, _ = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk", skew_threshold=10**9
    )
    ranked_2, strat = grouped_rank_auto(
        df, ["g"], ["v", "tie"], "rk", skew_threshold=0
    )
    assert strat == "two_phase"
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    want = sorted((tuple(r) for r in ranked_w.collect()), key=key)
    got = sorted((tuple(r) for r in ranked_2.collect()), key=key)
    assert len(got) == 9  # every row survives, including NULL group
    assert got == want


# ---------------------------------------------------------------------
# skyline_2d (Pareto front)
# ---------------------------------------------------------------------


def _brute_skyline(pts, maxx, maxy):
    """Textbook O(n²) dominance over distinct (g, x, y) points."""
    pts = set(pts)
    out = set()
    for g, x, y in pts:
        dominated = False
        for g2, x2, y2 in pts:
            if g2 != g:
                continue
            bx = x2 >= x if maxx else x2 <= x
            sx = x2 > x if maxx else x2 < x
            by_ = y2 >= y if maxy else y2 <= y
            sy = y2 > y if maxy else y2 < y
            if bx and by_ and (sx or sy):
                dominated = True
                break
        if not dominated:
            out.add((g, x, y))
    return out


def test_skyline_matches_bruteforce_all_directions(spark):
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 3), rng.randint(0, 20), rng.randint(0, 20))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    for maxx in (True, False):
        for maxy in (True, False):
            got = {
                tuple(r)
                for r in skyline_2d(
                    df, "x", "y", by=["g"], maximize=(maxx, maxy)
                ).collect()
            }
            assert got == _brute_skyline(rows, maxx, maxy), (maxx, maxy)


def test_skyline_ungrouped_two_phase_equals_bruteforce(spark):
    """Ungrouped path = local skyline keyed by spark_partition_id,
    then a global scan over the union of local fronts; phase 1 never
    discards a true front point (dominance transitivity)."""
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    rng = random.Random(11)
    rows = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(300)]
    df = spark.createDataFrame(rows, "x int, y int").repartition(8)
    got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
    want = {
        (x, y) for (_, x, y) in _brute_skyline([("a", x, y) for x, y in rows], True, True)
    }
    assert got == want


def test_skyline_keep_rows_and_nulls(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    rows = [
        ("a", 1, 5, 10),
        ("a", 2, 5, 10),  # duplicate front point, different id
        ("a", 3, 4, 9),   # dominated
        ("a", 4, None, 99),  # NULL criterion: excluded entirely
    ]
    df = spark.createDataFrame(rows, "g string, id int, x int, y int")
    front = skyline_2d(df, "x", "y", by=["g"]).collect()
    assert [(r["x"], r["y"]) for r in front] == [(5, 10)]
    kept = skyline_2d(df, "x", "y", by=["g"], keep_rows=True)
    assert sorted(r["id"] for r in kept.collect()) == [1, 2]
    assert set(kept.columns) == set(df.columns)


def test_skyline_plan_keyed_window_no_join(spark):
    """The grouped plan is ONE keyed window over the distinct points —
    no self-join, no unpartitioned window (the 100 TB contract vs the
    O(n²) NOT-EXISTS oracle form)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i % 11, i % 7) for i in range(100)],
        "g string, x int, y int",
    )
    plan = (
        skyline_2d(df, "x", "y", by=["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan
    win_at = plan.find("Window")
    # the window spec carries the group key (keyed, not global):
    import re

    win_line = plan[win_at : plan.find("\n", win_at)]
    assert re.search(r"windowspecdefinition\(g#", win_line), win_line


def _brute_skyline_d(rows, maxs):
    """O(n²) dominance over distinct (g, *criteria) tuples, any d."""
    pts = set(rows)
    out = set()
    for p in pts:
        g, v = p[0], p[1:]
        dominated = False
        for q in pts:
            if q[0] != g:
                continue
            w = q[1:]
            ge = all(
                (wj >= vj) if m else (wj <= vj)
                for wj, vj, m in zip(w, v, maxs)
            )
            gt = any(
                (wj > vj) if m else (wj < vj)
                for wj, vj, m in zip(w, v, maxs)
            )
            if ge and gt:
                dominated = True
                break
        if not dominated:
            out.add(p)
    return out


def test_skyline_3d_matches_bruteforce(spark):
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    rng = random.Random(13)
    rows = [
        ("g%d" % (i % 2), rng.randint(0, 12), rng.randint(0, 12), rng.randint(0, 12))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y int, z int").repartition(8)
    for maxs in [(True, True, True), (True, False, True), (False, False, False)]:
        got = {
            tuple(r)
            for r in skyline(
                df, ["x", "y", "z"], by=["g"], maximize=list(maxs)
            ).collect()
        }
        assert got == _brute_skyline_d(rows, maxs), maxs


def test_skyline_3d_ungrouped_and_d2_delegation(spark):
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    rng = random.Random(17)
    rows = [
        ("a", rng.randint(0, 15), rng.randint(0, 15), rng.randint(0, 15))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y int, z int")
    got = {
        (r["x"], r["y"], r["z"])
        for r in skyline(df.drop("g").repartition(8), ["x", "y", "z"]).collect()
    }
    want = {p[1:] for p in _brute_skyline_d(rows, (True, True, True))}
    assert got == want
    # d=2 delegates to the pure-JVM window scan — no Python in the plan
    d2 = skyline(df, ["x", "y"], by=["g"], maximize=[True, False])
    plan = d2._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Join" not in plan
    got2 = {tuple(r) for r in d2.collect()}
    assert got2 == _brute_skyline_d(
        [(g, x, y) for (g, x, y, _) in rows], (True, False)
    )


def test_skyline_3d_guard_and_plan(spark):
    """Anti-chain-ish data past max_candidates fails loud; the global
    pass is a BROADCAST join (hash on the group key, or nested-loop
    ungrouped) over the checkpointed candidate frame — never a
    cartesian, never row-wise Python."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    df = spark.createDataFrame(
        [("g", i % 5, i % 3, i % 7) for i in range(60)],
        "g string, x int, y int, z int",
    )
    with _pytest.raises(ValueError, match="max_candidates"):
        skyline(df, ["x", "y", "z"], by=["g"], max_candidates=1)
    plan = (
        skyline(df, ["x", "y", "z"], by=["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    ungrouped = (
        skyline(df.drop("g"), ["x", "y", "z"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in ungrouped, ungrouped


def test_skyline_nan_and_null_criteria_excluded(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    rows = [
        ("g", 1.0, 1.0, 1.0),
        ("g", float("nan"), 9.0, 9.0),
        ("g", None, 9.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double, z double")
    got = skyline(df, ["x", "y", "z"], by=["g"]).collect()
    assert [(r["x"], r["y"], r["z"]) for r in got] == [(1.0, 1.0, 1.0)]
    with _pytest_raises_value_error():
        skyline(df, ["x"], by=["g"])


def _pytest_raises_value_error():
    import pytest as _pytest

    return _pytest.raises(ValueError, match="at least 2 criteria")


def test_skyline_null_group_key_is_a_real_group(spark):
    """A NULL by-key is a real group (repo-wide contract): its
    dominated points must be removed by the GLOBAL pass even when
    dominator and victim land in different partitions, and keep_rows
    must recover its front rows (review r12: plain == in the
    dominance/semi joins exempted NULL groups)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        skyline,
        skyline_2d,
    )

    rows = [(None, 1, 1, 1), (None, 2, 2, 2), ("g", 1, 1, 1)]
    df = spark.createDataFrame(
        rows, "g string, x int, y int, z int"
    ).repartition(6)
    got = {
        tuple(r) for r in skyline(df, ["x", "y", "z"], by=["g"]).collect()
    }
    assert got == {(None, 2, 2, 2), ("g", 1, 1, 1)}
    kept = skyline_2d(df, "x", "y", by=["g"], keep_rows=True).collect()
    assert {(r["g"], r["x"], r["y"]) for r in kept} == {
        (None, 2, 2),
        ("g", 1, 1),
    }


def test_skyline_d2_via_generic_excludes_nan(spark):
    """skyline()'s d=2 delegation must apply the same NaN exclusion
    as the d>2 branch (review r12: the delegation used to bypass the
    filter and Spark sorts NaN above every real value)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    rows = [("g", 1.0, 1.0), ("g", float("nan"), 9.0), ("g", 2.0, float("nan"))]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = skyline(df, ["x", "y"], by=["g"]).collect()
    assert [(r["x"], r["y"]) for r in got] == [(1.0, 1.0)]


def test_skyline_bigint_exact_past_2_53(spark):
    """The local front compares NATIVE dtypes: two BIGINTs that
    collide in float64 (2^53 vs 2^53+1) must stay incomparable-exact
    — both are true front points (review r12: the float64 matrix
    merged them and pruned one)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    big = 2**53
    rows = [("g", big + 1, 4, 0), ("g", big, 5, 0)]
    df = spark.createDataFrame(rows, "g string, x long, y long, z long")
    got = {
        (r["x"], r["y"]) for r in skyline(df, ["x", "y", "z"], by=["g"]).collect()
    }
    assert got == {(big + 1, 4), (big, 5)}


def test_skyline_2d_ungrouped_guard(spark):
    """Near-anti-chain 2-D data must fail loud before the phase-2
    single-reducer window, mirroring the d>2 max_candidates guard."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    # perfect anti-chain: every point on the front
    df = spark.createDataFrame(
        [(i, 100 - i) for i in range(100)], "x int, y int"
    ).repartition(4)
    with _pytest.raises(ValueError, match="max_candidates"):
        skyline_2d(df, "x", "y", max_candidates=10)
    # and the guard passes through the generic entry point
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    with _pytest.raises(ValueError, match="max_candidates"):
        skyline(df, ["x", "y"], max_candidates=10)


# ---------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------


def test_bootstrap_ci_matches_independent_replication(spark):
    """The whole mechanism — md5 replica weights, replica means,
    interpolated percentile envelope — must equal an independent
    hashlib/python replication bit for bit (integral values keep
    every mean an exact-BIGINT ratio)."""
    import hashlib
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        _POISSON1_CDF,
        poisson_bootstrap_ci,
    )

    rows = [("g%d" % (i % 2), i, 10 + (i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id int, x int")
    out = {
        r["g"]: r
        for r in poisson_bootstrap_ci(
            df, "x", "id", by=["g"], n_replicas=20, seed=7
        ).collect()
    }

    def w_of(seed, b, i):
        if b == -1:
            return 1
        h = hashlib.md5(f"{seed}§{b}§{i}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 4294967296.0
        for k, c in enumerate(_POISSON1_CDF):
            if u < c:
                return k
        return 8

    def pct(vals, p):
        n = len(vals)
        r = (n - 1) * p
        lo_i = int(math.floor(r))
        frac = r - lo_i
        return vals[lo_i] + (vals[min(lo_i + 1, n - 1)] - vals[lo_i]) * frac

    for g in ("g0", "g1"):
        sub = [(i, x) for (gg, i, x) in rows if gg == g]
        means = []
        for b in range(-1, 20):
            sx = sum(w_of(7, b, i) * x for i, x in sub)
            sw = sum(w_of(7, b, i) for i, x in sub)
            means.append(sx / sw)
        point, boot = means[0], sorted(means[1:])
        want = tuple(
            math.floor(v * 1e6 + 0.5) / 1e6
            for v in (point, pct(boot, 0.025), pct(boot, 0.975))
        )
        got = (out[g]["point_mean"], out[g]["ci_lo"], out[g]["ci_hi"])
        assert got == want, (g, got, want)
        assert got[1] <= got[0] <= got[2]


def test_bootstrap_ci_seed_sensitivity_and_null_group(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    rows = [(None if i % 2 else "g", i, float(i % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id int, x double")
    a = {
        r["g"]: r
        for r in poisson_bootstrap_ci(
            df, "x", "id", by=["g"], n_replicas=10, seed=1
        ).collect()
    }
    # a NULL group key is a real group
    assert None in a and "g" in a
    b = {
        r["g"]: r
        for r in poisson_bootstrap_ci(
            df, "x", "id", by=["g"], n_replicas=10, seed=2
        ).collect()
    }
    # different seed, different replicas — point estimate identical
    assert a["g"]["point_mean"] == b["g"]["point_mean"]
    assert (a["g"]["ci_lo"], a["g"]["ci_hi"]) != (b["g"]["ci_lo"], b["g"]["ci_hi"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_replicas"):
        poisson_bootstrap_ci(df, "x", "id", n_replicas=1, seed=1)


def test_bootstrap_ci_plan_no_window_no_join(spark):
    """Explode + two hash aggs only — the shuffle is replica-count-
    sized thanks to map-side partials; no window, no join."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [("g", i, i % 5) for i in range(100)], "g string, id int, x int"
    )
    plan = (
        poisson_bootstrap_ci(df, "x", "id", by=["g"], seed=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan, plan


def test_bootstrap_ci_null_values_and_id_guard(spark):
    """NULL values are excluded (their weights must not deflate the
    means) and NULL/duplicate ids fail loud — colliding ids resample
    as one block and silently corrupt the CI (review r12)."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, None)], "g string, id int, x int"
    )
    row = poisson_bootstrap_ci(
        df, "x", "id", by=["g"], n_replicas=5, seed=3
    ).collect()[0]
    assert row["point_mean"] == 10.0  # not 5.0
    dup = spark.createDataFrame(
        [("g", 1, 10), ("g", 1, 20)], "g string, id int, x int"
    )
    with _pytest.raises(ValueError, match="duplicates"):
        poisson_bootstrap_ci(dup, "x", "id", by=["g"], n_replicas=5, seed=3)
    nulls = spark.createDataFrame(
        [("g", None, 10), ("g", 2, 20)], "g string, id int, x int"
    )
    with _pytest.raises(ValueError, match="NULLs"):
        poisson_bootstrap_ci(nulls, "x", "id", by=["g"], n_replicas=5, seed=3)
    # check_ids=False skips the guard job for PK-backed callers
    out = poisson_bootstrap_ci(
        dup, "x", "id", by=["g"], n_replicas=5, seed=3, check_ids=False
    ).collect()
    assert len(out) == 1


def test_skyline_4d_matches_bruteforce(spark):
    """The d>2 path is generic over d — pin it at four criteria with
    mixed directions against the quadratic definition."""
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline

    rng = random.Random(23)
    rows = [
        ("g", rng.randint(0, 6), rng.randint(0, 6), rng.randint(0, 6), rng.randint(0, 6))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, a int, b int, c int, d int")
    maxs = (True, False, True, False)
    got = {
        tuple(r)
        for r in skyline(
            df, ["a", "b", "c", "d"], by=["g"], maximize=list(maxs)
        ).collect()
    }
    uniq = set(rows)
    want = set()
    for p in uniq:
        dominated = False
        for q in uniq:
            ge = all(
                (qj >= pj) if m else (qj <= pj)
                for qj, pj, m in zip(q[1:], p[1:], maxs)
            )
            gt = any(
                (qj > pj) if m else (qj < pj)
                for qj, pj, m in zip(q[1:], p[1:], maxs)
            )
            if ge and gt:
                dominated = True
                break
        if not dominated:
            want.add(p)
    assert got == want


# ---------------------------------------------------------------------
# r13 hardening regressions (ADVICE r12 + VERDICT r12 item 4)
# ---------------------------------------------------------------------


def test_histogram_auto_bounds_empty_and_all_null_fail_loud(spark):
    """Auto-bounds on an empty or all-NULL column must raise a
    diagnostic ValueError, not the bare float(None) TypeError the
    min/max pre-pass used to surface (VERDICT r12 item 4; mirrors the
    r12 equidepth_histogram_auto hardening)."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import histogram

    empty = spark.createDataFrame([], "v double")
    with _pytest.raises(ValueError, match="empty or all-NULL"):
        histogram(empty, "v", bins=4)
    allnull = spark.createDataFrame([(None,), (None,)], "v double")
    with _pytest.raises(ValueError, match="empty or all-NULL"):
        histogram(allnull, "v", bins=4)
    # explicit bounds still work on empty input (no pre-pass)
    assert histogram(empty, "v", bins=2, lo=0.0, hi=1.0).count() == 0


def test_skyline_minimize_survives_long_min(spark):
    """Direction is expressed via sort order + running min/max, NOT
    arithmetic negation: -LONG_MIN overflows (non-ANSI Spark wraps it
    back to LONG_MIN, silently corrupting the scan). A LONG_MIN point
    under minimize must dominate everything (ADVICE r12)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    lmin = -(2**63)
    rows = [("g", lmin, lmin), ("g", 0, 0), ("g", -5, 7), ("g", 7, -5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        (r["x"], r["y"])
        for r in skyline_2d(
            df, "x", "y", by=["g"], maximize=(False, False)
        ).collect()
    }
    assert got == {(lmin, lmin)}
    # and maximize keeps LONG_MIN rows only when undominated
    got_max = {
        (r["x"], r["y"])
        for r in skyline_2d(
            df, "x", "y", by=["g"], maximize=(True, True)
        ).collect()
    }
    want = _brute_skyline(rows, True, True)
    assert got_max == {(x, y) for (_, x, y) in want}


def test_skyline_orderable_non_numeric_criteria(spark):
    """Dominance is defined for ANY ordered type — with negation gone,
    string criteria work (sort order + running min/max only)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import skyline_2d

    rows = [
        ("g", "a", "zz"), ("g", "b", "zz"), ("g", "b", "aa"),
        ("g", "a", "mm"),
    ]
    df = spark.createDataFrame(rows, "g string, sx string, sy string")
    got = {
        (r["sx"], r["sy"])
        for r in skyline_2d(
            df, "sx", "sy", by=["g"], maximize=(True, True)
        ).collect()
    }
    assert got == {(x, y) for (_, x, y) in _brute_skyline(rows, True, True)}


def test_skyline_missing_criterion_fails_loud(spark):
    """A misspelled criterion used to be silently skipped by the
    NULL/NaN exclusion (and an all-miss produced where(None)) —
    must raise a ValueError naming the column (ADVICE r12)."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        skyline,
        skyline_2d,
    )

    df = spark.createDataFrame([("g", 1, 2)], "g string, x int, y int")
    with _pytest.raises(ValueError, match="nope"):
        skyline_2d(df, "x", "nope", by=["g"])
    with _pytest.raises(ValueError, match="typo"):
        skyline(df, ["x", "y", "typo"], by=["g"])


def test_bootstrap_ci_weighted_sum_survives_bigint_overflow(spark):
    """Weights reach 8, so SUM(w*x) over large-magnitude BIGINTs can
    exceed 2^63 — the accumulator must widen to decimal(38,0) (the
    hierarchy_flatten digest idiom) instead of wrapping silently
    under non-ANSI Spark (ADVICE r12). 3 rows of 2^62 already
    overflow the unweighted point-estimate sum."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    v = 2**62
    df = spark.createDataFrame(
        [("g", i, v) for i in range(3)], "g string, id int, x long"
    )
    row = poisson_bootstrap_ci(
        df, "x", "id", by=["g"], n_replicas=8, seed=5
    ).collect()[0]
    assert row["point_mean"] == float(v)  # exact ratio 3*2^62 / 3
    # every replica mean is a mean of copies of v: ci collapses to v
    # (replicas with total weight 0 are NULL and ignored)
    assert row["ci_lo"] == float(v) and row["ci_hi"] == float(v)


# ---------------------------------------------------------------------
# cuped_adjustment (born r13)
# ---------------------------------------------------------------------


def test_cuped_hand_computed_and_contracts(spark):
    """Hand-computed θ and adjusted moments on a 6-unit experiment;
    NULL metric/covariate rows excluded; NULL arm is a real arm;
    constant covariate fails loud."""
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cuped_adjustment,
    )

    rows = [
        ("A", 10, 1), ("A", 20, 3), ("A", 30, 5),
        ("B", 12, 2), ("B", 22, 4), ("B", 35, 6),
        ("A", None, 9), ("B", 7, None),  # excluded
    ]
    df = spark.createDataFrame(rows, "arm string, y long, x long")
    out = {r["arm"]: r for r in cuped_adjustment(df, "arm", "y", "x").collect()}
    # pooled moments over the 6 kept units
    xs = [1, 3, 5, 2, 4, 6]
    ys = [10, 20, 30, 12, 22, 35]
    n = 6.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert abs(out["A"]["theta"] - round(theta, 6)) < 1e-9
    for arm, keep in (("A", [0, 1, 2]), ("B", [3, 4, 5])):
        ax = [xs[i] for i in keep]
        ay = [ys[i] for i in keep]
        na = float(len(keep))
        my, mx = sum(ay) / na, sum(ax) / na
        vy = sum((v - my) ** 2 for v in ay) / (na - 1)
        vx = sum((v - mx) ** 2 for v in ax) / (na - 1)
        cv = sum((a - mx) * (b - my) for a, b in zip(ax, ay)) / (na - 1)
        va = vy - 2 * theta * cv + theta * theta * vx
        r = out[arm]
        assert r["n_units"] == 3
        # outputs are rounded at 1e-4 — tolerate the half-step
        assert abs(r["mean_metric"] - my) < 1e-4
        assert abs(r["mean_adjusted"] - (my - theta * (mx - sx / n))) < 1e-4
        assert abs(r["var_metric"] - vy) < 1e-4
        assert abs(r["var_adjusted"] - va) < 2e-4
    # NULL arm is a real group
    withnull = spark.createDataFrame(
        rows[:6] + [(None, 50, 7), (None, 60, 9)], "arm string, y long, x long"
    )
    arms = {r["arm"] for r in cuped_adjustment(withnull, "arm", "y", "x").collect()}
    assert arms == {"A", "B", None}
    # constant covariate: theta undefined
    const = spark.createDataFrame(
        [("A", 1, 5), ("B", 2, 5)], "arm string, y long, x long"
    )
    with _pytest.raises(ValueError, match="constant"):
        cuped_adjustment(const, "arm", "y", "x")
    # fewer than 2 usable units
    tiny = spark.createDataFrame(
        [("A", 1, 5), ("B", None, 6)], "arm string, y long, x long"
    )
    with _pytest.raises(ValueError, match="at least 2"):
        cuped_adjustment(tiny, "arm", "y", "x")


def test_cuped_reduces_variance_on_correlated_covariate(spark):
    """The point of CUPED: with a covariate strongly correlated to
    the metric, adjusted variance drops by ≈ρ²; with an independent
    covariate it stays put (never grows materially)."""
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cuped_adjustment,
    )

    rng = random.Random(13)
    rows = []
    for i in range(400):
        x = rng.randint(0, 1000)
        noise = rng.randint(-50, 50)
        rows.append(("A" if i % 2 == 0 else "B", x + noise, x))
    df = spark.createDataFrame(rows, "arm string, y long, x long")
    out = cuped_adjustment(df, "arm", "y", "x").collect()
    for r in out:
        assert r["var_adjusted"] < 0.1 * r["var_metric"], r
        assert r["var_reduction_pct"] > 90.0


def test_cuped_plan_single_data_agg_no_join(spark):
    """ONE data-proportional hash aggregation; the pooled window runs
    over the |arms| frame; no joins anywhere (the r13 design replaced
    the broadcast-θ join with moment algebra)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        cuped_adjustment,
    )

    df = spark.createDataFrame(
        [("g%d" % (i % 2), i, i % 7) for i in range(100)],
        "arm string, y long, x long",
    )
    plan = (
        cuped_adjustment(df, "arm", "y", "x")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------
# mutual_information (born r13)
# ---------------------------------------------------------------------


def test_mutual_information_hand_computed(spark):
    """Perfect dependence: MI = H(X) = H(Y), NMI = 1. Independence:
    MI = 0. NULL categories are real categories."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mutual_information,
    )

    # perfect dependence: y determined by x, both uniform over 2 values
    dep = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")], "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert r["n"] == 4
    assert abs(r["h_x"] - 1.0) < 1e-9 and abs(r["h_y"] - 1.0) < 1e-9
    assert abs(r["h_xy"] - 1.0) < 1e-9
    assert abs(r["mi"] - 1.0) < 1e-9 and abs(r["nmi"] - 1.0) < 1e-9
    # independence: all four combos equally likely
    ind = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")], "x string, y string"
    )
    r2 = mutual_information(ind, "x", "y").collect()[0]
    assert abs(r2["mi"]) < 1e-9
    assert abs(r2["h_xy"] - 2.0) < 1e-9
    # skewed hand-computed case: p(a,p)=1/2, p(a,q)=1/4, p(b,q)=1/4
    sk = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("a", "q"), ("b", "q")], "x string, y string"
    )
    r3 = mutual_information(sk, "x", "y").collect()[0]
    hx = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    hy = -(0.5 * math.log2(0.5) + 0.5 * math.log2(0.5))
    hxy = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
    assert abs(r3["h_x"] - round(hx, 6)) < 1e-6
    assert abs(r3["h_y"] - round(hy, 6)) < 1e-6
    assert abs(r3["h_xy"] - round(hxy, 6)) < 1e-6
    assert abs(r3["mi"] - round(hx + hy - hxy, 6)) < 1e-5
    # NULL is a real category: a NULL-y row shifts the joint frame
    withnull = spark.createDataFrame(
        [("a", "p"), ("a", None), ("b", "p"), ("b", None)], "x string, y string"
    )
    r4 = mutual_information(withnull, "x", "y").collect()[0]
    assert r4["n"] == 4 and abs(r4["h_y"] - 1.0) < 1e-9
    # constant column: zero marginal entropy, NMI undefined (NULL)
    const = spark.createDataFrame(
        [("a", "p"), ("a", "q")], "x string, y string"
    )
    r5 = mutual_information(const, "x", "y").collect()[0]
    assert r5["h_x"] == 0.0 and r5["nmi"] is None


def test_mutual_information_grouped_keyed_windows(spark):
    """Grouped MI: every window in the plan is keyed (no global
    reducer) and groups compute independently."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mutual_information,
    )

    rows = [("g1", "a", "p")] * 3 + [("g1", "b", "q")] * 3 + [
        ("g2", "a", "p"), ("g2", "a", "q"), ("g2", "b", "p"), ("g2", "b", "q"),
    ]
    df = spark.createDataFrame(rows, "g string, x string, y string")
    out = {r["g"]: r for r in mutual_information(df, "x", "y", by=["g"]).collect()}
    assert abs(out["g1"]["mi"] - 1.0) < 1e-9   # perfectly dependent
    assert abs(out["g2"]["mi"]) < 1e-9          # independent
    qe = (
        mutual_information(df, "x", "y", by=["g"])
        ._jdf.queryExecution()
    )
    plan = qe.sparkPlan().toString()
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------
# stratified_ate + jackknife_ratio_se (born r13)
# ---------------------------------------------------------------------


def test_stratified_ate_hand_computed_and_contracts(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        stratified_ate,
    )

    rows = [
        ("s1", True, 10), ("s1", True, 14), ("s1", False, 8), ("s1", False, 10),
        ("s2", True, 30), ("s2", False, 20),
        ("s1", True, None),  # NULL outcome excluded
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y long")
    out = {r["stratum"]: r for r in stratified_ate(df, "s", "t", "y").collect()}
    # s1: mean1=(10+14)/2=12, mean0=9, eff=3, w=4/6; s2: eff=10, w=2/6
    assert out["s1"]["n_s"] == 4 and out["s2"]["n_s"] == 2
    assert out["s1"]["effect"] == 3.0 and out["s2"]["effect"] == 10.0
    ate = (4 / 6) * 3 + (2 / 6) * 10
    for r in out.values():
        assert abs(r["ate"] - ate) < 1e-4
    assert abs(out["s1"]["contribution"] - (4 / 6) * 3) < 1e-4
    # NULL stratum is a real stratum
    ns = spark.createDataFrame(
        rows[:6] + [(None, True, 5), (None, False, 3)],
        "s string, t boolean, y long",
    )
    got = {r["stratum"] for r in stratified_ate(ns, "s", "t", "y").collect()}
    assert got == {"s1", "s2", None}
    # NULL treatment flag fails loud
    nt = spark.createDataFrame(
        rows[:6] + [("s1", None, 5)], "s string, t boolean, y long"
    )
    with _pytest.raises(ValueError, match="NULL values in treatment"):
        stratified_ate(nt, "s", "t", "y")
    # positivity violation: a stratum with no control arm
    pv = spark.createDataFrame(
        rows[:6] + [("s3", True, 9)], "s string, t boolean, y long"
    )
    with _pytest.raises(ValueError, match="positivity"):
        stratified_ate(pv, "s", "t", "y")


def _brute_jackknife(vals):
    """Reference leave-one-out jackknife for R = Σy/Σx."""
    import math

    n = len(vals)
    sy = sum(y for y, _ in vals)
    sx = sum(x for _, x in vals)
    r = sy / sx
    loo = [(sy - y) / (sx - x) for y, x in vals]
    rbar = sum(loo) / n
    var = (n - 1) / n * sum((v - rbar) ** 2 for v in loo)
    return r, math.sqrt(var), (n - 1) * (rbar - r)


def test_jackknife_ratio_matches_bruteforce(spark):
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        jackknife_ratio_se,
    )

    rng = random.Random(31)
    data = {}
    rows = []
    for g in ("a", "b", None):
        vals = [(rng.randint(50, 500), rng.randint(1, 20)) for _ in range(40)]
        data[g] = vals
        rows += [(g, y, x) for y, x in vals]
    df = spark.createDataFrame(rows, "g string, y long, x long")
    out = {r["g"]: r for r in jackknife_ratio_se(df, ["g"], "y", "x").collect()}
    for g, vals in data.items():
        r, se, bias = _brute_jackknife(vals)
        got = out[g]
        assert got["n_units"] == 40
        assert abs(got["ratio"] - r) < 1e-6
        assert abs(got["se_jack"] - se) < 1e-5, (g, got["se_jack"], se)
        assert abs(got["bias_jack"] - bias) < 1e-5
        assert abs(got["ci_lo"] - (r - 1.959964 * se)) < 1e-4
        assert abs(got["ci_hi"] - (r + 1.959964 * se)) < 1e-4


def test_jackknife_fail_loud_contracts(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        jackknife_ratio_se,
    )

    # n < 2
    tiny = spark.createDataFrame([("g", 5, 2)], "g string, y long, x long")
    with _pytest.raises(ValueError, match="at least 2"):
        jackknife_ratio_se(tiny, ["g"], "y", "x")
    # one unit carries the whole denominator: leave-out hits 0
    deg = spark.createDataFrame(
        [("g", 5, 7), ("g", 3, 0), ("g", 2, 0)], "g string, y long, x long"
    )
    with _pytest.raises(ValueError, match="denominator of zero"):
        jackknife_ratio_se(deg, ["g"], "y", "x")


def test_jackknife_plan_broadcast_join_no_window(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        jackknife_ratio_se,
    )

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i + 1, (i % 9) + 1) for i in range(200)],
        "g string, y long, x long",
    )
    qe = jackknife_ratio_se(df, ["g"], "y", "x")._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------
# forecast_eval_naive (born r13)
# ---------------------------------------------------------------------


def test_forecast_eval_hand_computed(spark):
    """Hand-computed MAE/RMSE/MASE on a 10-day series with one gap:
    calendar-true lags mean the day after the gap has no naive-1
    forecast and drops out of the eval set entirely."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        forecast_eval_naive,
    )

    # days 0..10 with day 5 missing; season=3 for compactness
    series = {0: 10, 1: 12, 2: 9, 3: 15, 4: 11, 6: 14, 7: 8, 8: 13, 9: 7, 10: 16}
    df = spark.createDataFrame(
        [("g", d, y) for d, y in series.items()], "g string, d long, y long"
    )
    out = forecast_eval_naive(df, ["g"], "d", "y", season=3).collect()[0]
    ev = [
        d for d in series
        if (d - 1) in series and (d - 3) in series
    ]
    e1 = [series[d] - series[d - 1] for d in ev]
    es = [series[d] - series[d - 3] for d in ev]
    n = len(ev)
    mae1 = sum(abs(e) for e in e1) / n
    maes = sum(abs(e) for e in es) / n
    assert out["n_eval"] == n
    assert abs(out["mae_naive1"] - mae1) < 1e-6
    assert abs(out["mae_snaive"] - maes) < 1e-6
    assert abs(out["rmse_snaive"] - math.sqrt(sum(e * e for e in es) / n)) < 1e-6
    assert abs(out["bias_snaive"] - sum(es) / n) < 1e-6
    assert abs(out["mase_snaive"] - maes / mae1) < 1e-5


def test_forecast_eval_contracts(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        forecast_eval_naive,
    )

    # constant series: mae1 = 0 → MASE NULL (not a division blowup)
    const = spark.createDataFrame(
        [("g", d, 5) for d in range(10)], "g string, d long, y long"
    )
    r = forecast_eval_naive(const, ["g"], "d", "y", season=3).collect()[0]
    assert r["mae_naive1"] == 0.0 and r["mase_snaive"] is None
    # series shorter than the season: nothing evaluable → fail loud
    short = spark.createDataFrame(
        [("g", d, 5) for d in range(3)], "g string, d long, y long"
    )
    with _pytest.raises(ValueError, match="no group has a single day"):
        forecast_eval_naive(short, ["g"], "d", "y", season=7)
    with _pytest.raises(ValueError, match="season"):
        forecast_eval_naive(const, ["g"], "d", "y", season=1)
    # NULL group key is a real group; NULL values excluded
    ng = spark.createDataFrame(
        [(None, d, 5 + d) for d in range(10)] + [(None, 4, None)],
        "g string, d long, y long",
    )
    rows = forecast_eval_naive(ng.where("y is not null or y is null"),
                               ["g"], "d", "y", season=3).collect()
    assert len(rows) == 1 and rows[0]["g"] is None


def test_forecast_eval_plan_keyed_windows_no_join(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        forecast_eval_naive,
    )

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i // 3, (i * 7) % 23) for i in range(90)],
        "g string, d long, y long",
    )
    qe = forecast_eval_naive(df, ["g"], "d", "y")._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "Join" not in plan, plan
    sp = qe.sparkPlan()
    # both RANGE windows keyed by g
    names = []
    stack = [sp]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "WindowExec":
            assert not node.partitionSpec().isEmpty(), "unpartitioned window"
            names.append(1)
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    assert names, "no WindowExec found"


# ---------------------------------------------------------------------
# msprt_always_valid + capture_recapture_estimate (born r13)
# ---------------------------------------------------------------------


def test_msprt_matches_independent_replication(spark):
    """Python replication of the log-Λ recursion over a hand-built
    diff series; the p-value must be monotone non-increasing."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        msprt_always_valid,
    )

    xs = [3, -1, 4, 1, -5, 9, 2, -6, 5, 3]
    df = spark.createDataFrame(
        [("g", d, x) for d, x in enumerate(xs)], "g string, d long, x long"
    )
    h = 4.0
    out = msprt_always_valid(
        df, ["g"], "d", "x", mixture_h=h, alpha=0.1
    ).orderBy("period").collect()
    n_all = len(xs)
    mu = sum(xs) / n_all
    s2 = sum((v - mu) ** 2 for v in xs) / (n_all - 1)
    run_max, prev_p = None, 1.0
    for i, r in enumerate(out):
        n = i + 1
        dbar = sum(xs[: i + 1]) / n
        ll = 0.5 * math.log(s2 / (s2 + n * h)) + (
            n * n * dbar * dbar * h
        ) / (2 * s2 * (s2 + n * h))
        run_max = ll if run_max is None else max(run_max, ll)
        p = min(1.0, math.exp(-run_max))
        assert r["n"] == n
        assert abs(r["log_lambda"] - ll) < 1e-5
        assert abs(r["p_always_valid"] - p) < 1e-5
        assert r["p_always_valid"] <= prev_p + 1e-9  # anytime-valid: monotone
        prev_p = r["p_always_valid"]
        assert r["rejected"] == (run_max > -math.log(0.1))


def test_msprt_fail_loud_contracts(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        msprt_always_valid,
    )

    const = spark.createDataFrame(
        [("g", d, 5) for d in range(10)], "g string, d long, x long"
    )
    with _pytest.raises(ValueError, match="non-constant"):
        msprt_always_valid(const, ["g"], "d", "x")
    one = spark.createDataFrame([("g", 0, 5)], "g string, d long, x long")
    with _pytest.raises(ValueError, match="non-constant"):
        msprt_always_valid(one, ["g"], "d", "x")
    ok = spark.createDataFrame(
        [("g", d, d % 3) for d in range(9)], "g string, d long, x long"
    )
    with _pytest.raises(ValueError, match="alpha"):
        msprt_always_valid(ok, ["g"], "d", "x", alpha=2.0)
    with _pytest.raises(ValueError, match="mixture_h"):
        msprt_always_valid(ok, ["g"], "d", "x", mixture_h=0.0)
    # NULL group key is a real group
    ng = spark.createDataFrame(
        [(None, d, d % 3) for d in range(9)], "g string, d long, x long"
    )
    assert msprt_always_valid(ng, ["g"], "d", "x").count() == 9


def test_msprt_under_true_effect_rejects(spark):
    """A large persistent shift must drive the always-valid p below
    alpha (power sanity, not a tuned threshold)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        msprt_always_valid,
    )

    xs = [100 + (d % 5) for d in range(60)]  # strong positive effect
    df = spark.createDataFrame(
        [("g", d, x) for d, x in enumerate(xs)], "g string, d long, x long"
    )
    last = (
        msprt_always_valid(df, ["g"], "d", "x", mixture_h=100.0, alpha=0.05)
        .orderBy("period")
        .collect()[-1]
    )
    assert last["rejected"] and last["p_always_valid"] < 0.05


def test_capture_recapture_hand_computed_and_contracts(spark):
    import math

    import pytest as _pytest
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        capture_recapture_estimate,
    )

    # population 100; A = ids < 40 (n_a=40); B = ids % 2 == 0 (n_b=50);
    # overlap = even ids < 40 = 20 → Chapman: 41*51/21 - 1
    df = spark.range(100).withColumnRenamed("id", "uid")
    out = capture_recapture_estimate(
        df, "uid", F.col("uid") < 40, F.col("uid") % 2 == 0
    ).collect()[0]
    assert (out["n_a"], out["n_b"], out["m_overlap"]) == (40, 50, 20)
    n_hat = 41 * 51 / 21 - 1
    assert abs(out["n_estimated"] - n_hat) < 1e-4
    var = 41 * 51 * 20 * 30 / (21 * 21 * 22)
    assert abs(out["se"] - math.sqrt(var)) < 1e-4
    assert out["n_union"] == 70
    assert abs(out["capture_rate_a"] - 20 / 50) < 1e-6
    # empty sample and zero overlap fail loud
    with _pytest.raises(ValueError, match="empty capture"):
        capture_recapture_estimate(
            df, "uid", F.col("uid") < 0, F.col("uid") % 2 == 0
        )
    with _pytest.raises(ValueError, match="zero overlap"):
        capture_recapture_estimate(
            df, "uid", F.col("uid") < 40, F.col("uid") >= 60
        )
