"""operators/mleval: exact AUC-ROC, calibration bins, PR sweep."""

from __future__ import annotations

import pytest

from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
    auc_roc,
    calibration_bins,
    precision_recall_at,
)


def _brute_auc(pairs):
    """O(P·N) reference: mean over (pos, neg) pairs of
    1[s+ > s-] + ½·1[s+ = s-]."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp in pos
        for sn in neg
    )
    return num / (len(pos) * len(neg))


def test_auc_perfect_and_tied(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "s bigint, y int"
    )
    row = auc_roc(df, "s", "y").collect()[0]
    assert row["auc"] == 1.0
    assert (row["n_pos"], row["n_neg"]) == (2, 2)

    tied = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 1)], "s bigint, y int"
    )
    assert auc_roc(tied, "s", "y").collect()[0]["auc"] == 0.5


def test_auc_matches_bruteforce_grouped(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", rng.randrange(0, 12), rng.randrange(0, 2))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y int")
    got = {
        r["g"]: r["auc"] for r in auc_roc(df, "s", "y", by=["g"]).collect()
    }
    for g in ("g0", "g1", "g2"):
        want = _brute_auc([(s, y) for gg, s, y in rows if gg == g])
        assert got[g] == pytest.approx(want, abs=1e-6), g


def test_auc_degenerate_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 2, 1)],
        "g string, s bigint, y int",
    )
    got = {r["g"]: r["auc"] for r in auc_roc(df, "s", "y", by=["g"]).collect()}
    assert got["a"] is None  # no negatives: AUC undefined, not a crash
    assert got["b"] == 1.0


def test_calibration_bins_hand_case(spark):
    # 10 rows in [0,1), 2 bins of width .5: low bin 1/4 pos, high 3/6
    rows = [(0.1, 0), (0.2, 0), (0.3, 1), (0.4, 0)] + [
        (0.6, 1), (0.7, 0), (0.8, 1), (0.9, 1), (0.95, 0), (0.99, 0)
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["frac_pos"])
        for r in calibration_bins(df, "s", "y", n_bins=2).collect()
    }
    assert got[0] == (4, 1, 0.25)
    assert got[1] == (6, 3, 0.5)


def test_calibration_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-0.5, 0), (0.2, 1), (1.7, 1)], "s double, y int"
    )
    got = {r["bin"]: r["n"] for r in calibration_bins(df, "s", "y", n_bins=4).collect()}
    assert got[0] == 2  # the -0.5 clamps into bin 0
    assert got[3] == 1  # the 1.7 clamps into the top bin
    assert sum(got.values()) == 3  # nothing silently dropped


def test_precision_recall_grid(spark):
    # scores 1..6, positives at 4,5,6
    df = spark.createDataFrame(
        [(i, 1 if i >= 4 else 0) for i in range(1, 7)], "s bigint, y int"
    )
    got = {
        r["threshold"]: r
        for r in precision_recall_at(
            df, "s", "y", thresholds=[2, 4, 7]
        ).collect()
    }
    # t=2: keeps 2..6 -> tp=3 fp=2 fn=0
    assert (got[2]["tp"], got[2]["fp"], got[2]["fn"]) == (3, 2, 0)
    assert got[2]["precision"] == 0.6 and got[2]["recall"] == 1.0
    # t=4: keeps 4..6 -> perfect
    assert got[4]["precision"] == 1.0 and got[4]["recall"] == 1.0
    assert got[4]["f1"] == 1.0
    # t=7 keeps nothing: precision undefined (NULL), recall 0 — and the
    # grid row still EXISTS
    assert (got[7]["tp"], got[7]["fp"], got[7]["fn"]) == (0, 0, 3)
    assert got[7]["precision"] is None and got[7]["recall"] == 0.0
    with pytest.raises(ValueError, match="empty threshold"):
        precision_recall_at(df, "s", "y", thresholds=[])


def test_auc_plan_has_no_per_row_window(spark):
    """The window must run over the per-distinct-score aggregate, not
    the raw rows: an Aggregate sits BELOW the Window in the optimized
    plan (the 100 TB contract in the module docstring)."""
    df = spark.createDataFrame(
        [("g", i % 7, i % 2) for i in range(100)], "g string, s bigint, y int"
    )
    plan = (
        auc_roc(df, "s", "y", by=["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    win_at = plan.find("Window")
    agg_below = plan.find("Aggregate", win_at)
    assert win_at >= 0 and agg_below > win_at, plan


def test_lift_hand_case(spark):
    """4 rows, 2 buckets: top half (scores 4, 3) holds both positives
    -> gain 1.0 at bucket 1, lift = 2× base rate."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [(4, 1), (3, 1), (2, 0), (1, 0)], "s int, y int"
    )
    got = {r["bucket"]: r for r in lift_gains(df, "s", "y", 2).collect()}
    assert set(got) == {1, 2}
    b1, b2 = got[1], got[2]
    assert (b1["n"], b1["n_pos"], b1["cum_n"], b1["cum_pos"]) == (2, 2, 2, 2)
    assert b1["gain"] == 1.0 and b1["capture"] == 0.5 and b1["lift"] == 2.0
    assert (b2["n"], b2["n_pos"], b2["cum_n"], b2["cum_pos"]) == (2, 0, 4, 2)
    assert b2["gain"] == 1.0 and b2["capture"] == 1.0 and b2["lift"] == 1.0


def test_lift_ties_collapse_into_one_bucket(spark):
    """All rows share one score: NTILE would split them arbitrarily;
    lift_gains puts the whole run in the LAST bucket it spans (k),
    keeping tie handling deterministic."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame([(5, i % 2) for i in range(10)], "s int, y int")
    rows = lift_gains(df, "s", "y", 4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 4
    assert rows[0]["n"] == 10 and rows[0]["lift"] == 1.0


def test_lift_no_positives_group_null_lift(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [("a", 3, 1), ("a", 1, 0), ("b", 2, 0), ("b", 1, 0)],
        "g string, s int, y int",
    )
    got = {
        (r["g"], r["bucket"]): r
        for r in lift_gains(df, "s", "y", 2, by=["g"]).collect()
    }
    assert got[("b", 1)]["lift"] is None and got[("b", 1)]["gain"] is None
    assert got[("b", 1)]["capture"] == 0.5
    assert got[("a", 1)]["lift"] == 2.0


def test_lift_null_scores_excluded(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [(4, 1), (None, 1), (1, 0)], "s int, y int"
    )
    rows = lift_gains(df, "s", "y", 2).collect()
    assert sum(r["n"] for r in rows) == 2  # the NULL-score row is gone
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        lift_gains(df, "s", "y", 0)


def test_lift_plan_windows_over_aggregate_only(spark):
    """Both cumulative windows run over aggregated frames (distinct
    scores, then buckets) — an Aggregate sits below the first Window
    in the optimized plan, same 100 TB contract as auc_roc."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [("g", i % 7, i % 2) for i in range(100)], "g string, s bigint, y int"
    )
    plan = (
        lift_gains(df, "s", "y", 10, by=["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    win_at = plan.find("Window")
    agg_below = plan.find("Aggregate", win_at)
    assert win_at >= 0 and agg_below > win_at, plan


def test_lift_null_group_key_is_a_real_group(spark):
    """NULL group keys must survive (review r12: the totals join was
    name-based and dropped the whole NULL group); totals now ride a
    window over the same keyed partitioning."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [(None, 3, 1), (None, 1, 0), ("b", 2, 1), ("b", 1, 0)],
        "g string, s int, y int",
    )
    got = {
        (r["g"], r["bucket"]): r
        for r in lift_gains(df, "s", "y", 2, by=["g"]).collect()
    }
    assert (None, 1) in got and (None, 2) in got
    assert got[(None, 1)]["lift"] == 2.0 and got[(None, 2)]["gain"] == 1.0


def test_lift_null_labels_count_as_volume_not_positives(spark):
    """Rows with NULL labels stay in n / cum_n / capture but add 0
    positives — n_pos must be 0, never NULL-poisoned (review r12)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import lift_gains

    df = spark.createDataFrame(
        [(4, None), (3, None), (2, 1), (1, 0)], "s int, y int"
    )
    got = {r["bucket"]: r for r in lift_gains(df, "s", "y", 2).collect()}
    assert (got[1]["n"], got[1]["n_pos"]) == (2, 0)
    assert got[1]["gain"] == 0.0
    assert (got[2]["cum_n"], got[2]["cum_pos"]) == (4, 1)
    assert got[2]["gain"] == 1.0 and got[2]["capture"] == 1.0


def test_mleval_null_labels_excluded_everywhere(spark):
    """NULL labels are neither positive nor negative: auc_roc,
    calibration_bins and precision_recall_at must exclude them
    instead of NULL-poisoning sums when a whole score run / bin is
    unlabeled (review r12 follow-through from the lift_gains
    finding)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
        auc_roc,
        calibration_bins,
        precision_recall_at,
    )

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, None), (0.7, None), (0.2, 0)],
        "s double, y int",
    )
    a = auc_roc(df, "s", "y").collect()[0]
    assert (a["n_pos"], a["n_neg"], a["auc"]) == (1, 1, 1.0)
    cal = {r["bin"]: r for r in calibration_bins(df, "s", "y", n_bins=10).collect()}
    # the unlabeled 0.8/0.7 rows vanish: bins 8 and 7 absent entirely
    assert set(cal) == {9, 2}
    assert cal[9]["n"] == 1 and cal[9]["frac_pos"] == 1.0
    pr = {r["threshold"]: r for r in precision_recall_at(df, "s", "y", [0.5]).collect()}
    assert (pr[0.5]["tp"], pr[0.5]["fp"], pr[0.5]["fn"]) == (1, 0, 0)


# ---------------------------------------------------------------------
# conformal_interval (born r13)
# ---------------------------------------------------------------------


def _brute_conformal(rows, alpha):
    """Independent Python replication: train mean → calib k-th order
    statistic → test coverage, per group."""
    import math
    from collections import defaultdict

    by_g = defaultdict(lambda: defaultdict(list))
    for g, y, role in rows:
        by_g[g][role].append(y)
    out = {}
    for g, d in by_g.items():
        pred = sum(d["train"]) / len(d["train"])
        res = sorted(abs(y - pred) for y in d["calib"])
        k = math.ceil((len(res) + 1) * (1 - alpha))
        qhat = res[k - 1]
        cov = sum(1 for y in d["test"] if abs(y - pred) <= qhat) / len(d["test"])
        out[g] = (pred, qhat, cov)
    return out


def test_conformal_matches_bruteforce(spark):
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
        conformal_interval,
    )

    rng = random.Random(17)
    rows = []
    for g in ("g1", "g2"):
        for i in range(120):
            role = "train" if i % 10 < 6 else ("calib" if i % 10 < 8 else "test")
            rows.append((g, rng.randint(0, 1000), role))
    df = spark.createDataFrame(rows, "g string, y long, role string")
    got = {
        r["g"]: r
        for r in conformal_interval(df, ["g"], "y", "role", alpha=0.2).collect()
    }
    want = _brute_conformal(rows, 0.2)
    for g, (pred, qhat, cov) in want.items():
        r = got[g]
        assert r["n_train"] == 72 and r["n_calib"] == 24 and r["n_test"] == 24
        assert abs(r["prediction"] - pred) < 1e-4
        assert abs(r["q_hat"] - qhat) < 1e-4
        assert abs(r["coverage"] - cov) < 1e-4
        assert r["target"] == 0.8


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_conformal_guarantee_over_many_splits(spark):
    """The finite-sample guarantee is marginal over exchangeable
    splits: averaged over several deterministic role rotations of the
    same data, empirical coverage must be ≥ 1 − alpha − slack."""
    import random

    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
        conformal_interval,
    )

    rng = random.Random(23)
    vals = [rng.randint(0, 500) for _ in range(200)]
    covs = []
    for shift in range(5):
        rows = [
            (
                "g",
                v,
                "train"
                if (i + shift) % 10 < 6
                else ("calib" if (i + shift) % 10 < 8 else "test"),
            )
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "g string, y long, role string")
        covs.append(
            conformal_interval(df, ["g"], "y", "role", alpha=0.2).collect()[0][
                "coverage"
            ]
        )
    assert sum(covs) / len(covs) >= 0.8 - 0.1, covs


def test_conformal_fail_loud_contracts(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
        conformal_interval,
    )

    ok = [("g", float(i), ["train", "calib", "test"][i % 3]) for i in range(60)]
    # unknown role
    bad = spark.createDataFrame(
        ok + [("g", 1.0, "vaildate")], "g string, y double, role string"
    )
    with _pytest.raises(ValueError, match="unknown role"):
        conformal_interval(bad, ["g"], "y", "role")
    # NULL role must not silently vanish
    nul = spark.createDataFrame(
        ok + [("g", 1.0, None)], "g string, y double, role string"
    )
    with _pytest.raises(ValueError, match="unknown role"):
        conformal_interval(nul, ["g"], "y", "role")
    # missing split in one group
    miss = spark.createDataFrame(
        ok + [("h", 1.0, "train"), ("h", 2.0, "calib")],
        "g string, y double, role string",
    )
    with _pytest.raises(ValueError, match="all three splits"):
        conformal_interval(miss, ["g"], "y", "role")
    # alpha too small for the calibration size: k > n_calib
    df = spark.createDataFrame(ok, "g string, y double, role string")
    with _pytest.raises(ValueError, match="calibration"):
        conformal_interval(df, ["g"], "y", "role", alpha=0.001)
    # bad alpha
    with _pytest.raises(ValueError, match="alpha"):
        conformal_interval(df, ["g"], "y", "role", alpha=1.5)
    # NULL group key is a real group
    ng = spark.createDataFrame(
        [(None, float(i), ["train", "calib", "test"][i % 3]) for i in range(60)],
        "g string, y double, role string",
    )
    row = conformal_interval(ng, ["g"], "y", "role", alpha=0.2).collect()
    assert len(row) == 1 and row[0]["g"] is None


def test_conformal_plan_keyed_window_broadcast_joins(spark):
    """The calibration quantile is ONE keyed window; the q_hat/pred
    frames join back via broadcast (|groups|-sized build sides)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.mleval import (
        conformal_interval,
    )

    rows = [
        ("g%d" % (i % 3), i, ["train", "calib", "test"][(i // 3) % 3])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, y long, role string")
    qe = (
        conformal_interval(df, ["g"], "y", "role", alpha=0.2)
        ._jdf.queryExecution()
    )
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan
    sp = qe.sparkPlan().toString()
    # every WindowExec keyed
    import re

    for m in re.finditer(r"Window \[", sp):
        line = sp[m.start(): sp.find("\n", m.start())]
        assert "windowspecdefinition(g#" in line or "partitionBy" in line, line
