"""Data-level privacy operators (operators/privacy): k-anonymity /
l-diversity audits, generalization, suppression. Corpus entries
privacy_* re-verify each against its DuckDB oracle at driver scale in
the tail sweep; these tests pin the semantics on hand-built frames."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.privacy import (
    dp_noisy_counts,
    generalize_columns,
    k_anonymity_audit,
    l_diversity_audit,
    suppress_rare_groups,
)


@pytest.fixture()
def people(spark):
    rows = [
        # (zip, age_band) groups: (100, a) ×3, (100, b) ×1, (200, a) ×2
        (1, "100", "a", "flu"),
        (2, "100", "a", "flu"),
        (3, "100", "a", "cold"),
        (4, "100", "b", "flu"),
        (5, "200", "a", "flu"),
        (6, "200", "a", None),
    ]
    return spark.createDataFrame(rows, "id long, zip string, band string, dx string")


def test_k_anonymity_audit_flags_small_groups(people):
    out = k_anonymity_audit(people, ["zip", "band"], 3).collect()
    got = {(r["zip"], r["band"]): r["n"] for r in out}
    assert got == {("100", "b"): 1, ("200", "a"): 2}
    # k=1 → always anonymous
    assert k_anonymity_audit(people, ["zip", "band"], 1).count() == 0


def test_l_diversity_nulls_dont_count(people):
    out = {(r["zip"], r["band"]): r["n_distinct_sensitive"]
           for r in l_diversity_audit(people, ["zip", "band"], "dx", 2).collect()}
    # (100,a) has {flu, cold} = 2 → passes l=2; (100,b) has {flu} = 1;
    # (200,a) has {flu, NULL} → NULL discloses nothing → 1 distinct
    assert out == {("100", "b"): 1, ("200", "a"): 1}


def test_generalize_columns_all_rules(spark):
    df = spark.createDataFrame(
        [(1, 37, "02139", dt.date(1987, 6, 15), "secret")],
        "id long, age long, zip string, dob date, note string",
    )
    out = generalize_columns(
        df,
        {
            "age": ("band", 10),
            "zip": ("prefix", 3),
            "dob": ("year",),
            "note": ("suppress",),
        },
    ).collect()[0]
    assert out["age"] == 30
    assert out["zip"] == "021"
    assert out["dob"] == dt.date(1987, 1, 1)
    assert out["note"] is None
    # negative values band toward -inf (floor semantics, both engines)
    neg = generalize_columns(
        spark.createDataFrame([(1, -5)], "id long, bal long"), {"bal": ("band", 10)}
    ).collect()[0]
    assert neg["bal"] == -10
    with pytest.raises(ValueError):
        generalize_columns(df, {"age": ("hash",)})


def test_suppress_rare_groups_is_k_anonymous(people):
    out = suppress_rare_groups(people, ["zip", "band"], 3)
    assert {r["id"] for r in out.collect()} == {1, 2, 3}
    # survivors are k-anonymous by construction
    assert k_anonymity_audit(out, ["zip", "band"], 3).count() == 0
    # single shuffle: one Exchange for the window, no join in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_privacy_pipeline_generalize_raises_k(spark):
    """The compose story: generalization merges classes, raising k."""
    rows = [(i, f"0213{i % 4}", 30 + i % 7) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, zip string, age long")
    before = k_anonymity_audit(df, ["zip", "age"], 4).count()
    gen = generalize_columns(df, {"zip": ("prefix", 3), "age": ("band", 10)})
    after = k_anonymity_audit(gen, ["zip", "age"], 4).count()
    assert before > 0 and after == 0


def test_dp_noisy_counts_reproducible_and_clamped(spark):
    """Seeded Laplace release: identical numbers across runs and
    partitionings (fixed-seed re-release spends no fresh budget),
    never-negative counts, and a different seed gives a different
    release."""
    rows = [(i, f"g{i % 3}") for i in range(60)] + [(100, "rare")]
    df = spark.createDataFrame(rows, "id long, grp string")
    a = {r["grp"]: r["noisy_count"] for r in dp_noisy_counts(df, ["grp"], 0.5, seed=1).collect()}
    b = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_counts(df.repartition(13), ["grp"], 0.5, seed=1).collect()
    }
    assert a == b
    assert all(v >= 0 for v in a.values())
    c = {r["grp"]: r["noisy_count"] for r in dp_noisy_counts(df, ["grp"], 0.5, seed=2).collect()}
    assert a != c  # a new seed is a new draw
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["grp"], 0.0, seed=1)
    # the seed is a secret key: no default, supplying one is mandatory
    with pytest.raises(TypeError, match="seed"):
        dp_noisy_counts(df, ["grp"], 0.5)


def test_dp_noisy_counts_error_scales_with_epsilon(spark):
    """Utility law: mean absolute noise ~ 1/epsilon. With many groups
    the empirical mean |noisy - true| at eps=0.1 (b=10) must exceed
    the one at eps=10 (b=0.1), and the tight regime should stay close
    to the true counts."""
    rows = [(i * 1000 + j, f"g{i:03d}") for i in range(200) for j in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string")
    true_n = 50

    def mean_abs_err(eps):
        out = dp_noisy_counts(df, ["grp"], eps, seed=3).collect()
        return sum(abs(r["noisy_count"] - true_n) for r in out) / len(out)

    loose, tight = mean_abs_err(0.1), mean_abs_err(10.0)
    assert loose > tight
    assert tight <= 1.0  # b=0.1: rounding keeps most groups exact
    assert 3.0 <= loose <= 40.0  # b=10: E|noise| = 10


def test_dp_noisy_sums_clip_bounds_sensitivity(spark):
    """Clipped DP sums: values clip to [0, C] before aggregation (one
    row moves the release by at most C), the release is reproducible
    under the seed, and noise is independent of the counts release
    (different statistic key)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.privacy import (
        dp_noisy_sums,
    )

    rows = [(i, "g0", 10.0) for i in range(50)] + [(99, "g0", 1e9), (98, "g0", -5.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = dp_noisy_sums(df, ["grp"], "v", clip=100.0, epsilon=10.0, seed=1).collect()
    # true clipped sum = 50*10 + 100 (outlier clipped) + 0 (negative) = 600;
    # at eps=10, b=10 the noise is small
    assert abs(out[0]["noisy_sum"] - 600.0) < 100.0
    rerun = dp_noisy_sums(
        df.repartition(7), ["grp"], "v", clip=100.0, epsilon=10.0, seed=1
    ).collect()
    assert rerun[0]["noisy_sum"] == out[0]["noisy_sum"]
    with pytest.raises(ValueError, match="clip"):
        dp_noisy_sums(df, ["grp"], "v", clip=0.0, seed=1)


def test_dp_key_domain_releases_declared_groups_only(spark):
    """Presence-leakage mitigation (ADVICE r8): with key_domain the
    release covers EVERY declared key — absent groups get noise
    around 0 (their presence is no longer data-dependent) — and
    groups outside the declared domain are dropped."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.privacy import (
        dp_noisy_sums,
    )

    df = spark.createDataFrame(
        [(i, "g0", 10.0) for i in range(40)] + [(99, "undeclared", 10.0)],
        "id long, grp string, v double",
    )
    dom = spark.createDataFrame([("g0",), ("g1",), ("g2",)], "grp string")
    out = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_counts(
            df, ["grp"], 10.0, seed=5, key_domain=dom
        ).collect()
    }
    assert set(out) == {"g0", "g1", "g2"}  # absent g1/g2 in, undeclared out
    assert abs(out["g0"] - 40) <= 3 and out["g1"] <= 3 and out["g2"] <= 3
    sums = {
        r["grp"]: r["noisy_sum"]
        for r in dp_noisy_sums(
            df, ["grp"], "v", clip=100.0, epsilon=10.0, seed=5, key_domain=dom
        ).collect()
    }
    assert set(sums) == {"g0", "g1", "g2"}
    assert abs(sums["g0"] - 400.0) < 100.0 and sums["g1"] < 100.0


def test_t_closeness_hand_computed(spark):
    """TVD against hand math: group A is 3/4-1/4 over {x, y} vs a
    global 1/2-1/2 → distance ¼; group B matches the global exactly
    → 0; a group missing a value entirely pays its full global mass."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.privacy import (
        t_closeness_audit,
    )

    rows = (
        [("A", "x")] * 3 + [("A", "y")] * 1
        + [("B", "x")] * 2 + [("B", "y")] * 2
        + [("C", "x")] * 1 + [("C", "y")] * 3  # mirror of A: global stays ½-½
    )
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["q"]: r for r in t_closeness_audit(df, ["q"], "s", t=0.2).collect()}
    assert out["A"]["t_distance"] == pytest.approx(0.25)
    assert out["A"]["violates"] is True
    assert out["B"]["t_distance"] == pytest.approx(0.0)
    assert out["B"]["violates"] is False
    assert out["C"]["t_distance"] == pytest.approx(0.25)
    assert (out["A"]["n"], out["B"]["n"], out["C"]["n"]) == (4, 4, 4)
    # absent-value mass: C holds only z; global = {x:2/6? ...} recompute
    rows2 = [("C", "z")] * 2 + [("D", "x")] * 2 + [("D", "z")] * 2
    df2 = spark.createDataFrame(rows2, "q string, s string")
    out2 = {
        r["q"]: r["t_distance"]
        for r in t_closeness_audit(df2, ["q"], "s", t=0.5).collect()
    }
    # global: x=1/3, z=2/3. C: z=1 → ½(|1-2/3| + (1-2/3)) = 1/3
    assert out2["C"] == pytest.approx(1 / 3)
    # D: x=1/2,z=1/2 → ½(|1/2-1/3| + |1/2-2/3|) = 1/6
    assert out2["D"] == pytest.approx(1 / 6)


def test_t_closeness_improves_after_suppression(spark):
    """Composition sanity: suppressing a heavily-skewed rare group
    removes its violation from the audit (the audit → remediate →
    audit loop the module documents)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.privacy import (
        suppress_rare_groups,
        t_closeness_audit,
    )

    rows = [("big", "x")] * 10 + [("big", "y")] * 10 + [("tiny", "x")] * 2
    df = spark.createDataFrame(rows, "q string, s string")
    before = t_closeness_audit(df, ["q"], "s", t=0.3)
    assert {r["q"] for r in before.filter("violates").collect()} == {"tiny"}
    cleaned = suppress_rare_groups(df, ["q"], k=3)
    after = t_closeness_audit(cleaned, ["q"], "s", t=0.3)
    assert after.filter("violates").count() == 0
