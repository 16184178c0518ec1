"""Rounding-boundary tripwires for the transcendental-bearing oracles
(VERDICT r10 item 7 — the standing regen-robustness pass).

Most corpus oracles are regen-robust BY CONSTRUCTION: every
pre-rounding double is a ratio/product of exact integers (or exact
halves) combined through IEEE-exact ops (+ − × ÷ √) in the same order
on both engines, so Spark and DuckDB hold bit-identical doubles and
the floor-rounding can never disagree — boundary proximity is
irrelevant (a25 exact-half ranks, a26 ECDF quotients,
events_transition_matrix count ratios, a23 chi-square rationals,
mleval_* exact-integer fixtures).

A small set goes through TRANSCENDENTALS (log10/ln/exp) or
order-dependent float sums, where libm vs JVM may differ in last
ulps: a24_benford_audit (log10 expectations), survival_km (ln/exp
product-limit), survival_logrank (hash-agg sum of hypergeometric
terms), text_zipf_fit (ln + regr_*). There, the oracles stay exact
only while no pre-rounded value sits ON a floor(x·s + 0.5) boundary.
This sweep recomputes the UNROUNDED values at the driver's sf0.01 and
asserts every one keeps a comfortable distance from the nearest
boundary — so a testdata regen that lands a value near one fails HERE,
loudly, before the driver's hash gate ever sees a flaky mismatch.
Tolerance: engine disagreement through these chains is bounded by a
few hundred ulps — ≤ ~1e-13 relative, i.e. ≤ ~1e-7 in x·s units at
the magnitudes these entries emit; we demand max(1e-6, |x·s|·1e-12)
distance (≥10× safety). Calibrated against the current fixture's
closest real value (survival_km at 1.2e-5 — comfortably clear)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.01")


def _load(spark, name):
    from healthcare_data_lakehouse_using_gcp_spark.sources.readers import (
        load_table,
    )

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    return load_table(spark, SF_DIR, name)


def _assert_off_boundary(rows, col, scale, entry):
    worst = None
    for r in rows:
        v = r[col]
        if v is None:
            continue
        xs = v * scale
        dist = abs((xs % 1.0) - 0.5)
        tol = max(1e-6, abs(xs) * 1e-12)
        if worst is None or dist < worst[0]:
            worst = (dist, tol, v)
        assert dist > tol, (
            f"{entry}.{col}: pre-rounded value {v!r} sits {dist:.3e} from a "
            f"floor(x*{scale}+0.5) boundary (tol {tol:.3e}) — a regen landed "
            "on a rounding edge; bump/trim this entry's rounding digits"
        )
    assert worst is not None, f"{entry}.{col}: no rows to sweep"


def _survival_subjects(spark):
    li = _load(spark, "lineitem")
    o = _load(spark, "orders").select("o_orderkey", "o_orderdate")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_linestatus"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "t"
        ),
        (F.col("l_returnflag") != "R").alias("ev"),
        (F.col("l_suppkey") % 2 == 0).alias("arm"),
    )


def test_a24_benford_boundaries(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        benford_audit,
    )

    out = benford_audit(
        _load(spark, "orders"), ["o_orderpriority"], "o_totalprice", scale=100
    ).collect()
    _assert_off_boundary(out, "chi2", 10000, "a24_benford_audit")
    _assert_off_boundary(out, "mad", 1000000, "a24_benford_audit")


def test_survival_km_boundaries(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        kaplan_meier,
    )

    out = kaplan_meier(
        _survival_subjects(spark), "t", "ev", ["l_linestatus"]
    ).collect()
    # exhausted-risk-set rows are EXACT 0.0 (both engines emit the
    # literal, no exp involved) — their boundary distance is 0.5 and
    # they pass through the same sweep
    _assert_off_boundary(out, "survival", 1000000, "survival_km")


def test_survival_logrank_boundaries(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        logrank_test,
    )

    out = logrank_test(
        _survival_subjects(spark), "t", "ev", F.col("arm"), ["l_linestatus"]
    ).collect()
    _assert_off_boundary(out, "expected_a", 10000, "survival_logrank")
    _assert_off_boundary(out, "chi2", 10000, "survival_logrank")


def test_text_zipf_boundaries(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        zipf_fit,
    )

    out = zipf_fit(_load(spark, "documents")).collect()
    for col in ("slope", "intercept", "r2"):
        _assert_off_boundary(out, col, 10000, "text_zipf_fit")


def test_exact_ratio_oracles_are_boundary_immune_by_construction(spark):
    """The robust-by-construction class needs no distance margin: the
    pre-rounded double is the SAME BITS on both engines, so even a
    value exactly ON a boundary floors identically. Spot-prove the
    claim for events_transition_matrix: recompute p as a
    cross-engine-deterministic exact ratio and check bit equality
    with the operator's output."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        transition_matrix,
    )

    ev = _load(spark, "events")
    out = transition_matrix(
        ev, "user_id", ["ts", "event_id"], "event_type"
    ).collect()
    tot = {}
    for r in out:
        tot[r["from_state"]] = tot.get(r["from_state"], 0) + r["n"]
    for r in out:
        want = float(r["n"]) / float(tot[r["from_state"]])
        assert math.isclose(r["p"], want, rel_tol=0.0, abs_tol=0.0), (
            r["from_state"],
            r["to_state"],
        )


def test_a32_mutual_information_boundaries(spark):
    """r13-born: the entropy battery goes through LN — the one
    newborn family in the transcendental class. Sweep every emitted
    statistic at its 1e6 rounding scale (computed at digits=12, i.e.
    ≤5e-13 from the unrounded value — negligible vs the 1e-6 tol)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        mutual_information,
    )

    o = _load(spark, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("bigint")
    )
    out = mutual_information(
        o, "o_orderpriority", "o_orderstatus", by=["o_year"], digits=12
    ).collect()
    for col in ("h_x", "h_y", "h_xy", "mi", "nmi"):
        _assert_off_boundary(out, col, 1000000, "a32_mutual_information")


def test_a33_jackknife_boundaries(spark):
    """r13-born: the jackknife's d-sums are order-dependent float
    accumulations (the survival_logrank class) — sweep the emitted
    statistics at the 1e6 rounding scale."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        jackknife_ratio_se,
    )

    li = _load(spark, "lineitem")
    rows = li.select(
        F.col("l_returnflag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
        F.col("l_quantity").cast("bigint").alias("x"),
    )
    out = jackknife_ratio_se(
        rows, ["l_returnflag"], "y", "x", digits=12
    ).collect()
    for col in ("se_jack", "bias_jack"):
        _assert_off_boundary(out, col, 1000000, "a33_jackknife_ratio")
    # ci_lo/ci_hi = exact-integer-ratio ± z·se: the ratio part is
    # bit-identical cross-engine by construction, so the only noise
    # is additive from the z·se term (d-sum reassociation, ≲1e-11
    # absolute → ≲1e-5 in 1e6-scaled units). The generic helper's
    # |x·s|·1e-12 tolerance wrongly scales with the exact part's
    # magnitude (~0.2 here) — use an absolute 1e-3 bound (100×
    # safety over the real noise) instead.
    for col in ("ci_lo", "ci_hi"):
        for r in out:
            xs = r[col] * 1000000
            dist = abs((xs % 1.0) - 0.5)
            assert dist > 1e-3, (
                f"a33_jackknife_ratio.{col}: {r[col]!r} sits {dist:.3e} "
                "from a rounding boundary (additive-noise tol 1e-3)"
            )


def test_ab_ate_boundaries(spark):
    """r13-born: the pooled ATE is an order-dependent ≤|strata|-term
    window sum — sweep it (and the per-stratum contribution) at the
    1e4 rounding scale. Means/effects are exact-integer ratios —
    boundary-immune by construction, swept anyway for free."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.analytics import (
        stratified_ate,
    )
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        _hash_bucket,
    )

    o = _load(spark, "orders")
    rows = o.select(
        F.col("o_orderpriority"),
        (_hash_bucket("o_orderkey", 2) == 0).alias("t"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("yc"),
    )
    out = stratified_ate(rows, "o_orderpriority", "t", "yc", digits=12).collect()
    for col in ("ate", "contribution", "effect"):
        _assert_off_boundary(out, col, 10000, "ab_ate_stratified")


def test_ab_msprt_boundaries(spark):
    """r13-born: log Λ goes through LN/EXP with a σ² built from
    hash-agg float moments — the transcendental class. Sweep
    log_lambda and p at the 1e6 scale, and additionally assert the
    running max keeps clear of the α=0.05 rejection threshold
    (−ln 0.05): a regen landing max log Λ within engine ulps of the
    literal would flip the boolean `rejected` column itself."""
    import math

    from healthcare_data_lakehouse_using_gcp_spark import corpus

    out = corpus.ab_msprt_always_valid(spark, SF_DIR).collect()
    thresh = -math.log(0.05)
    # the binding statistic for `rejected` is the RUNNING MAX per
    # group — recompute it and check its distance to the literal
    from collections import defaultdict

    run = defaultdict(lambda: float("-inf"))
    for r in sorted(out, key=lambda r: (str(r["o_orderpriority"]), r["period"])):
        g = r["o_orderpriority"]
        run[g] = max(run[g], r["log_lambda"])
        assert abs(run[g] - thresh) > 1e-7, (
            f"group {g} period {r['period']}: running max log-lambda "
            f"{run[g]} sits within engine-ulp range of the rejection "
            "threshold — a regen could flip `rejected`"
        )
    _assert_off_boundary(out, "log_lambda", 1000000, "ab_msprt_always_valid")
    _assert_off_boundary(
        out, "p_always_valid", 1000000, "ab_msprt_always_valid"
    )


def test_ann_ivf_refresh_cost_margin(spark):
    """r14-born: ann_ivf_refresh_invariants' only data-dependent
    oracle fact is the boolean cost_improved (the exact-integer
    columns are regen-robust by construction, the centroid/list
    counts are constants of the seeded build). Pin a comfortable
    improvement MARGIN so a testdata regen that erodes the drift
    fixture fails here loudly, not as a flaky driver boolean flip."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.similarity import (
        build_ivf_index,
        ivf_assignment_cost,
        ivf_index_append,
        ivf_index_refresh,
    )
    from healthcare_data_lakehouse_using_gcp_spark.sources.readers import (
        load_table,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    indexed, cents = build_ivf_index(e, n_centroids=8)
    indexed = indexed.localCheckpoint(eager=True)
    drifted = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array((F.col("embedding")[0] + F.lit(1.0))),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    grown = ivf_index_append(indexed, cents, drifted).localCheckpoint(eager=True)
    before = ivf_assignment_cost(grown, cents)
    new_idx, new_cents, _ = ivf_index_refresh(
        grown, cents, max_lists=2, split_factor=2, lloyd_iters=1
    )
    after = ivf_assignment_cost(new_idx, new_cents)
    assert before > 0
    margin = (before - after) / before
    assert margin > 0.02, (
        f"refresh cost improvement margin {margin:.4f} is within noise "
        "of the cost_improved=true oracle boundary — re-tune the drift "
        "fixture before the driver sees a flaky boolean"
    )
