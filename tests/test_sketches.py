"""Bounded-memory sketch operators (operators/sketches): the
Misra-Gries two-pass heavy hitter must equal the unbounded groupBy
answer whenever the MG guarantee holds, with candidate state provably
bounded; sketch_profile's accuracy flags must hold on real data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators import sketches


@pytest.fixture()
def zipfish(spark):
    # key k appears ~ 20_000 / (k+1) times, k = 0..99: a classic
    # heavy-tailed frequency profile in scrambled arrival order
    return (
        spark.range(100)
        .select(F.col("id").alias("k"))
        .withColumn("n", (F.lit(20_000) / (F.col("k") + 1)).cast("int"))
        .select(F.col("k"), F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"))
        .select(F.xxhash64("k", "i").alias("scramble"), F.concat(F.lit("key_"), F.format_string("%03d", "k")).alias("key"))
        .repartition(8, "scramble")
        .drop("scramble")
    )


def exact_topk(df, key_col, k):
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(k)
        .collect()
    )


def test_heavy_hitters_equal_unbounded_groupby(zipfish):
    got = sketches.heavy_hitters_exact(zipfish, "key", k=10, capacity=64).collect()
    want = exact_topk(zipfish, "key", 10)
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]


def test_heavy_hitters_survive_distinct_key_flood(spark):
    """Adversarial shape: 3 heavy keys drowned in 30k once-only keys.
    With capacity 32 the MG summaries can hold only a sliver of the
    key space, yet the heavies' counts (5000 each > n/33 ≈ 1363) must
    survive the decrement churn and recount exactly."""
    heavies = (
        spark.range(15_000)
        .select(F.concat(F.lit("hot_"), (F.col("id") % 3)).alias("key"))
    )
    flood = spark.range(30_000).select(
        F.concat(F.lit("cold_"), F.col("id")).alias("key")
    )
    df = heavies.unionByName(flood).repartition(8, F.rand(seed=7))
    got = sketches.heavy_hitters_exact(df, "key", k=3, capacity=32).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [
        ("hot_0", 5000), ("hot_1", 5000), ("hot_2", 5000)
    ]


def test_candidate_state_is_bounded(zipfish):
    cands = sketches.misra_gries_candidates(zipfish, "key", capacity=16)
    # merged candidates ≤ input partitions × capacity — the whole point
    n_parts = zipfish.rdd.getNumPartitions()
    assert cands.count() <= n_parts * 16
    # lower bounds never exceed true counts (MG only under-counts)
    truth = {r["key"]: r["cnt"] for r in exact_topk(zipfish, "key", 100)}
    for r in cands.collect():
        assert r["lower_bound"] <= truth[r["key"]]


def test_sketch_profile_flags_hold_on_lineitem(spark):
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata unavailable")
    from healthcare_data_lakehouse_using_gcp_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    prof = sketches.sketch_profile(
        li, ["l_returnflag"], distinct_col="l_suppkey", value_col="l_extendedprice"
    )
    rows = prof.collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["hll_ok"] is True, r
        assert r["pq_ok"] is True, r
    # the exact columns really are exact: cross-check one group
    flag = rows[0]["l_returnflag"]
    want = (
        li.filter(F.col("l_returnflag") == flag)
        .agg(
            F.countDistinct("l_suppkey").alias("nd"),
            F.expr("round(percentile(l_extendedprice, 0.5), 4)").alias("p50"),
        )
        .first()
    )
    assert rows[0]["n_distinct"] == want["nd"]
    assert rows[0]["p50"] == want["p50"]


def test_hll_rollup_union_matches_direct_sketch(spark):
    """The non-additivity argument, demonstrated: users appear on
    MANY days, so summing daily distinct counts over-counts wildly,
    while unioning the daily sketches stays inside the HLL error
    envelope of the true distinct count. (Union and direct sketch
    estimates may differ by a few counts — DataSketches sketches in
    sparse "list/set" mode transition representations on merge — but
    both carry the same error guarantee.)"""
    from pyspark.sql import functions as F

    # full 30-day × 500-user grid: every user active every day
    df = spark.range(30 * 500).select(
        (F.col("id") % 30).alias("day"),
        (F.col("id") / 30).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
    ).withColumn("user_id", F.col("user_id") % 500)
    daily = sketches.hll_rollup(df, ["event_type", "day"], "user_id")
    assert daily.count() == 30
    est = sketches.hll_estimate_over(daily, ["event_type"]).first()["approx_distinct"]
    true = df.select("user_id").distinct().count()
    assert abs(est - true) <= 0.05 * true, (est, true)
    # summing the per-day counts is the WRONG answer by ~30x
    naive_sum = df.groupBy("day").agg(F.countDistinct("user_id").alias("n"))
    assert naive_sum.agg(F.sum("n")).first()[0] > 10 * true
    # union tracks sketching the raw rows directly (same guarantee;
    # not bit-identical across sparse-mode merges)
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint")
    ).first()[0]
    assert abs(est - direct) <= 0.05 * true, (est, direct)


def test_hll_overlap_estimates_known_intersection(spark):
    from pyspark.sql import functions as F

    # A = users 0..999, B = users 500..1499 → |A∩B| = 500, |A∪B| = 1500
    a = spark.range(1000).select(F.lit("a").alias("g"), F.col("id").alias("u"))
    b = spark.range(500, 1500).select(F.lit("b").alias("g"), F.col("id").alias("u"))
    est = sketches.hll_overlap(a.unionByName(b), "g", "u", "a", "b")
    assert abs(est["a"] - 1000) <= 50 and abs(est["b"] - 1000) <= 50
    assert abs(est["union"] - 1500) <= 75
    assert abs(est["intersection"] - 500) <= 150  # additive error of 3 estimates
    assert 0.2 <= est["jaccard"] <= 0.5  # true 1/3


# ---------------------------------------------------------------- count-min


def test_cms_never_undercounts_and_rows_sum_to_n(zipfish):
    n = zipfish.count()
    sketch = sketches.cms_build(zipfish, "key", width=256, depth=4)
    # every CMS row partitions the input: its cells sum to exactly N
    per_row = {r["row"]: r["s"] for r in sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: n, 1: n, 2: n, 3: n}
    truth = zipfish.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.cms_query(sketch, truth, "key", width=256, depth=4)
    bad = est.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0  # one-sided error: min over rows >= true, always


def test_cms_overcount_within_epsilon_bound(zipfish):
    n = zipfish.count()
    width, depth = 256, 4
    sketch = sketches.cms_build(zipfish, "key", width=width, depth=depth)
    truth = zipfish.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.cms_query(sketch, truth, "key", width=width, depth=depth)
    eps_n = 2.718281828 * n / width
    worst = est.select(F.max(F.col("est") - F.col("true_cnt")).alias("w")).first()["w"]
    # deterministic given the md5 hash family + this fixture; the CMS
    # guarantee says P[overcount > eps_n] <= (1/2)^depth per key
    assert worst <= eps_n


def test_cms_merge_equals_single_build(zipfish):
    a = zipfish.filter(F.col("key") < "key_050")
    b = zipfish.filter(F.col("key") >= "key_050")
    merged = sketches.cms_merge(
        sketches.cms_build(a, "key", width=128, depth=3),
        sketches.cms_build(b, "key", width=128, depth=3),
    )
    whole = sketches.cms_build(zipfish, "key", width=128, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_query_keeps_duplicate_rows_and_survives_column_collisions(
    spark, zipfish
):
    """ADVICE r7: the docstring promises an estimate for EVERY row of
    keys — duplicate rows must not collapse in the regroup, and caller
    columns literally named 'row'/'bucket' must not corrupt the probe
    join."""
    sketch = sketches.cms_build(zipfish, "key", width=256, depth=4)
    dups = spark.createDataFrame(
        [("key_001", 1), ("key_001", 1), ("key_002", 7)], "key string, row int"
    )
    out = sketches.cms_query(sketch, dups, "key", width=256, depth=4)
    rows = out.collect()
    assert len(rows) == 3, "duplicate key rows must each keep their own estimate"
    assert set(out.columns) == {"key", "row", "est"}
    ests = {(r["key"], r["row"], r["est"]) for r in rows}
    # the two identical input rows get identical estimates
    assert len({e for k, rw, e in ests if k == "key_001"}) == 1
    # reserved internal names fail loudly instead of silently corrupting
    bad = spark.createDataFrame([("key_001",)], "__cms_tag string")
    with pytest.raises(ValueError, match="reserved"):
        sketches.cms_query(sketch, bad, "__cms_tag", width=256, depth=4)


def test_cms_absent_key_estimates_small_and_empty_cells_zero(spark, zipfish):
    sketch = sketches.cms_build(zipfish, "key", width=256, depth=4)
    ghosts = spark.createDataFrame([("never_seen_xyz",)], "key string")
    est = sketches.cms_query(sketch, ghosts, "key", width=256, depth=4).first()["est"]
    n = zipfish.count()
    assert 0 <= est <= 2.718281828 * n / 256
    empty = sketches.cms_build(zipfish.limit(0), "key", width=256, depth=4)
    est0 = sketches.cms_query(empty, ghosts, "key", width=256, depth=4).first()["est"]
    assert est0 == 0


# ---------------------------------------------------------------- KLL


def test_kll_quantiles_within_rank_envelope(spark):
    """KLL estimates land within the documented rank envelope on a
    skewed distribution, under any partitioning, and an all-NULL /
    empty input degrades to None."""
    import math

    rows = [(float(math.exp(i / 500.0)),) for i in range(10_000)]
    df = spark.createDataFrame(rows, "v double")
    n = len(rows)
    for reparted in (df, df.repartition(17)):
        est = sketches.kll_quantiles(reparted, "v", [0.1, 0.5, 0.9], k=200)
        for q, e in est.items():
            true_rank = sum(1 for (x,) in rows if x <= e) / n
            assert abs(true_rank - q) <= 0.02, (q, e, true_rank)
    empty = sketches.kll_quantiles(df.limit(0), "v", [0.5], k=200)
    assert empty[0.5] is None


def test_kll_partition_sketches_are_mergeable_and_bounded(spark):
    """The (level, value) rows are a mergeable summary: sketching two
    halves and merging answers as accurately as sketching the whole,
    and the per-task output stays O(k log n), never row-proportional."""
    rows = [(float(i),) for i in range(20_000)]
    df = spark.createDataFrame(rows, "v double").repartition(8)
    sk = sketches.kll_partition_sketches(df, "v", k=100)
    n_rows = sk.count()
    assert n_rows < 8 * 100 * 12  # tasks x k x levels, << 20k inputs
    # tree-merge property: halves' sketch rows, merged by the same
    # compaction, hit the same envelope
    a = df.filter("v < 10000")
    b = df.filter("v >= 10000")
    merged_rows = sketches.kll_partition_sketches(a, "v", k=100).unionByName(
        sketches.kll_partition_sketches(b, "v", k=100)
    ).collect()
    levels = []
    for r in merged_rows:
        while len(levels) <= r["level"]:
            levels.append([])
        levels[r["level"]].append(r["value"])
    sketches._kll_compact(levels, 100)
    weighted = sorted(
        (v, 1 << lv) for lv, items in enumerate(levels) for v in items
    )
    total = sum(w for _, w in weighted)
    acc, est = 0, weighted[-1][0]
    for v, w in weighted:
        acc += w
        if acc >= 0.5 * total:
            est = v
            break
    assert abs(est / 20_000 - 0.5) <= 0.05  # uniform: value ~ rank


def test_cms_inner_product_join_size(spark):
    """cms_inner_product is the AMS/CMS join-cardinality estimator:
    with a collision-free width it equals the exact join size; with
    collisions it can only OVERcount (one-sided); two sketches over
    disjoint key sets estimate 0 (the range(depth) left join keeps
    bucket-disjoint rows at inner product 0)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 1 + [("c",)] * 3, "k string"
    )
    b = spark.createDataFrame([("a",)] * 4 + [("c",)] * 2, "k string")
    # exact |A join B on k| = 2*4 + 3*2 = 14; self-join F2(A) = 4+1+9
    wide_a = cms_build(a, "k", width=1 << 16, depth=4)
    wide_b = cms_build(b, "k", width=1 << 16, depth=4)
    assert cms_inner_product(wide_a, wide_b, depth=4).first()["est"] == 14
    f2 = cms_inner_product(wide_a, wide_a, depth=4).first()["est"]
    assert f2 == 4 + 1 + 9

    # narrow width forces collisions: still an upper bound, never under
    tight_a = cms_build(a, "k", width=2, depth=4)
    tight_b = cms_build(b, "k", width=2, depth=4)
    assert cms_inner_product(tight_a, tight_b, depth=4).first()["est"] >= 14

    # disjoint key sets: exact 0, and with a wide sketch the estimate
    # reads exactly 0 via the kept-at-zero depth rows
    c = spark.createDataFrame([("x",)] * 3 + [("y",)], "k string")
    wide_c = cms_build(c, "k", width=1 << 16, depth=4)
    assert cms_inner_product(wide_a, wide_c, depth=4).first()["est"] == 0
