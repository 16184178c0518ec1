"""Fuzzy string matching (operators/fuzzy): deletion-neighborhood
blocking must reproduce the quadratic Levenshtein join EXACTLY —
the lossless-superset guarantee is the whole point."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators import fuzzy


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spork", "sparks", "park", "shark", "sprak",  # 1-edit cluster-ish
    "widget", "widgit", "midget", "wident",
    "completely", "different", "differant",
    "", "a", "b", "ab", "ba",
]


@pytest.mark.parametrize("d", [1, 2])
def test_self_join_equals_quadratic_truth(spark, d):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, s string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy.fuzzy_self_join(df, "id", "s", max_distance=d).collect()
    }
    want = {
        (i, j): lev(WORDS[i], WORDS[j])
        for i, j in itertools.combinations(range(len(WORDS)), 2)
        if lev(WORDS[i], WORDS[j]) <= d
    }
    assert got == want


def test_edit_kinds_all_blocked_at_d1(spark):
    # one of each edit kind against the base — every one must surface
    base = "healthcare"
    variants = {
        "sub": "healthcafe",
        "del": "healthcar",
        "ins": "healthcaree",
    }
    rows = [(0, base)] + [(i + 1, v) for i, v in enumerate(variants.values())]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy.fuzzy_self_join(df, "id", "s", max_distance=1).collect()
    }
    assert {(0, 1), (0, 2), (0, 3)} <= got


def test_two_table_fuzzy_join_maps_dirty_to_clean(spark):
    clean = spark.createDataFrame(
        [(1, "aspirin"), (2, "ibuprofen"), (3, "insulin")], "ref_id long, name string"
    )
    dirty = spark.createDataFrame(
        [(10, "asprin"), (11, "ibuprofen"), (12, "metformin")],
        "rec_id long, name string",
    )
    got = {
        (r["rec_id"], r["ref_id"]): r["distance"]
        for r in fuzzy.fuzzy_join(
            dirty, clean, "rec_id", "ref_id", "name", "name", max_distance=1
        ).collect()
    }
    assert got == {(10, 1): 1, (11, 2): 0}  # metformin matches nothing


def test_plan_is_equi_join_not_cartesian(spark):
    df = spark.createDataFrame([(i, f"w{i}") for i in range(50)], "id long, s string")
    plan = (
        fuzzy.fuzzy_self_join(df, "id", "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_variant_fanout_is_linear(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id long, s string")
    n1 = df.select(
        F.size(fuzzy.deletion_variants_col("s", 1)).alias("n")
    ).first()["n"]
    assert n1 == 7  # original + 6 single deletions
    n2 = df.select(
        F.size(fuzzy.deletion_variants_col("s", 2)).alias("n")
    ).first()["n"]
    assert 7 < n2 <= 1 + 6 + 15  # ≤ len choose 2 extra keys


# ---------------------------------------------------------------------
# Fellegi-Sunter linkage scoring (born r13)
# ---------------------------------------------------------------------


def test_fs_weights_math_and_contracts():
    import math

    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.fuzzy import fs_weights

    wa, wd = fs_weights(0.9, 0.05)
    assert wa == round(1000 * math.log2(0.9 / 0.05)) == 4170
    assert wd == round(1000 * math.log2(0.1 / 0.95)) == -3248
    # inverted evidence must fail loud
    with _pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_weights(0.2, 0.9)
    with _pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_weights(1.0, 0.5)


def test_fs_linkage_hand_computed(spark):
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.fuzzy import (
        fs_linkage_scores,
    )

    rows = [
        (1, "blk", "anna", "X"),
        (2, "blk", "annb", "X"),   # name agrees (lev 1), seg agrees
        (3, "blk", "zzzz", "Y"),   # nothing agrees with 1/2
        (4, "other", "anna", "X"),  # different block: never paired with 1
        (5, "blk", "annc", None),  # NULL segment: no evidence
    ]
    df = spark.createDataFrame(rows, "id long, blk string, name string, seg string")
    fields = [
        ("name", F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1, 100, -50),
        ("seg", F.col("seg_a") == F.col("seg_b"), 30, -20),
    ]
    out = {
        r["tier"]: r
        for r in fs_linkage_scores(
            df, "id", ["blk"], fields, match_threshold=100, possible_threshold=0
        ).collect()
    }
    # pairs within blk: (1,2)=130, (1,3)=-70, (2,3)=-70, (1,5)=100+0,
    # (2,5)=100+0, (3,5)=-50+0
    assert out["match"]["n_pairs"] == 3
    assert out["match"]["total_score"] == 130 + 100 + 100
    assert out["match"]["max_score"] == 130
    assert out["non_match"]["n_pairs"] == 3
    assert out["non_match"]["total_score"] == -70 - 70 - 50
    assert "possible" not in out
    # avg is the exact ratio
    assert abs(out["match"]["avg_score"] - 330 / 3) < 1e-6


def test_fs_linkage_requires_blocking(spark):
    import pytest as _pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.fuzzy import (
        fs_linkage_scores,
    )

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with _pytest.raises(ValueError, match="blocking"):
        fs_linkage_scores(df, "id", [], [], 1, 0)


def test_fs_linkage_plan_equi_join_on_block(spark):
    """Catalyst must extract the block equality as the join key — the
    pair space materializes per block, never as a cartesian."""
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.operators.fuzzy import (
        fs_linkage_scores,
    )

    df = spark.createDataFrame(
        [(i, "b%d" % (i % 4), "n%d" % i) for i in range(40)],
        "id long, blk string, name string",
    )
    fields = [("name", F.col("name_a") == F.col("name_b"), 10, -5)]
    plan = (
        fs_linkage_scores(df, "id", ["blk"], fields, 10, 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan
