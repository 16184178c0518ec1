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
