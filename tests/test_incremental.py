"""Incremental aggregate maintenance (operators/incremental): the
merge ≡ rebuild invariant, retractions, and tree-merge associativity.
The corpus entry incremental_rollup re-proves merge ≡ rebuild against
the DuckDB oracle at driver scale on every tail sweep."""

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.incremental import (
    finalize_rollup,
    merge_rollup_states,
    partial_rollup,
)


@pytest.fixture()
def sales(spark):
    rows = [
        ("a", 10.0), ("a", 20.0), ("a", 30.0),
        ("b", 5.0), ("b", 15.0),
        ("c", 7.0),
    ]
    return spark.createDataFrame(rows, "k string, v double")


def _final_map(state, keys=("k",), vals=("v",)):
    return {
        r["k"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"], r["v_avg"], r["v_var"])
        for r in finalize_rollup(state, list(keys), list(vals)).collect()
    }


def test_merge_equals_rebuild(spark, sales):
    a = sales.filter("v < 12")
    b = sales.filter("v >= 12")
    merged = merge_rollup_states(
        partial_rollup(a, ["k"], ["v"]), partial_rollup(b, ["k"], ["v"]), ["k"]
    )
    assert _final_map(merged) == _final_map(partial_rollup(sales, ["k"], ["v"]))


def test_tree_merge_associative(spark, sales):
    parts = [sales.filter(f"v = {v}") for v in (10.0, 20.0, 30.0)]
    states = [partial_rollup(p, ["k"], ["v"]) for p in parts]
    left = merge_rollup_states(
        merge_rollup_states(states[0], states[1], ["k"]), states[2], ["k"]
    )
    right = merge_rollup_states(
        states[0], merge_rollup_states(states[1], states[2], ["k"]), ["k"]
    )
    assert _final_map(left) == _final_map(right)


def test_finalize_values(spark, sales):
    out = _final_map(partial_rollup(sales, ["k"], ["v"]))
    # a: n=3 sum=60 min=10 max=30 avg=20 var=((100+400+900)/3 - 400)=66.6667
    assert out["a"] == (3, 60.0, 10.0, 30.0, 20.0, 66.6667)
    assert out["c"] == (1, 7.0, 7.0, 7.0, 7.0, 0.0)


def test_retraction_exact_for_count_sum(spark, sales):
    """Deleting rows via weight=-1 restores count/sum/avg exactly;
    min/max are documented as non-retractable."""
    dead = sales.filter("k = 'a' and v = 30.0")
    state = merge_rollup_states(
        partial_rollup(sales, ["k"], ["v"]),
        partial_rollup(dead, ["k"], ["v"], weight=-1),
        ["k"],
    )
    out = _final_map(state)
    want = _final_map(partial_rollup(sales.filter("not (k = 'a' and v = 30.0)"), ["k"], ["v"]))
    for k in out:
        # n / sum / avg / var components agree with the rebuilt truth
        assert out[k][0] == want[k][0]
        assert out[k][1] == pytest.approx(want[k][1])
        assert out[k][4] == pytest.approx(want[k][4])


def test_fully_retracted_key_disappears(spark, sales):
    """ADVICE r7: a key whose rows were ALL retracted (__n folds to 0)
    must not finalize to a ghost n=0 / NULL-avg row — downstream
    consumers would misread it as a real group."""
    only_c = sales.filter("k = 'c'")
    state = merge_rollup_states(
        partial_rollup(sales, ["k"], ["v"]),
        partial_rollup(only_c, ["k"], ["v"], weight=-1),
        ["k"],
    )
    out = _final_map(state)
    assert "c" not in out
    assert set(out) == {"a", "b"}


def test_merge_rejects_mismatched_state_schemas(spark, sales):
    a = partial_rollup(sales, ["k"], ["v"])
    b = partial_rollup(sales.withColumnRenamed("v", "w"), ["k"], ["w"])
    with pytest.raises(AssertionError):
        merge_rollup_states(a, b, ["k"])


def test_hll_distinct_state_merges_like_rebuild(spark):
    """r8: mergeable approximate distinct counts — exact
    COUNT(DISTINCT) has no bounded state, so distinct_cols keeps an
    HLL sketch per key that unions associatively. Merged halves must
    estimate within the HLL envelope of the from-scratch rebuild, and
    overlapping deltas must NOT double-count (the failure mode of
    summing per-batch distincts)."""
    rows = [(f"k{i % 2}", f"u{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "k string, u string")
    a = df.filter("u < 'u2'")   # users overlap across the halves
    b = df.filter("u >= 'u2'")
    merged = merge_rollup_states(
        partial_rollup(a, ["k"], [], distinct_cols=["u"]),
        partial_rollup(b, ["k"], [], distinct_cols=["u"]),
        ["k"],
    )
    got = {
        r["k"]: r["u_approx_distinct"]
        for r in finalize_rollup(merged, ["k"], [], distinct_cols=["u"]).collect()
    }
    rebuilt = {
        r["k"]: r["u_approx_distinct"]
        for r in finalize_rollup(
            partial_rollup(df, ["k"], [], distinct_cols=["u"]), ["k"], [],
            distinct_cols=["u"],
        ).collect()
    }
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.countDistinct("u").alias("n")).collect()}
    for k in true:
        assert abs(got[k] - true[k]) <= max(2, 0.05 * true[k]), (k, got[k], true[k])
        assert abs(got[k] - rebuilt[k]) <= max(2, 0.05 * true[k])
