"""Property-based tests (hypothesis) for the cross-engine parity
primitives and graph/dedup invariants the oracle gate leans on."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.functions.scalars import round_det
from healthcare_data_lakehouse_using_gcp_spark.operators import dedup

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@_settings
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_round_det_matches_duckdb(spark, xs):
    """The floor-form rounding must be bit-identical between Spark and
    DuckDB for any finite double — it is the foundation of every
    hash-compared oracle pair."""
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in sdf.select("i", round_det(F.col("x"), 4).alias("y")).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute("SELECT FLOOR(? * 10000 + 0.5) / 10000", [x]).fetchone()[0]
        for i, x in enumerate(xs)
    }
    assert got == want


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must agree with a reference union-find on
    a random multi-component graph (seeded: one deep chain to force
    several propagation rounds, plus random clutter)."""
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(8)]  # diameter-8 chain
    edges += [
        tuple(sorted(rng.sample(range(20, 60), 2))) for _ in range(30)
    ]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node per component
    nodes = {n for e in edges for n in e}
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in nodes}
    assert got == want


def test_connected_components_string_ids_deep_chain(spark):
    """String ids must converge too: SUM(label) over strings is NULL,
    so a naive sum-based convergence check would stop after ONE
    propagation round and under-merge any chain of length > 2. The
    digest uses xxhash64(label), which works for any id type."""
    chain = [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(8)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert set(got.values()) == {"doc00"}
    assert len(got) == 9


@_settings
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=40),
        min_size=2,
        max_size=6,
    )
)
def test_hash_jaccard_equals_string_jaccard(spark, texts):
    """The hash-set Jaccard verify stage (64-bit xxhash shingles) must
    equal exact string-shingle-set Jaccard (no collisions at this
    scale), for arbitrary texts including empty-token edge cases."""
    rows = [(i, t) for i, t in enumerate(texts) if t.strip()]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_pairs = spark.createDataFrame(
        [(a, b) for a, _ in rows for b, _ in rows if a < b], "id_a long, id_b long"
    )
    sets_df = dedup.shingle_set_frame(df)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.hash_jaccard_pairs(sets_df, all_pairs).collect()
    }
    # reference: exact string shingle sets
    import re

    def shingle_set(t):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        n = max(1, len(toks) - 2)
        return {" ".join(toks[i : i + 3]) for i in range(n)}

    sets = {i: shingle_set(t) for i, t in rows}
    want = {}
    for a, _ in rows:
        for b, _ in rows:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                want[(a, b)] = round(inter / union, 9) if union else None
    assert got == {k: v for k, v in want.items() if v is not None}
