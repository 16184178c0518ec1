"""PageRank (operators/graph): hand-computed values, mass
conservation, lineage checkpointing, and edge hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators.graph import bidirectional_edges, pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_hand_computed_one_iteration(spark):
    # Directed: 1→2, 1→3, 2→3, 3→1. N=3, d=0.85, r0 = 1/3 each.
    # r1(1) = 0.15/3 + 0.85·(r0(3)/1)            = 0.05 + 0.2833…
    # r1(2) = 0.15/3 + 0.85·(r0(1)/2)            = 0.05 + 0.1416…
    # r1(3) = 0.15/3 + 0.85·(r0(1)/2 + r0(2)/1)  = 0.05 + 0.425
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long")
    got = _ranks(pagerank(e, iterations=1))
    assert abs(got[1] - (0.05 + 0.85 / 3)) < 1e-12
    assert abs(got[2] - (0.05 + 0.85 / 6)) < 1e-12
    assert abs(got[3] - (0.05 + 0.85 * (1 / 6 + 1 / 3))) < 1e-12


def test_pagerank_mass_conserved_on_undirected(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "a long, b long"
    )
    pr = pagerank(bidirectional_edges(pairs, "a", "b"), iterations=10)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9  # no dangling nodes → stochastic
    # higher-degree nodes rank higher
    got = _ranks(pr)
    assert got[1] > got[2] and got[3] > got[4]


def test_pagerank_star_center_dominates(spark):
    pairs = spark.createDataFrame([(0, i) for i in range(1, 6)], "a long, b long")
    got = _ranks(pagerank(bidirectional_edges(pairs, "a", "b"), iterations=12))
    assert got[0] > 3 * got[1]
    leaf_ranks = [got[i] for i in range(1, 6)]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12  # symmetry


def test_pagerank_checkpoint_interval_does_not_change_result(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1)], "src long, dst long"
    )
    a = _ranks(pagerank(e, iterations=7, checkpoint_every=2))
    b = _ranks(pagerank(e, iterations=7, checkpoint_every=100))
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_pagerank_dangling_node_gets_base_rank(spark):
    # 2 has no out-edges (dangling) and no in-edges beyond 1→2.
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = _ranks(pagerank(e, iterations=4))
    # node 1 receives nothing: rank = (1-d)/N every iteration
    assert abs(got[1] - 0.075) < 1e-12
    # simplified semantics: mass decays (documented), ranking intact
    assert got[2] > got[1]


def test_bidirectional_edges_distinct_both_ways(spark):
    pairs = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "a long, b long")
    e = bidirectional_edges(pairs, "a", "b")
    got = {(r["src"], r["dst"]) for r in e.collect()}
    assert got == {(1, 2), (2, 1)}


def test_triangle_count_k4_plus_pendant(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import triangle_count

    # K4 on 1-4 (4 triangles, each node in 3) + pendant 5 + a dup /
    # reversed edge + a self-loop, all of which must be ignored
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (5, 1), (2, 1), (3, 3)],
        "src long, dst long",
    )
    got = {(r["node"], r["triangles"]) for r in triangle_count(e).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_triangle_count_bipartite_is_empty(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import triangle_count

    # bipartite graphs are triangle-free by construction
    e = spark.createDataFrame(
        [(u, v) for u in (1, 2, 3) for v in (10, 20)], "src long, dst long"
    )
    assert triangle_count(e).count() == 0


def test_k_core_peels_cascade(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import k_core

    # chain 1-2-3 hanging off K4 {4,5,6,7}: peeling k=2 removes the
    # chain one node per round (degree cascades), K4 survives
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)],
        "src long, dst long",
    )
    got = {(r["node"], r["degree"]) for r in k_core(e, k=2, peels=3).collect()}
    assert got == {(4, 3), (5, 3), (6, 3), (7, 3)}
    # one peel is not enough for the cascade: node 2 still alive
    one = {r["node"] for r in k_core(e, k=2, peels=1).collect()}
    assert 2 in one and 1 not in one


# ---------------------------------------------------------------------
# hierarchy_flatten (pointer doubling)
# ---------------------------------------------------------------------


def test_hierarchy_flatten_matches_sequential_walk(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    edges = [(i, i // 10 if i >= 10 else None) for i in range(1, 200)]
    df = spark.createDataFrame(edges, "node int, parent int")
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(df, "node", "parent").collect()
    }
    par = dict(edges)
    for n, _ in edges:
        x, d = n, 0
        while par.get(x) is not None:
            x, d = par[x], d + 1
        assert got[n] == (x, d), n
    assert len(got) == len(edges)


def test_hierarchy_flatten_log_rounds_on_deep_chain(spark):
    """A 63-deep chain must resolve in ~log2(63)+1 rounds, not 63 —
    the pointer-doubling contract the module docstring sells."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    chain = [(i, i + 1 if i < 63 else None) for i in range(64)]
    df = spark.createDataFrame(chain, "node int, parent int")
    counter: list = []
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(
            df, "node", "parent", iteration_counter=counter
        ).collect()
    }
    assert got[0] == (63, 63) and got[63] == (63, 0)
    # optimization r17: the done-flag digest detects convergence IN
    # the round the last node resolves — exactly ceil(log2(63)) = 6
    # rounds, no trailing confirmation round
    assert counter[0] <= 6, counter


def test_hierarchy_flatten_flat_forest_zero_rounds(spark):
    """Optimization r17: a forest whose every node already points at a
    root is detected as converged by the bootstrap digest — zero join
    rounds, identical output."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (0, None)], "node int, parent int"
    )
    counter: list = []
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(
            df, "node", "parent", iteration_counter=counter
        ).collect()
    }
    assert got == {0: (0, 0), 1: (0, 1), 2: (0, 1)}
    assert counter[0] == 0, counter


def test_hierarchy_flatten_isolated_null_parent_root_kept(spark):
    """A NULL-parent node that is NOBODY's parent is still a root row
    (regression: the universe must come from the original frame, not
    the NULL-filtered edge list)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    df = spark.createDataFrame(
        [(0, None), (1, None), (10, 1)], "node int, parent int"
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(df, "node", "parent").collect()
    }
    assert got == {0: (0, 0), 1: (1, 0), 10: (1, 1)}


def test_hierarchy_flatten_cycle_and_multiparent_fail_loud(spark):
    import pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "node int, parent int")
    with pytest.raises(RuntimeError, match="cycle"):
        hierarchy_flatten(cyc, "node", "parent", max_iters=6)
    mp = spark.createDataFrame([(1, 2), (1, 3)], "node int, parent int")
    with pytest.raises(ValueError, match="multiple"):
        hierarchy_flatten(mp, "node", "parent")


def test_hierarchy_flatten_root_and_child_declaration_conflict(spark):
    """A node declared BOTH root (NULL parent) and child must fail the
    forest check (review r12: the NULL filter ran before the
    duplicate check and waved the contradiction through)."""
    import pytest

    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    df = spark.createDataFrame(
        [(5, None), (5, 2), (2, None)], "node int, parent int"
    )
    with pytest.raises(ValueError, match="parent declarations"):
        hierarchy_flatten(df, "node", "parent")


def test_hierarchy_flatten_kilochain_log_rounds(spark):
    """A 1,000-deep chain must resolve in ⌈log2(1000)⌉ + 1 ≈ 11
    rounds — the doubling claim at a depth where level-walking would
    need 1,000 joins."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.graph import hierarchy_flatten

    n = 1000
    chain = [(i, i + 1 if i < n else None) for i in range(n + 1)]
    df = spark.createDataFrame(chain, "node int, parent int")
    counter: list = []
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in hierarchy_flatten(
            df, "node", "parent", iteration_counter=counter, check_forest=False
        ).collect()
    }
    assert got[0] == (n, n) and got[n] == (n, 0)
    assert len(got) == n + 1
    assert counter[0] <= 12, counter
