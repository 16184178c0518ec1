"""BM25 lexical retrieval tests."""

from __future__ import annotations

import math

from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    build_term_index,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join join join table"),
            (2, "spark table"),
            (3, "filter scan window"),
            (4, "join"),
        ],
        "doc_id bigint, text string",
    )


def test_term_index_tf_dl(spark):
    idx = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in build_term_index(_docs(spark)).collect()
    }
    assert idx[(1, "join")] == (3.0, 5.0)
    assert idx[(2, "table")] == (1.0, 2.0)


def test_bm25_hand_computed(spark):
    """Single-term query against a hand-evaluated BM25 formula."""
    docs = _docs(spark)
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["join"]).collect()}
    n, df = 4.0, 2.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    avgdl = (5 + 2 + 3 + 1) / 4.0

    def w(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got.keys() == {1, 4}
    assert abs(got[1] - w(3, 5)) < 1e-12
    assert abs(got[4] - w(1, 1)) < 1e-12


def test_bm25_topk_ranking_and_tiebreak(spark):
    docs = _docs(spark)
    top = bm25_topk(docs, ["join", "table"], k=3).collect()
    ranks = {r["rank"]: r["doc_id"] for r in top}
    assert len(ranks) == 3
    # doc 1 (3x join + table) must outrank everything
    assert ranks[1] == 1
    # rank column is dense 1..k
    assert sorted(ranks) == [1, 2, 3]


def test_bm25_prebuilt_index_reuse(spark):
    docs = _docs(spark)
    idx = build_term_index(docs).persist()
    a = bm25_scores(docs, ["join"], index=idx).collect()
    b = bm25_scores(docs, ["join"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    idx.unpersist()


def test_bm25_plan_shape(spark):
    """100 TB shape assertions: distributed partial top-k (TakeOrdered),
    broadcast joins for the tiny side tables, no sort-merge join on
    the postings, and term filtering present in the scoring plan."""
    docs = _docs(spark)
    plan = (
        bm25_topk(docs, ["join", "table"], k=2)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_term_index_save_load_roundtrip(spark, tmp_path):
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import (
        load_term_index,
        save_term_index,
    )

    docs = _docs(spark)
    idx = build_term_index(docs)
    p = str(tmp_path / "bm25_idx")
    save_term_index(idx, p, n_partitions=2)
    loaded = load_term_index(spark, p)
    a = bm25_topk(docs, ["join"], k=2, index=loaded).collect()
    b = bm25_topk(docs, ["join"], k=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the term predicate must reach the parquet scan of the saved index
    plan = (
        bm25_topk(docs, ["join"], k=2, index=loaded)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "term" in plan


# --- tfidf_topk_terms -------------------------------------------------


def test_tfidf_ranks_distinctive_terms_first(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common yak yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # 'common' appears in every doc (idf = ln(4/4)+1 = 1); the doubled
    # rare term (idf = ln(4/2)+1 ≈ 1.69, tf 2) wins where one exists
    assert top[1] == "zebra" and top[2] == "yak" and top[3] == "common"


def test_tfidf_rn_bounded_and_scores_monotone(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} w{i} w{i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["rn"], r["tfidf"]))
    for doc, pairs in per_doc.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        scores = [p[1] for p in pairs]
        assert scores == sorted(scores, reverse=True)
        # the thrice-repeated unique token dominates
        assert len(pairs) == 3


# ------------------------------------------------------------------
# query likelihood + reciprocal-rank fusion (r8)


def test_ql_hand_computed(spark):
    """Dirichlet QL against the hand-evaluated Zhai-Lafferty formula
    for a single-term query: score(d) = ln((tf + mu*cf/C)/(dl + mu)),
    candidates restricted to docs containing >=1 query term."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import ql_scores

    docs = _docs(spark)
    mu = 100.0
    got = {r["doc_id"]: r["score"] for r in ql_scores(docs, ["join"], mu=mu).collect()}
    # collection: 5 + 2 + 3 + 1 = 11 tokens, cf(join) = 4
    p_c = 4.0 / 11.0
    assert set(got) == {1, 4}  # docs 2 and 3 hold no query term: not candidates
    for doc_id, tf, dl in ((1, 3.0, 5.0), (4, 1.0, 1.0)):
        want = math.log((tf + mu * p_c) / (dl + mu))
        assert abs(got[doc_id] - want) < 1e-12


def test_ql_absent_term_contributes_background(spark):
    """A candidate missing one of two query terms still gets that
    term's smoothed background mass (tf=0), not a dropped term — the
    property that makes QL an LM score, not a bonus sum."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import ql_scores

    docs = _docs(spark)
    got = {
        r["doc_id"]: r["score"]
        for r in ql_scores(docs, ["join", "scan"], mu=50.0).collect()
    }
    # doc 3 (has scan, not join) and doc 4 (has join, not scan) both
    # score over BOTH terms: two log-terms each, strictly negative
    coll_len, cf_join, cf_scan, mu = 11.0, 4.0, 1.0, 50.0

    def ql(tf_join, tf_scan, dl):
        return math.log((tf_join + mu * cf_join / coll_len) / (dl + mu)) + math.log(
            (tf_scan + mu * cf_scan / coll_len) / (dl + mu)
        )

    assert abs(got[3] - ql(0.0, 1.0, 3.0)) < 1e-12
    assert abs(got[4] - ql(1.0, 0.0, 1.0)) < 1e-12


def test_rrf_fuse_union_and_missing_lists(spark):
    """RRF fuses over the UNION of lists: a doc present in both gets
    both 1/(k+rank) terms, a doc in one list gets one; ranking is by
    fused score with id tiebreak."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id bigint, rank bigint")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id bigint, rank bigint")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    assert out[20]["n_lists"] == 2 and out[10]["n_lists"] == 1
    assert abs(out[20]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9
    assert abs(out[10]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    # consensus doc 20 outranks either single-list doc
    assert out[20]["rank"] == 1
    ranks = {d: out[d]["rank"] for d in out}
    assert ranks[10] == 2 and ranks[30] == 3  # same score 1/61 vs 1/62? no:
    # 10 has 1/61 (rank 1 in a), 30 has 1/62 (rank 2 in b)


def test_rrf_topk_truncates_after_fusion(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 8)], "doc_id bigint, rank bigint"
    )
    out = rrf_fuse([a], topk=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    assert len(out) == 3
