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
