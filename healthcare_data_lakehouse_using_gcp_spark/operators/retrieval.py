"""Lexical retrieval: BM25 scoring over the documents table.

The similarity-search pillar's lexical half (the ANN family in
operators/similarity.py is the dense half): classic Okapi BM25 with
the standard (k1, b) saturation/length-normalization parameters —
what a training-data pipeline uses for benchmark decontamination
lookups, hard-negative mining, and retrieval-augmented filtering when
no embeddings exist.

Scale design (100 TB):
- The inverted index (term → doc postings with tf) is ONE explode +
  hash-agg pass, shuffling (term, doc_id) pairs — linear in token
  count, the same shape as text.vocab_topk.
- Document-frequency and corpus stats are tiny side tables; both
  BROADCAST into the scoring join, so scoring a query never shuffles
  the postings frame: it filters to the query's terms (predicate on
  the broadcast-joined term), then one groupBy(doc_id) over the
  few surviving postings.
- Per-query work is proportional to the postings of the query's
  terms only — the inverted-index property; no corpus scan at query
  time when the index frame is persisted/bucketed by term.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize_col(text_col):
    """Whitespace tokenization over lowercased text (matches the
    corpus fixtures; swap for the BPE-ish regex in text.py when
    punctuation matters)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _token_rows(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, dl): one row per non-empty token OCCURRENCE, with
    the document length riding along — the shared explode stage under
    build_term_index and the query-scoped scoring paths.

    Optimization r17 (guide §2.3/§2.4): repartition the RAW text rows
    and tokenize ABOVE the exchange. Tokenizing below it ran split()
    over the whole corpus on the 1-2 partitions a small file scan
    produces and then shuffled the token ARRAYS — strictly more bytes
    than the text they came from (array element offsets ride along).
    Now the exchange moves raw text and the split work lands on every
    core (the ann_cosine_topk single-partition lesson, r16)."""
    from .dedup import ensure_parallelism

    words = ensure_parallelism(
        docs.select(F.col(id_col), F.col(text_col)),
        partition_by=id_col,
    ).select(F.col(id_col), tokenize_col(text_col).alias("__words"))
    return words.select(
        F.col(id_col),
        F.explode("__words").alias("term"),
        F.size("__words").alias("dl"),
    ).filter(F.col("term") != "")


def _corpus_stats(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    r"""1-row (n_docs, avgdl) over documents with ≥1 non-empty token —
    WITHOUT building postings (optimization r16, guide §2.3/§2.4):
    the full-vocabulary index previously aggregated (and cached) every
    (doc, term) pair just so stats could re-aggregate it back down to
    one row. One narrow projection over the text column replaces the
    explode + two aggregations; no token row ever exists. Equivalence:
    a text has a non-empty token iff it contains a non-whitespace
    character — trim strips ASCII spaces only, so a tab-only text must
    NOT count and rlike(\S) (not trim != '') matches the tokenizer
    exactly; dl counts whitespace RUNS + 1, which equals
    size(split(...)) even when untrimmed tabs/newlines leave boundary
    empty tokens.
    """
    trimmed = F.trim(F.col(text_col))
    return (
        docs.filter(F.col(text_col).rlike(r"\S"))
        .select((F.regexp_count(trimmed, F.lit(r"\s+")) + F.lit(1)).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )


def build_term_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted postings frame: (term, id, tf, dl). One explode +
    one hash aggregation; dl (document length) rides along via a
    per-row size() so no second pass is needed."""
    toks = _token_rows(docs, text_col, id_col)
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").cast("double").alias("dl"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 score per document for a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Pass a prebuilt ``index`` (build_term_index output, persisted/
    bucketed by term) to skip re-tokenizing the corpus per query.

    Without an index (optimization r16, guide §2.3): scoring needs
    only the QUERY terms' postings plus the 1-row corpus stats, so
    the query-term filter now runs BEFORE the (doc, term) aggregation
    — the full-vocabulary hash-agg (and its corpus-sized cache, which
    existed only so stats/df could re-read it) is gone. Postings for
    a handful of terms are tiny; they are persisted because the plan
    reads them twice (document frequencies + scoring). Corpus stats
    come from a second, narrow pass over the text column that never
    explodes a token (_corpus_stats). Persist lifetime is
    caller-managed, like minhash's occurrence frame.
    """
    if index is not None:
        stats = index.groupBy(id_col).agg(F.first("dl").alias("dl")).agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        postings = index.filter(F.col("term").isin(list(query_terms)))
    else:
        stats = _corpus_stats(docs, text_col, id_col)
        postings = (
            _token_rows(docs, text_col, id_col)
            .filter(F.col("term").isin(list(query_terms)))
            .groupBy(id_col, "term")
            .agg(
                F.count(F.lit(1)).cast("double").alias("tf"),
                F.first("dl").cast("double").alias("dl"),
            )
            .persist()
        )
    df_t = (
        postings.groupBy("term")
        .agg(F.countDistinct(id_col).cast("double").alias("df"))
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("w").alias("score"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """Top-k documents by BM25 score, deterministically tie-broken by
    id. ``round_digits`` rounds the score BEFORE ranking so rank
    order is reproducible across engines/run topologies (float sum
    order varies); pass None to rank on the raw sum."""
    from ..functions.scalars import round_det

    s = bm25_scores(docs, query_terms, text_col, id_col, k1, b, index)
    score = (
        round_det(F.col("score"), round_digits) if round_digits is not None else F.col("score")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # partial top-k, k rows to the driver stage) — no global sort, no
    # single-reducer window; the rank window then runs over k rows.
    top = (
        s.select(id_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .cast("bigint"),
    )


def save_term_index(idx: DataFrame, path: str, n_partitions: int | None = None) -> None:
    """Persist a BM25 postings index, clustered for query-time
    pruning: repartition by term and sort within partitions, so each
    parquet row group covers a narrow term range and a query's
    ``term IN (...)`` predicate skips row groups via min/max stats
    (the poor man's inverted-file layout — same idea as the IVF
    index's partition-per-list directory pruning, but term
    cardinality is too high for hive partitioning)."""
    w = idx.repartition(n_partitions, "term") if n_partitions else idx.repartition("term")
    w.sortWithinPartitions("term").write.mode("overwrite").parquet(path)


def load_term_index(spark, path: str) -> DataFrame:
    """Load a saved postings index for use as bm25_scores(index=...)."""
    return spark.read.parquet(path)


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    ``tfidf = tf · (ln((N+1)/(df+1)) + 1)`` (the sklearn-style smooth
    idf — never negative, defined even for terms in every doc).
    Returns (id, term, tfidf, rn) with rn = 1..k ranked by score desc
    (term asc as the deterministic tie-break). The keyword-extraction
    primitive behind corpus labelling and topic drift monitoring.

    Scale design (100 TB): reuses build_term_index's single
    explode+hash-agg postings frame, persisted because the plan needs
    it twice (term document-frequencies and the scored postings).
    df(t) is a |vocab|-row aggregate joined back ON TERM — a shuffle
    join that AQE converts to broadcast when the vocab is small; the
    corpus-size scalar rides in via a broadcast 1-row crossJoin (the
    bm25_scores pattern). The per-doc top-k window sorts each doc's
    own terms only (dl rows per task after hash partition on id).

    ``materialize`` (default True) eagerly localCheckpoints the k-per-
    doc result and releases the dl-per-doc postings cache before
    returning — the build_unigram_lm / pagerank cache-lifecycle
    discipline, so long-running drivers don't accumulate orphaned
    cached postings. Pass False for the lazy pipelined shape when a
    supervising loop owns the cache lifecycle (it must clear the
    cache itself at the batch boundary).
    """
    idx = build_term_index(docs, text_col, id_col).persist()
    n_docs = docs.select(F.col(id_col)).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    df_t = idx.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        idx.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc()
    )
    out = (
        scored.withColumn(
            "tfidf_r", F.floor(F.col("tfidf") * 10000.0 + 0.5) / 10000.0
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(F.col(id_col), "term", F.col("tfidf_r").alias("tfidf"), "rn")
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        idx.unpersist()
    return out


def ql_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: float = 2000.0,
    index: DataFrame | None = None,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood score per candidate
    document — the classic language-modelling retrieval signal that
    pairs with BM25 in hybrid stacks (Zhai & Lafferty 2001):

        score(d) = Σ_t ln( (tf_{t,d} + μ·P(t|C)) / (dl_d + μ) )

    with P(t|C) = collection frequency / collection length. Candidate
    set = documents containing ≥1 query term (the inverted-index
    property: work proportional to the query terms' postings, never a
    corpus scan); absent terms still contribute their smoothed
    background mass via tf=0, which is what makes QL a proper LM
    score rather than a sum of per-term bonuses.

    Scale design mirrors bm25_scores: the per-term collection stats
    are a |q|-row broadcast, the 1-row collection length rides in via
    a broadcast crossJoin, and the only shuffle is the candidate
    groupBy(id).

    Without an index (optimization r16, guide §2.3, the bm25_scores
    restructure): the query-term filter runs on raw token occurrences
    BEFORE any aggregation — no full-vocabulary hash-agg, no
    corpus-sized cache. The matched occurrences (a few terms' worth)
    persist because postings/cf/cand all derive from them; the
    collection length is one narrow no-explode pass — Σ tf over all
    postings is exactly the corpus's non-whitespace-run count.
    """
    terms = list(query_terms)
    if index is not None:
        idx = index
        coll = idx.agg(F.sum("tf").cast("double").alias("coll_len"))
        matched = idx.filter(F.col("term").isin(terms))
        cf = matched.groupBy("term").agg(F.sum("tf").cast("double").alias("cf"))
        cand = matched.groupBy(id_col).agg(
            F.first("dl").cast("double").alias("dl")
        )
        postings = matched.select(id_col, "term", "tf")
    else:
        coll = docs.agg(
            F.sum(F.regexp_count(F.col(text_col), F.lit(r"\S+")))
            .cast("double")
            .alias("coll_len")
        )
        matched = (
            _token_rows(docs, text_col, id_col)
            .filter(F.col("term").isin(terms))
            .persist()
        )
        cf = matched.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("cf")
        )
        cand = matched.groupBy(id_col).agg(
            F.first("dl").cast("double").alias("dl")
        )
        postings = matched.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).cast("double").alias("tf")
        )
    scored = (
        cand.crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(coll))
        .join(postings, [id_col, "term"], "left")
        .withColumn(
            "w",
            F.log(
                (F.coalesce(F.col("tf"), F.lit(0.0)) + mu * F.col("cf") / F.col("coll_len"))
                / (F.col("dl") + mu)
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("w").alias("score"))


def ql_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: float = 2000.0,
    index: DataFrame | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """Top-k by query likelihood, same rounding-before-ranking and
    TakeOrderedAndProject discipline as bm25_topk."""
    from ..functions.scalars import round_det

    s = ql_scores(docs, query_terms, text_col, id_col, mu, index)
    score = (
        round_det(F.col("score"), round_digits)
        if round_digits is not None
        else F.col("score")
    )
    top = (
        s.select(id_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .cast("bigint"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack 2009) — the standard way to
    combine heterogeneous retrieval signals (lexical BM25 + dense
    ANN, or BM25 + query likelihood) without score calibration:

        rrf(d) = Σ_lists 1 / (k + rank_list(d))

    Input frames need (id, rank) columns; a document missing from a
    list simply contributes nothing (fusion over the union). Returns
    (id, rrf_score, n_lists, rank), optionally truncated to ``topk``.

    Scale design: one union + one hash aggregate on id — no join
    chain, no window over the corpus; each input is already a top-k
    frame, so the whole fusion is |lists|·k rows. Ranks are integers,
    so 1/(k+rank) is bit-identical everywhere; the fused sum is over
    ≤|lists| terms per doc (IEEE addition is commutative, so 2-list
    fusion is bit-exact regardless of aggregation order) and is
    rounded before the final ranking as usual."""
    from functools import reduce

    from ..functions.scalars import round_det

    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "__contrib"
            ),
        )
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy(id_col)
        .agg(
            round_det(F.sum("__contrib"), round_digits).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    out = fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
    if topk is not None:
        out = (
            fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
            .limit(topk)
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
        )
    return out
