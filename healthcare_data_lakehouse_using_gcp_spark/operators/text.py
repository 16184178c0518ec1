"""Text analysis operators for training-data pipelines.

Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star): language-ID heuristic, quality scoring, token counting,
document fingerprinting. All built-in Column expressions (JVM-side);
no UDFs anywhere — these run at full codegen speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import round_det

# A small high-frequency English stopword set for the n-gram/stopword
# language heuristic. Deterministic + public knowledge.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (BPE-ish regex split on \\s+)."""
    return F.split(F.trim(text), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# BPE-style pre-tokenization classes: letter runs, digit runs,
# punctuation runs. Deliberately lookaround-free so the SAME pattern
# executes identically under Java regex (Spark) and RE2 (DuckDB);
# the alternatives match disjoint character classes, so match order
# is unambiguous across engines.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

# Fail-loud driver bound for bpe_train(vocab_cap=None) (VERDICT r7
# §wrong 2): the merge loop is driver-side over the full histogram, so
# an uncapped web-scale vocabulary must raise, not OOM.
MAX_UNCAPPED_VOCAB = 50_000


def pretokens_col(text: Column) -> Column:
    """BPE-ish pre-tokenization (the split every byte-pair tokenizer
    runs before merges — GPT-2 style, minus its lookahead): array of
    letter/digit/punct runs. Whitespace disappears entirely, so
    'don't stop!' → [don, ', t, stop, !] — a closer proxy for LM
    token counts than whitespace splitting, still pure JVM regex."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def pretoken_count_col(text: Column) -> Column:
    return F.size(pretokens_col(text)).cast("bigint")


def avg_token_len_col(text: Column) -> Column:
    """Mean characters per whitespace token (the word_stats
    avg_token_len signal, shared with gopher_quality_filter's
    token-length rule so the decision can never drift from the
    diagnostic)."""
    return F.length(text) / F.size(tokens_col(text))


def word_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char/word-length stats."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("char_count"),
        F.size(toks).alias("token_count"),
        avg_token_len_col(F.col(text_col)).alias("avg_token_len"),
    )


def stopword_ratio_col(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = tokens_col(F.lower(text))
    matches = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return matches / F.size(toks)


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.length(text)


def quality_score_col(text: Column) -> Column:
    """Heuristic document quality as a Column: length, punctuation,
    stopword signals combined into [0,1] (the standard
    pretraining-filter recipe: too-short / punct-heavy /
    stopword-free docs score low)."""
    n_tok = F.size(tokens_col(text))
    len_score = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    sw_score = F.least(F.lit(1.0), stopword_ratio_col(text) * 5.0)
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(text) * 4.0)
    return len_score * 0.4 + sw_score * 0.3 + punct_penalty * 0.3


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col),
        round_det(quality_score_col(F.col(text_col)), 4).alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Stopword-ratio language heuristic: docs whose English-stopword
    ratio clears ``threshold`` → 'en', else 'unknown'."""
    ratio = stopword_ratio_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        round_det(ratio, 4).alias("en_stopword_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
    )


def vocab_topk(
    df: DataFrame, k: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus top-k vocabulary: lowercased whitespace tokens by
    frequency (count desc, token asc for determinism).

    Scale shape: explode → hash-aggregate — map-side partial counts
    collapse each partition's repeats before the shuffle moves only
    (token, count) pairs, and the final top-k plans as
    TakeOrderedAndProject (no global sort materialization)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def _hash_bucket(id_col: str, modulus: int = 10000) -> Column:
    """Deterministic per-id bucket in [0, modulus): first 8 hex chars
    of md5(id) — identical in Spark, DuckDB, and Python, so sampling
    decisions are reproducible across engines and runs (unlike
    df.sample, whose seed is partitioning-dependent)."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % modulus


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Content-addressed sampling for training-data splits: keep ids
    whose md5 bucket falls under ``fraction``. Same ids are kept on
    every engine, every run, every partitioning — the property that
    makes train/eval splits and cross-run ablations reproducible.
    Narrow (no shuffle); the filter evaluates inside the scan stage."""
    cut = int(fraction * 10000)
    return df.filter(_hash_bucket(id_col) < cut)


def sample_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic bounded sample: at most ``n`` rows per group —
    the distributed reservoir for per-source eval/inspection samples
    (the rate-based samplers above bound a FRACTION; audits and eval
    sets need a fixed COUNT regardless of group size). Uniform case
    of weighted_sample_per_group (all weights 1 — the A-Res key
    u^(1/1) reduces to the md5-uniform itself), sharing its balanced
    two-phase top-k plan."""
    return weighted_sample_per_group(
        df.withColumn("__w1", F.lit(1.0)), k=n,
        weight_col="__w1", group_col=group_col, id_col=id_col,
    ).drop("__w1")


def stratified_sample(
    df: DataFrame, rates: dict[str, float], strata_col: str = "source",
    id_col: str = "doc_id", default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix lever
    (e.g. keep 80% of books, 10% of web). Same md5-bucket mechanism
    as deterministic_sample, with the cut chosen per stratum."""
    cut = F.lit(int(default_rate * 10000))
    for value, rate in rates.items():
        cut = F.when(F.col(strata_col) == value, F.lit(int(rate * 10000))).otherwise(cut)
    return df.filter(_hash_bucket(id_col) < cut)


def epoch_upsample(
    df: DataFrame,
    epochs: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_epochs: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch upsampling — the training-mix lever expressed
    in epochs instead of keep-rates: ``{"books": 2.5}`` emits 2 full
    copies of every books doc plus a deterministic 50 % slice a third
    time; ``0.75`` keeps 75 % of docs once; ``0.0`` drops the source.
    The emitted ``epoch_col`` (0-based copy index) lets downstream
    shuffling/sharding spread a doc's copies across the run.

    The fractional slice reuses the md5-bucket mechanism of
    ``deterministic_sample`` — the SAME ids get the extra copy on
    every engine, run, and partitioning, so two builds of the mix are
    byte-identical. Narrow plan: per-row bucket + explode(sequence),
    no shuffle; output size is exactly sum(n_s × e_s) rows.

    Pass exactly-representable rates (x.0, x.25, x.5, x.75 …) when
    cross-engine reproducibility of the cut matters — 10000×frac must
    be integral to avoid float-truncation ambiguity.
    """
    e = F.lit(float(default_epochs))
    for value, rate in epochs.items():
        e = F.when(F.col(strata_col) == value, F.lit(float(rate))).otherwise(e)
    n_full = F.floor(e).cast("bigint")
    frac_cut = (e * 10000 - n_full * 10000).cast("bigint")
    copies = n_full + F.when(_hash_bucket(id_col) < frac_cut, 1).otherwise(0)
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("__copies") - 1)),
        )
        .drop("__copies")
    )


def normalize_unicode(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", form: str = "NFC"
) -> DataFrame:
    """Unicode normalization for curation: canonical NFC (default) so
    visually-identical strings hash identically in dedup — 'é' as one
    codepoint vs 'e'+combining-accent are different bytes but the
    same text. Spark has no built-in normalizer, so this is an
    Arrow-batched pandas UDF over Python's unicodedata (one of the
    few justified Python hops); also flags which rows changed so the
    cost of a rewrite can be confined to the affected partition.
    """
    # NOTE: no type hints on the UDF — under `from __future__ import
    # annotations` pandas_udf sees string hints and rejects the
    # signature; the explicit returnType form is used instead
    def _norm(s):
        import unicodedata

        import pandas as pd

        return pd.Series(
            [None if t is None else unicodedata.normalize(form, t) for t in s]
        )

    from pyspark.sql import types as T

    from .dedup import ensure_parallelism

    norm_udf = F.pandas_udf(_norm, T.StringType())
    base = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    return base.select(
        F.col(id_col),
        norm_udf(F.col(text_col)).alias("normalized_text"),
        F.col(text_col).alias("__orig"),
    ).select(
        F.col(id_col),
        "normalized_text",
        (F.col("normalized_text") != F.col("__orig")).alias("changed"),
    )


def dup_line_frac_col(text: Column) -> Column:
    """Fraction of a document's lines that are repeats of an earlier
    line — the Gopher duplicate-line signal, shared by
    repetition_stats (diagnostics) and gopher_quality_filter
    (decision)."""
    lines = F.split(text, r"\n")
    return (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines)


def dup_ngram_frac_col(text: Column, ngram: int = 3) -> Column:
    """Fraction of a document's lowercased word n-grams that are
    repeats — the Gopher duplicate-n-gram signal, shared by
    repetition_stats and gopher_quality_filter."""
    toks = tokens_col(F.lower(text))
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - F.lit(ngram - 1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, ngram)))
    return (F.size(grams) - F.size(F.array_distinct(grams))) / F.size(grams)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ngram: int = 3
) -> DataFrame:
    """Repetition signals (the Gopher/RefinedWeb-style quality rules):
    duplicate-line fraction and duplicate word-n-gram fraction.
    Heavily repetitive documents (boilerplate, listings, spam) score
    high and get filtered before pretraining.

    Pure array expressions — size(array_distinct(..)) ratios evaluate
    in the scan stage, narrow, no shuffle.
    """
    return df.select(
        F.col(id_col),
        round_det(dup_line_frac_col(F.col(text_col)), 4).alias("dup_line_frac"),
        round_det(dup_ngram_frac_col(F.col(text_col), ngram), 4).alias(
            "dup_ngram_frac"
        ),
    )


# select_within_token_budget collects one row per DISTINCT order
# value to pick the admission threshold driver-side; a continuous
# unrounded score could make that data-proportional — fail loud past
# this cap instead (round the score first, e.g. round_det to 4 dp
# bounds a [0,1] quality score at 10001 levels).
MAX_BUDGET_LEVELS = 100_000


def select_within_token_budget(
    df: DataFrame,
    token_budget: int,
    order_col: str = "quality_score",
    token_col: str = "token_count",
    id_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained corpus selection: keep the best documents —
    highest ``order_col`` first, ``id_col`` ascending within ties —
    whose RUNNING token total stays within ``token_budget`` (prefix
    semantics: a document is kept iff the cumulative tokens through
    it, in that order, fit the budget). The standard "fill the
    training mix with the best data until the token budget is spent"
    step that quality scoring / dedup / decontamination feed into.

    Scale design (100 TB): a naive global ORDER BY + running-sum
    window would single-partition the corpus. Instead: one hash-agg
    to per-VALUE token totals (|distinct order values| rows —
    fail-loud past MAX_BUDGET_LEVELS, see note above), a driver-side
    prefix walk over that tiny frame to find the admission threshold
    v*, then (a) every row with value > v* keeps with NO window at
    all (a scan-stage filter) and (b) only the BOUNDARY value's rows
    run the exact running-sum window, partitioned on the value
    column. Skew caveat: if one score value holds a corpus-scale row
    share, that boundary partition is that share — pre-salt the
    score (extra rounding digits, or an md5 tie-digit) to split it.

    Returns (id, order, tokens) for the selected documents. Fails
    loud on NULLs in either column (a NULL score can't be ranked; a
    NULL token count can't be budgeted)."""
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    s = df.select(F.col(id_col), F.col(order_col), F.col(token_col))
    guard = F.col(order_col).isNull() | F.col(token_col).isNull()
    if isinstance(s.schema[order_col].dataType, (T.FloatType, T.DoubleType)):
        # NaN passes the NULL guard but then Python sorted() and
        # Spark's NaN comparison semantics diverge on the > v* /
        # == v* filters — a silently wrong selection (ADVICE r15)
        guard = guard | F.isnan(F.col(order_col))
    bad = s.filter(guard).limit(1).collect()
    if bad:
        raise ValueError(
            f"select_within_token_budget: row {bad[0][id_col]!r} has "
            f"NULL/NaN {order_col!r} or NULL {token_col!r} — score and "
            "count every document before budgeting"
        )
    levels = s.groupBy(order_col).agg(F.sum(token_col).alias("__t"))
    n_levels = levels.count()
    if n_levels > MAX_BUDGET_LEVELS:
        raise ValueError(
            f"select_within_token_budget: {n_levels} distinct "
            f"{order_col!r} values > MAX_BUDGET_LEVELS="
            f"{MAX_BUDGET_LEVELS} — round the score (round_det) before "
            "budgeting so the threshold frame stays driver-safe"
        )
    rows = sorted(levels.collect(), key=lambda r: r[order_col], reverse=True)
    running = 0
    v_star = None
    remaining = 0
    for r in rows:
        t = int(r["__t"])
        if running + t > token_budget:
            v_star = r[order_col]
            remaining = token_budget - running
            break
        running += t
    if v_star is None:  # everything fits
        return s
    full = s.filter(F.col(order_col) > F.lit(v_star))
    w = Window.partitionBy(order_col).orderBy(F.col(id_col).asc())
    boundary = (
        s.filter(F.col(order_col) == F.lit(v_star))
        .withColumn("__cum", F.sum(token_col).over(w))
        .filter(F.col("__cum") <= F.lit(remaining))
        .drop("__cum")
    )
    return full.unionByName(boundary)


def mixture_proportional_fill(
    df: DataFrame,
    target_weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "token_count",
    max_epochs: float = 1.0,
) -> DataFrame:
    """Domain/source MIXTURE optimization — the training-mix step the
    curation loop (rules → dedup → decontaminate → split → budget)
    was missing: given per-source token availability and a target mix
    (DoReMi-style domain weights, or a hand-set recipe à la
    GPT-3/LLaMA sampling tables), emit per-source token allocations
    and sampling rates that fill ``token_budget`` as close to the
    target proportions as the data allows.

    Semantics — exact proportional-fill water-filling, no sampling
    randomness: source s with availability A_s and weight w_s ideally
    receives w_s·B tokens. A source with A_s below its fair share
    SATURATES (contributes everything, rate 1.0) and its deficit is
    redistributed over the remaining sources in proportion to their
    weights — iterated to the fixpoint. The fixpoint has a closed
    form: sort sources by A_s/w_s ascending; saturation is a PREFIX
    of that order, detectable per row from running prefix sums
    (A_k·(1−ΣwPrev) ≤ w_k·(B−ΣaPrev), carried forward by a running
    boolean AND), and the water level λ = (B − Σ_sat A) / (1 − Σ_sat
    w) prices every unsaturated source at alloc = w·λ. If total
    availability ≤ B everything saturates and the budget is
    under-filled — ``alloc_tokens`` then reports A_s and the caller
    sees Σ alloc < B rather than an error (an honest "not enough
    data for this recipe" signal).

    ``max_epochs`` > 1 allows REPETITION (the published-recipe knob:
    high-value small sources like Wikipedia/books are commonly
    upsampled 2-5 epochs in LLM data mixes): a source's effective
    availability becomes A_s·max_epochs, so its rate may exceed 1
    (up to max_epochs) before it saturates. ``available_tokens``
    still reports the true single-epoch A_s.

    APPLY step: feed the emitted rates straight into
    ``epoch_upsample(epochs={source: rate, ...})`` — rates ≤ 1 become
    deterministic md5 keep-fractions, rates > 1 full copies plus a
    fractional slice — or ``stratified_sample`` when no source
    exceeds rate 1. This operator DECIDES the mix; those execute it.

    Contracts (fail loud): weights must be positive and sum to 1
    (±1e-9); every source in the data must carry a weight and every
    weighted source must exist in the data (a silent miss on either
    side would quietly skew the mix); NULL ``source_col`` or
    ``token_col`` rows are rejected like select_within_token_budget
    rejects unscored rows.

    Returns one row per source: (source, available_tokens,
    alloc_tokens, rate, saturated), rate rounded half-up to 6 dp.

    Scale shape (100 TB): ONE hash-agg to per-source totals
    (|sources| rows — training mixes have tens of domains), then
    prefix-sum windows over that bounded frame (the ab_cuped
    precedent: windows over a design-bounded frame, never
    data-proportional). No collect in the data path; the weights
    frame is a driver literal."""
    from ..functions.scalars import round_det

    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if not (max_epochs >= 1.0):
        raise ValueError(
            f"max_epochs must be >= 1, got {max_epochs} — a sub-1 cap "
            "is a rate ceiling, not an epoch count; pre-filter the "
            "source instead"
        )
    if not target_weights:
        raise ValueError("target_weights must be a non-empty dict")
    for k, v in target_weights.items():
        if not (v > 0):
            raise ValueError(
                f"target_weights[{k!r}] must be > 0, got {v} — drop "
                "excluded sources from the dict instead of zero-weighting"
            )
    wsum = sum(target_weights.values())
    if abs(wsum - 1.0) > 1e-9:
        raise ValueError(
            f"target_weights must sum to 1 (got {wsum!r}) — normalize "
            "the recipe before calling"
        )
    s = df.select(F.col(source_col), F.col(token_col))
    guard = F.col(source_col).isNull() | F.col(token_col).isNull()
    if isinstance(s.schema[token_col].dataType, (T.FloatType, T.DoubleType)):
        # a NaN count passes the NULL guard, poisons the per-source
        # sum, sorts last in the cap/w order and turns every later
        # saturation condition false — a silently wrong mix (the
        # select_within_token_budget NaN guard, same reason)
        guard = guard | F.isnan(F.col(token_col))
    bad = s.filter(guard).limit(1).collect()
    if bad:
        raise ValueError(
            f"mixture_proportional_fill: NULL {source_col!r} or "
            f"NULL/NaN {token_col!r} row — attribute and count every "
            "document before mixing"
        )
    avail = s.groupBy(source_col).agg(
        F.sum(token_col).cast("double").alias("available_tokens")
    )
    # tiny driver-literal weights frame; validate coverage BOTH ways
    # on the |sources|-row aggregate (bounded collect)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(target_weights.items()), f"{source_col} string, __w double"
    )
    joined = avail.join(F.broadcast(wdf), source_col, "full_outer").select(
        source_col, "available_tokens", "__w"
    )
    cover = joined.filter(
        F.col("available_tokens").isNull() | F.col("__w").isNull()
    ).collect()  # |sources|-bounded
    if cover:
        missing_w = sorted(
            r[source_col] for r in cover if r["__w"] is None
        )
        missing_d = sorted(
            r[source_col] for r in cover if r["available_tokens"] is None
        )
        raise ValueError(
            "mixture_proportional_fill: source/weight mismatch — "
            f"sources without a weight: {missing_w[:5]}; weighted "
            f"sources absent from the data: {missing_d[:5]}"
        )
    # closed-form water-filling over the |sources|-row frame; the
    # effective (repetition-capped) availability drives the math, the
    # true single-epoch availability is what gets reported
    joined = joined.withColumn(
        "__cap", F.col("available_tokens") * F.lit(float(max_epochs))
    )
    order = Window.orderBy(
        (F.col("__cap") / F.col("__w")).asc(),
        F.col(source_col).asc(),
    )
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(float(token_budget))
    cum_a_prev = F.coalesce(F.sum("__cap").over(prev), F.lit(0.0))
    cum_w_prev = F.coalesce(F.sum("__w").over(prev), F.lit(0.0))
    cond = (
        F.col("__cap") * (F.lit(1.0) - cum_w_prev)
        <= F.col("__w") * (b - cum_a_prev)
    )
    flagged = joined.withColumn(
        "saturated",
        F.min(cond.cast("int")).over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ) == F.lit(1),
    )
    sat_a = F.coalesce(
        F.sum(F.when(F.col("saturated"), F.col("__cap"))).over(whole),
        F.lit(0.0),
    )
    sat_w = F.coalesce(
        F.sum(F.when(F.col("saturated"), F.col("__w"))).over(whole),
        F.lit(0.0),
    )
    # association matches the oracle SQL's left-to-right parse
    # (w * (B - ΣA)) / (1 - Σw), NOT w * ((B - ΣA)/(1 - Σw)) — float
    # multiply/divide are non-associative, and an ulp flip at a
    # round_det boundary is exactly the r15 hash-red artifact class;
    # the corpus entry adds a rounding-boundary fail-loud guard for
    # the residual unordered-whole-frame-sum risk
    alloc = F.when(F.col("saturated"), F.col("__cap")).otherwise(
        (F.col("__w") * (b - sat_a)) / (F.lit(1.0) - sat_w)
    )
    return flagged.select(
        F.col(source_col),
        F.col("available_tokens").cast("bigint").alias("available_tokens"),
        round_det(alloc, 4).alias("alloc_tokens"),
        # a zero-availability source is vacuously fully used (rate 1,
        # not 0/0 = NaN — NaN would also hash-flip vs the oracle)
        F.when(
            F.col("available_tokens") > 0,
            round_det(alloc / F.col("available_tokens"), 6),
        ).otherwise(F.lit(1.0)).alias("rate"),
        F.col("saturated"),
    )


def apportion_integer_counts(
    df: DataFrame,
    total: int,
    weight_col: str = "alloc_tokens",
    group_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment — the integerizing
    step after mixture optimization: a mixture recipe hands back
    FRACTIONAL per-source shares (mixture_proportional_fill's
    alloc_tokens, or any weight column), but a sampler draws WHOLE
    documents; naive per-source rounding of ``total·w/Σw`` drifts the
    grand total by up to |sources|/2. Hamilton's method fixes the sum
    exactly: every group gets ⌊quota⌋, and the ``total − Σ⌊quota⌋``
    leftover units go one each to the largest fractional remainders
    (remainder DESC, group ASC on ties — deterministic). Σ n_alloc ==
    total, always.

    Returns one row per group: (group, weight, quota, n_alloc).
    Fails loud on NULL/NaN/negative weights, an all-zero weight
    frame, or a negative total — a silently skewed allocation is the
    mixture-operator failure class this family guards against.

    Cross-engine determinism: with an INTEGER-valued weight column
    (e.g. per-source token counts) every intermediate — Σw (exact
    integer addition in doubles), quota = total·w/Σw (one IEEE
    division of exact operands), remainder, Σ⌊quota⌋ — is the
    identical double in any engine, so the output hash-checks with no
    rounding-boundary risk. Fractional weights reintroduce the
    unordered-sum ulp caveat documented on mixture_proportional_fill.

    Scale shape (100 TB): one hash-agg upstream collapses the corpus
    to the |groups|-row frame this runs on (training mixes have tens
    of domains); the windows here are over THAT bounded frame, never
    data-proportional."""
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    s = df.select(F.col(group_col), F.col(weight_col))
    guard = (
        F.col(group_col).isNull()
        | F.col(weight_col).isNull()
        | (F.col(weight_col) < 0)
    )
    if isinstance(s.schema[weight_col].dataType, (T.FloatType, T.DoubleType)):
        guard = guard | F.isnan(F.col(weight_col))
    bad = s.filter(guard).limit(1).collect()
    if bad:
        raise ValueError(
            f"apportion_integer_counts: NULL {group_col!r} or "
            f"NULL/NaN/negative {weight_col!r} row "
            f"({bad[0][group_col]!r}) — weights must be clean "
            "non-negative shares"
        )
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = F.col(weight_col).cast("double")
    wsum = F.sum(w).over(whole)
    quota = F.lit(float(total)) * w / wsum
    base = F.floor(quota)
    scored = s.select(
        F.col(group_col),
        w.alias("weight"),
        # wsum == 0 (all-zero weights) would make every quota NULL
        # (0/0) and silently break the sum contract — fail loud via
        # the same lazy raise_error idiom as ivf_index_refresh
        F.when(
            wsum > 0, quota
        ).otherwise(
            F.raise_error(
                F.lit(
                    "apportion_integer_counts: all weights are zero — "
                    "no proportional allocation exists"
                )
            ).cast("double")
        ).alias("quota"),
        base.alias("__base"),
        (quota - base).alias("__rem"),
    )
    rank_w = Window.orderBy(F.col("__rem").desc(), F.col(group_col).asc())
    leftover = F.lit(float(total)) - F.sum("__base").over(whole)
    return (
        scored.withColumn("__rk", F.row_number().over(rank_w))
        .withColumn("__left", leftover)
        .select(
            group_col,
            "weight",
            "quota",
            (
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__left"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("bigint").alias("n_alloc"),
        )
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 3.0,
    max_avg_token_len: float = 10.0,
    min_stopword_ratio: float = 0.06,
    max_punct_ratio: float = 0.2,
    max_dup_line_frac: float = 0.3,
    max_dup_ngram_frac: float = 0.2,
    ngram: int = 2,
    keep_flag: bool = False,
) -> DataFrame:
    """Gopher-style rule-based quality DECISION operator (the
    Rae et al. 2021 / RefinedWeb heuristic battery) — the
    diagnostics-to-decision step for the quality signals word_stats /
    stopword_ratio_col / punct_ratio_col / repetition_stats emit:
    per document, one boolean per rule plus the conjunctive ``keep``.

    Rules (each NULL-safe — a degenerate doc that nulls a ratio fails
    that rule rather than riding through):
    - pass_length:     min_tokens <= token count <= max_tokens
    - pass_token_len:  min/max mean characters per token
    - pass_stopwords:  stopword ratio >= min_stopword_ratio (the
      "must look like natural language" rule)
    - pass_punct:      punctuation character ratio <= max_punct_ratio
    - pass_dup_lines:  duplicate-line fraction <= max_dup_line_frac
    - pass_dup_ngrams: duplicate word-n-gram fraction <=
      max_dup_ngram_frac

    Returns the rule flags for KEPT rows only (``keep`` stripped), or
    — with ``keep_flag`` — every row plus ``keep``, for audit and for
    measuring per-rule rejection rates before committing thresholds.

    Scale shape (100 TB): every rule is a built-in Column expression
    over one row's text — narrow, codegen'd, evaluates inside the
    scan stage; no shuffle, no UDF, no state."""
    text = F.col(text_col)
    n_tok = F.size(tokens_col(text))

    def _rule(cond) -> Column:
        return F.coalesce(cond, F.lit(False))

    flags = df.select(
        F.col(id_col),
        _rule(n_tok.between(min_tokens, max_tokens)).alias("pass_length"),
        _rule(
            avg_token_len_col(text).between(
                min_avg_token_len, max_avg_token_len
            )
        ).alias("pass_token_len"),
        _rule(stopword_ratio_col(text) >= min_stopword_ratio).alias(
            "pass_stopwords"
        ),
        _rule(punct_ratio_col(text) <= max_punct_ratio).alias("pass_punct"),
        _rule(dup_line_frac_col(text) <= max_dup_line_frac).alias(
            "pass_dup_lines"
        ),
        _rule(dup_ngram_frac_col(text, ngram) <= max_dup_ngram_frac).alias(
            "pass_dup_ngrams"
        ),
    )
    keep = (
        F.col("pass_length")
        & F.col("pass_token_len")
        & F.col("pass_stopwords")
        & F.col("pass_punct")
        & F.col("pass_dup_lines")
        & F.col("pass_dup_ngrams")
    )
    flagged = flags.withColumn("keep", keep)
    if keep_flag:
        return flagged
    return flagged.filter(F.col("keep")).drop("keep")


def _overlap_scored(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int,
) -> DataFrame:
    """(id, n_grams, n_matched): per-document distinct-n-gram totals
    and benchmark hits — the SHARED core of benchmark_overlap
    (diagnostics) and decontaminate_against (decision), so the two
    can never disagree on what counts as a hit.

    Scale shape: both sides explode to (id, gram-hash) rows; the
    benchmark side reduces to DISTINCT hashes (a set usually far
    smaller than the training corpus); the hit count is one
    equi-join on the 8-byte hash + one hash-agg per doc — linear
    shuffle, no text moves after hashing.

    NULL-text rows (ADVICE r15): shingles' GREATEST(1, ·) floor turns
    a NULL text into a single empty-string pseudo-gram — right for
    dedup (all empty docs are copies of each other), wrong here (a
    NULL train doc would flag "contaminated" whenever the benchmark
    holds any NULL/blank item). They are excluded from the gram space
    on BOTH sides and the totals frame is anchored on the full input
    id set, so such rows surface explicitly with
    n_grams = n_matched = 0 instead of being silently mis-flagged or
    absent from the flag/drop outputs."""
    from .dedup import ensure_parallelism, shingles

    doc_sh = ensure_parallelism(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col)),
        partition_by=id_col,
    ).select(F.col(id_col), F.explode(shingles(text_col, ngram)).alias("g")).select(
        F.col(id_col), F.xxhash64("g").alias("h")
    )
    bench_sh = (
        ensure_parallelism(
            benchmark.filter(F.col(text_col).isNotNull())
            .select(F.col(text_col))
        )
        .select(F.explode(shingles(text_col, ngram)).alias("g"))
        .select(F.xxhash64("g").alias("h"))
        .distinct()
    )
    totals = df.select(F.col(id_col)).join(
        doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams")),
        id_col,
        "left",
    ).select(F.col(id_col), F.coalesce("n_grams", F.lit(0)).alias("n_grams"))
    matched = (
        doc_sh.join(bench_sh, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return totals.join(matched, id_col, "left").select(
        F.col(id_col),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_matched", F.lit(0)).cast("bigint").alias("n_matched"),
    )


def benchmark_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Decontamination diagnostics: per-document fraction of distinct
    word n-grams that also appear ANYWHERE in the benchmark corpus.
    Docs above a threshold are dropped before training so eval
    benchmarks stay uncontaminated (decontaminate_against is the
    decision operator over the same scored frame; scale shape in
    _overlap_scored).

    A NULL-text row has no grams (n_grams = 0 per _overlap_scored's
    ADVICE-r15 contract) and reports overlap_frac = 0.0 — NOT the
    NULL a raw 0/0 division would yield, which a NULL-blind
    ``overlap_frac > t`` filter downstream would silently treat as
    clean."""
    return _overlap_scored(df, benchmark, text_col, id_col, ngram).select(
        F.col(id_col),
        "n_grams",
        "n_matched",
        F.when(F.col("n_grams") > 0, round_det(
            F.col("n_matched") / F.col("n_grams"), 4
        )).otherwise(F.lit(0.0)).alias("overlap_frac"),
    )


def decontaminate_against(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 13,
    max_hits: int = 0,
    overlap_threshold: float | None = None,
    keep_flag: bool = False,
) -> DataFrame:
    """Benchmark decontamination DECISION operator — the training-
    pipeline step that benchmark_overlap's per-doc diagnostics feed:
    given the eval-benchmark table, drop (or flag) every training
    document whose verbatim word n-gram overlap with the benchmark
    crosses the contamination policy. Two published protocols:

    - verbatim hits (default): a document is contaminated when MORE
      THAN ``max_hits`` of its distinct n-grams appear anywhere in
      the benchmark — ``max_hits=0`` + a long gram (the 13-gram
      GPT-3/PaLM-style protocol) means "any verbatim 13-gram shared
      with an eval item disqualifies the document";
    - fractional (``overlap_threshold`` set): contaminated when the
      matched fraction of its distinct n-grams reaches the threshold
      (the contamination-fraction variant) — ``max_hits`` is ignored.

    Returns the training frame's (id, n_grams, n_hits, contaminated)
    with the contaminated rows REMOVED, or — with ``keep_flag`` —
    every row plus the boolean, for audit/reporting. Documents
    shorter than ``ngram`` tokens contribute one whole-text pseudo-
    gram (shingles' GREATEST(1, ·) floor), so a short doc copied
    verbatim from a benchmark item still flags.

    Scale shape (100 TB): both sides explode to (id, gram) rows
    hashed to 8 bytes; the benchmark side reduces to DISTINCT hashes
    (eval suites are tiny next to the corpus — usually a broadcast);
    the decision is one left_semi equi-join + one hash-agg per doc —
    linear shuffle on 8-byte keys, no text moves after hashing, no
    pair space. Same machinery as benchmark_overlap; the operator
    adds only the policy and the drop."""
    if overlap_threshold is not None and not (0.0 < overlap_threshold <= 1.0):
        raise ValueError(
            f"overlap_threshold must be in (0, 1], got {overlap_threshold}"
        )
    if max_hits < 0:
        raise ValueError(f"max_hits must be >= 0, got {max_hits}")
    scored = _overlap_scored(df, benchmark, text_col, id_col, ngram).select(
        F.col(id_col), "n_grams", F.col("n_matched").alias("n_hits")
    )
    if overlap_threshold is None:
        contaminated = F.col("n_hits") > F.lit(max_hits)
    else:
        contaminated = (
            F.col("n_hits") >= F.col("n_grams") * F.lit(overlap_threshold)
        ) & (F.col("n_grams") > 0)
    flagged = scored.withColumn("contaminated", contaminated)
    if keep_flag:
        return flagged
    return flagged.filter(~F.col("contaminated")).drop("contaminated")


PII_PATTERNS = {
    # conservative patterns only — no lookarounds, so the same regex
    # runs identically under Java regex (Spark) and RE2 (DuckDB);
    # order matters: emails first so phone-like digit runs inside
    # addresses are already masked
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
    "phone": r"\d{3}[-.]\d{3}[-.]\d{4}",
}


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction for pretraining corpora: mask emails / SSNs /
    phone numbers with typed placeholders and count redactions per
    doc. Pure regexp_replace chain — JVM-side, narrow, no shuffle;
    the redaction count is derived from the length delta of a
    delete-instead-of-mask pass (no second scan of the text).
    """
    sentinel = "\u00a4"
    scrubbed = F.col(text_col)
    collapsed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
        collapsed = F.regexp_replace(collapsed, pat, sentinel)

    # each redacted span collapses to ONE sentinel char; subtracting
    # the original's sentinel count keeps the tally exact even if the
    # char pre-exists in the text
    def _n_sentinels(c):
        return F.length(c) - F.length(F.regexp_replace(c, sentinel, ""))

    n_redacted = (_n_sentinels(collapsed) - _n_sentinels(F.col(text_col))).cast(
        "bigint"
    )
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        n_redacted.alias("n_redactions"),
        (n_redacted > 0).alias("had_pii"),
    )


def pack_documents(
    df: DataFrame,
    token_budget: int = 2048,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for pretraining batches — the concat-and-chunk
    assignment: documents are laid end-to-end in deterministic order
    and cut into ``token_budget``-token packs. Returns (id, bucket,
    token_count, pack_offset, pack_id); a pack holds every doc whose
    start offset falls in its window, so packs fill to the budget with
    at most one straddling document.

    Scale shape: a SINGLE global ordering would serialize in one
    window partition, so docs are first spread across ``num_buckets``
    md5-hash buckets (deterministic, engine-independent — same
    mechanism as deterministic_sample) and packed per bucket: the
    window runs num_buckets-wide, and pack identity (bucket, pack_id)
    stays stable under any cluster layout. At 100 TB raise num_buckets
    to ~10× cluster parallelism.
    """
    from pyspark.sql import Window

    n_tok = token_count_col(F.col(text_col))
    base = df.select(
        F.col(id_col),
        _hash_bucket(id_col, num_buckets).alias("bucket"),
        n_tok.cast("bigint").alias("token_count"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("token_count").over(w), F.lit(0))
    return base.select(
        id_col,
        "bucket",
        "token_count",
        offset.alias("pack_offset"),
        F.floor(offset / F.lit(token_budget)).alias("pack_id"),
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """The composed pretraining-curation pipeline: quality filter →
    language filter → exact-dedup (canonical min-id per text) → one
    row per surviving doc with its signals.

    Stage order matters at scale: the cheap narrow filters (quality,
    lang — pure Column expressions in the scan stage) run BEFORE the
    dedup shuffle, so the only wide operation sees pre-shrunk data.
    """
    ratio = stopword_ratio_col(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        round_det(quality_score_col(F.col(text_col)), 4).alias("quality_score"),
        round_det(ratio, 4).alias("en_stopword_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
    ).filter(
        (F.col("quality_score") >= min_quality) & (F.col("predicted_lang") == lang)
    )
    # Canonical (min-id) row per text in ONE hash-shuffle — no
    # groupBy + semi-join round trip. Optimization r16 (guide
    # §2.3/§5): every signal column is a pure function of the text,
    # i.e. CONSTANT within a text-group, so the old lexicographic
    # struct-MIN (an immutable buffer Spark silently planned as
    # SortAggregate, sorting the full text keys on both sides of the
    # exchange) reduces to min(id) — a codegen HashAggregate with
    # map-side partials — with the signals recomputed from the
    # surviving group's text in the output projection. The exchange
    # also narrows: (text, id) instead of (text, id, 3 signals).
    ratio_out = stopword_ratio_col(F.col(text_col))
    return (
        base.select(text_col, id_col)
        .groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(
            F.col(id_col),
            round_det(quality_score_col(F.col(text_col)), 4).alias(
                "quality_score"
            ),
            round_det(ratio_out, 4).alias("en_stopword_ratio"),
            F.when(ratio_out > 0.05, F.lit("en"))
            .otherwise(F.lit("unknown"))
            .alias("predicted_lang"),
        )
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", prefix_tokens: int = 8
) -> DataFrame:
    """Document fingerprints: full-text md5 + a prefix-shingle md5
    (cheap rolling-hash-style locality signal: docs sharing a prefix
    fingerprint share their first ``prefix_tokens`` words)."""
    toks = tokens_col(F.col(text_col))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("full_md5"),
        F.md5(prefix).alias("prefix_md5"),
    )


def temperature_mixture_rates(
    df: DataFrame,
    budget_tokens: int,
    temperature: float = 1.0,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> dict[str, float]:
    """Per-source keep rates that fill a token budget with a
    temperature-reweighted mixture (the LLaMA/Pile data-mixing
    recipe): weight_s ∝ tokens_s^temperature (normalized), then
    rate_s = min(1, budget·w_s / tokens_s). temperature=1 keeps the
    natural mix; temperature→0 flattens toward uniform across
    sources, up-sampling small high-quality sources.

    One aggregation over the corpus (token counts per source —
    whitespace tokens unless ``token_col`` is given); the returned
    dict feeds stratified_sample, whose md5-bucket filter is narrow
    and deterministic. Rates are driver-side floats over a tiny
    per-source table — nothing corpus-sized leaves the cluster."""
    tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    per_source = {
        r[0]: float(r[1])
        for r in df.groupBy(source_col)
        .agg(F.sum(tokens.cast("double")).alias("t"))
        .collect()
    }
    weights = {s: t**temperature for s, t in per_source.items()}
    z = sum(weights.values())
    return {
        s: min(1.0, (budget_tokens * weights[s] / z) / per_source[s])
        for s in per_source
    }


# fixed interpretable weights for classifier_quality_score: tuned so
# the logit spans ~[-3, +4] over the feature ranges of web-scale text
# (log-tokens centered near 50-token docs, stopword/alpha ratios in
# [0,1]); swap via the `weights` argument to deploy a trained model.
QUALITY_CLASSIFIER_WEIGHTS = {
    "bias": -2.0,
    "log_tokens": 0.6,       # longer docs → higher quality prior
    "stopword_ratio": 4.0,   # natural-language signal
    "alpha_ratio": 2.0,      # penalizes symbol/number soup
    "mean_token_len": -0.1,  # extremely long tokens ≈ junk/URLs
}


def classifier_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality scoring (the fasttext-classifier stage of
    standard pretraining pipelines, e.g. CCNet/LLaMA): a logistic
    model over interpretable text features, scored entirely in
    Column expressions — sigmoid(w·x + b) with a keep decision at
    ``threshold``.

    Returns (id, log_tokens, stopword_ratio, alpha_ratio,
    mean_token_len, quality_prob, keep). The default weights are
    fixed documented constants (deterministic, oracle-comparable);
    pass ``weights`` to substitute a trained model's coefficients —
    the scoring plan is identical, one narrow projection, no shuffle,
    no Python.

    At 100 TB this replaces a per-document model-server call with a
    codegen expression: scoring is scan-speed and the filter pushes
    into the same stage as the read.
    """
    w = weights or QUALITY_CLASSIFIER_WEIGHTS
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    log_tokens = F.log(F.lit(1.0) + n_tok)
    sw_ratio = stopword_ratio_col(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.length(text)
    mean_len = F.length(F.regexp_replace(text, r"\s", "")) / n_tok
    z = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["log_tokens"])) * log_tokens
        + F.lit(float(w["stopword_ratio"])) * sw_ratio
        + F.lit(float(w["alpha_ratio"])) * alpha
        + F.lit(float(w["mean_token_len"])) * mean_len
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(
        F.col(id_col),
        round_det(log_tokens, 4).alias("log_tokens"),
        round_det(sw_ratio, 4).alias("stopword_ratio"),
        round_det(alpha, 4).alias("alpha_ratio"),
        round_det(mean_len, 4).alias("mean_token_len"),
        round_det(prob, 4).alias("quality_prob"),
        (prob >= threshold).alias("keep"),
    )


def cap_documents_per_source(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-source document cap — the per-host/per-domain cap of
    C4/RefinedWeb-style cleaning: no single source may contribute more
    than ``cap`` documents, and WHICH documents survive is a
    deterministic md5 spread (engine- and run-reproducible, not
    ingestion-order-biased — same rationale as deterministic_sample).

    Default plan: one exchange on the strata column (the window's
    partition key); the rank is a row_number over (md5(seed||id), id)
    so ties are impossible. CAVEAT (ADVICE r4): AQE skew handling
    splits shuffle-read partitions for JOINS, not window-function
    partitions — a window partition is one task no matter how big. So
    with a truly giant source (a web-scale host contributing a large
    fraction of the corpus) the default single-window plan serializes
    that source through one task.

    ``salt_buckets=S`` enables the skew-safe two-stage cap for that
    regime: stage 1 ranks within (source, md5-salt-bucket) — S tasks
    per source — and keeps ≤ cap per bucket, provably retaining every
    globally-top-cap row; stage 2 ranks the ≤ S×cap survivors per
    source exactly. Output is IDENTICAL to the default plan (same
    ranking key end-to-end; survivors of stage 1 contain all rows the
    exact rank keeps, so stage 2's row_number equals the unsalted
    rank — equality is pytest-gated). Cost: one extra exchange over
    the tiny survivor set.

    Returns the input columns + source_rank (1-based position within
    the source's kept order)."""
    from pyspark.sql import Window

    key = F.md5(F.concat_ws("§", F.lit(str(seed)), F.col(id_col).cast("string")))
    if salt_buckets is not None and salt_buckets > 1:
        salt = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % salt_buckets
        w_salt = Window.partitionBy(strata_col, salt).orderBy(key, F.col(id_col))
        survivors = (
            df.withColumn("__salt_rank", F.row_number().over(w_salt))
            .filter(F.col("__salt_rank") <= cap)
            .drop("__salt_rank")
        )
        w_exact = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
        return (
            survivors.withColumn(
                "source_rank", F.row_number().over(w_exact).cast("bigint")
            )
            .filter(F.col("source_rank") <= cap)
        )
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("source_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("source_rank") <= cap)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    embedding/RAG chunking stage. One row per chunk:
    (id, chunk_idx, chunk_start, chunk_text, chunk_token_count).

    Pure Column expressions: tokenize once, explode the chunk START
    positions (a `sequence` with step chunk-overlap), slice the token
    array per output row. Narrow until the explode, which multiplies
    rows by ~n_tok/(chunk-overlap) — exactly the data growth the
    operation defines; no shuffle at all, so it composes with a
    downstream embedding UDF inside one stage.

    The final short chunk is kept (its token count tells the consumer
    it's a tail); a document shorter than ``chunk_tokens`` yields one
    chunk at start 0.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks"))
    # last start: largest multiple of step <= max(0, n_tok - overlap - 1)
    # — guarantees every token is covered and no chunk starts past the
    # final overlap window
    n = F.size("__toks")
    last_start = (
        F.floor((F.greatest(n - F.lit(overlap_tokens + 1), F.lit(0))) / step) * step
    )
    starts = base.select(
        F.col(id_col),
        "__toks",
        F.posexplode(
            F.sequence(F.lit(0), last_start.cast("int"), F.lit(step))
        ).alias("chunk_idx", "chunk_start"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens)
    return starts.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("chunk_token_count"),
    )


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Train a unigram language model over the corpus: (token,
    logp = ln(count/total)). The CCNet/KenLM-style quality-filter
    recipe's cheapest member — documents whose tokens are improbable
    under a clean reference corpus score high perplexity and get
    filtered.

    One explode + hash-aggregate (linear, map-side combined). With
    ``vocab_size`` set, keep only the top-V tokens (TakeOrdered) —
    the 100 TB lever that makes the LM broadcastable (~MBs for 100k
    tokens) while everything else becomes OOV with a floor logprob;
    total mass is still computed over ALL occurrences so in-vocab
    probabilities are unaffected by the cap.

    ``materialize`` (default True) eagerly localCheckpoints the
    finished vocab-sized LM and releases the corpus-vocabulary-sized
    counts cache before returning — the long-running-driver hygiene
    mode (ADVICE r4): no orphaned cached blocks accumulate per batch.
    Pass False for the lazy PIPELINED shape: the LM stays a broadcast
    subquery of its consumer, so Spark overlaps the LM-build and
    scoring scans instead of running them serially — measured 2×
    faster end-to-end at bench scale (the r5 lm_perplexity "+86%"
    was exactly this serialization, bisected r6). In lazy mode the
    counts cache stays registered until the session/caller clears it
    (spark.catalog.clearCache or a batch boundary) — use it where a
    supervising loop owns cache lifecycle (bench, the corpus driver),
    keep the default in unsupervised daily drivers."""
    toks = tokens_col(F.lower(F.col(text_col)))
    # persist: the count frame feeds BOTH the total-mass aggregate and
    # the logp projection — without it Spark re-explodes the corpus for
    # each consumer (one full extra pass at 100 TB).
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .persist()
    )
    total = counts.agg(F.sum("c").alias("n"))
    lm = counts.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("c") / F.col("n")).alias("logp")
    )
    if vocab_size is not None:
        lm = lm.orderBy(F.desc("logp"), F.asc("token")).limit(vocab_size)
    if materialize:
        lm = lm.localCheckpoint(eager=True)
        counts.unpersist()
    return lm


def unigram_perplexity(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float = -20.0,
) -> DataFrame:
    """Per-document perplexity under a unigram LM: (id, n_tokens,
    avg_neg_logprob, perplexity = exp(avg_nll)). Tokens outside the
    LM's vocabulary score ``oov_logp``.

    Plan: explode tokens (linear, no shuffle until the count agg),
    LEFT join the broadcast LM, one hash-aggregate per doc. The whole
    scoring path is codegen Column expressions — this replaces a
    per-document KenLM call with a broadcast join at scan speed."""
    toks = tokens_col(F.lower(F.col(text_col)))
    exploded = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )
    joined = exploded.join(F.broadcast(lm), "token", "left").select(
        F.col(id_col),
        F.coalesce(F.col("logp"), F.lit(float(oov_logp))).alias("logp"),
    )
    nll = -F.sum("logp") / F.count(F.lit(1))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        round_det(nll, 4).alias("avg_neg_logprob"),
        round_det(F.exp(nll), 4).alias("perplexity"),
    )


def feature_hash_embed(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Text → dense embedding via the feature-hashing trick
    (Weinberger et al. 2009): each token hashes to a bucket in
    [0, dim) with a ±1 sign, signed counts accumulate per bucket, and
    the vector is optionally L2-normalized. A REAL (if simple)
    embedding — hashed bag-of-words — whose output feeds the ANN /
    semantic-dedup operators directly, closing the text→vector→
    similarity loop inside the engine; swap in a model-backed
    mapInPandas encoder for learned embeddings with the same output
    schema.

    Hashing uses md5 (not xxhash64) so the same bucket/sign function
    is expressible in any engine — reproducible features across
    engines and runs, like the md5-bucket sampler.

    Plan shape: explode tokens → ONE hash-aggregate on (id, bucket) →
    ONE hash-aggregate on id assembling the dense array via
    map_from_entries + a sequence lookup (missing buckets → 0.0).
    Both shuffles key on the id (the second reuses the first's
    partitioning modulo the bucket column); no UDFs, no pivot.

    Returns (id, embedding array<double>, n_tokens bigint).
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    exploded = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % dim
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(F.md5("token"), 9, 1), 16, 10).cast("bigint") % 2 == 0, 1.0
    ).otherwise(-1.0)
    by_bucket = (
        exploded.select(F.col(id_col), bucket.alias("bucket"), sign.alias("s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").alias("w"), F.count(F.lit(1)).alias("n"))
    )
    assembled = by_bucket.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "w"))
        ).alias("__m"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
    )
    if normalize:
        norm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda a, v: a + v * v))
        dense = F.transform(
            dense, lambda v: F.when(norm > 0, v / norm).otherwise(F.lit(0.0))
        )
    return assembled.select(F.col(id_col), dense.alias("embedding"), "n_tokens")


def bigram_pmi(
    df: DataFrame,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information, ``pmi = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) )``,
    restricted to bigrams seen at least ``min_count`` times (PMI is
    noise-dominated at low counts). Returns (w1, w2, n_pair, pmi)
    ranked pmi desc / (w1, w2) asc — the phrase-detection signal
    behind tokenizer-vocab curation and boilerplate discovery.

    Scale design (100 TB): bigrams are built INSIDE the token array
    (``zip_with`` over two slices — pure Column work, no posexplode
    self-join on (doc, pos), which would shuffle every token twice).
    Three hash aggregations follow (pair counts, unigram counts,
    global totals), all with map-side partials; the unigram frame is
    |vocab|-sized and joined twice broadcast-style. The min_count
    filter runs BEFORE the joins, so only surviving bigrams move.
    """
    toks = F.filter(
        tokens_col(F.lower(F.col(text_col))), lambda t: t != ""
    )
    arr = df.select(toks.alias("__ts")).filter(F.size("__ts") >= 2)
    pairs_col = F.zip_with(
        F.slice(F.col("__ts"), 1, F.size("__ts") - 1),
        F.slice(F.col("__ts"), 2, F.size("__ts") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = arr.select(F.explode(pairs_col).alias("p")).select("p.w1", "p.w2")
    pair_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("n_pair")
    )
    # Unigram counts over ALL tokens (not just bigram members), matching
    # the marginal distribution the PMI denominator models.
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("n_w"))
    )
    totals = pair_counts.agg(
        F.sum("n_pair").alias("n_bi")
    ).crossJoin(uni.agg(F.sum("n_w").alias("n_uni")))
    surviving = pair_counts.filter(F.col("n_pair") >= min_count)
    scored = (
        surviving.join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .withColumnRenamed("n_w", "n_w1")
        .join(
            F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.floor(
                F.log(
                    (F.col("n_pair") / F.col("n_bi"))
                    / ((F.col("n_w1") / F.col("n_uni")) * (F.col("n_w2") / F.col("n_uni")))
                )
                * 10000.0
                + 0.5
            )
            / 10000.0,
        )
    )
    return (
        scored.select(
            "w1", "w2", F.col("n_pair").cast("bigint").alias("n_pair"), "pmi"
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every token k-gram, slide a
    window of ``w`` consecutive hashes, and select each window's
    minimum (rightmost on ties). The selected (position, hash) set is
    the fingerprint: guaranteed to share a selection with any copy of
    a passage ≥ w+k-1 tokens long, at expected density 2/(w+1) —
    the local, position-robust upgrade over fingerprint()'s global
    prefix/whole-doc hashes for plagiarism/near-copy detection.

    Pure array Column expressions — the k-gram strings, their md5→
    60-bit hashes, and the per-window rightmost-argmin all run inside
    one projection (O(n·w) work per doc, w is small); array_distinct
    collapses the window overlaps, one explode emits (id, pos,
    fp_hash). No shuffle at all until whatever the caller aggregates.
    Documents shorter than k+w-1 tokens emit nothing (no full window
    exists — match the boundary rather than inventing one).

    Returns (id, pos, fp_hash); pos is the 1-based k-gram index."""
    toks = F.filter(tokens_col(F.lower(F.col(text_col))), lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__ts")).filter(
        F.size("__ts") >= k + w - 1
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__ts") - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("__ts"), i, k)),
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
    )
    hb = base.select(F.col(id_col), hashes.alias("__hs"))
    sel = F.transform(
        F.sequence(F.lit(1), F.size("__hs") - (w - 1)),
        lambda i: F.struct(
            (
                i
                + w
                - F.array_position(
                    F.reverse(F.slice(F.col("__hs"), i, w)),
                    F.array_min(F.slice(F.col("__hs"), i, w)),
                )
            ).alias("pos"),
            F.array_min(F.slice(F.col("__hs"), i, w)).alias("fp_hash"),
        ),
    )
    return (
        hb.select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("__s"))
        .select(
            id_col,
            F.col("__s.pos").cast("bigint").alias("pos"),
            F.col("__s.fp_hash").alias("fp_hash"),
        )
    )


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame, int]:
    """Train a bigram language model's sufficient statistics:
    (pair_counts (w1, w2, c12), unigram_counts (w, c), vocab_size).
    Probabilities are rendered at SCORING time (bigram_perplexity)
    from these counts, because add-k smoothing needs the context
    count c(w1) for every scored bigram — including unseen ones — so
    a precomputed (pair → logp) table could never cover the query
    distribution.

    Same plan shape as bigram_pmi's count phase: bigrams built inside
    the token array (zip_with over two slices — no positional
    self-join), two hash aggregations with map-side partials. The
    unigram frame is |vocab|-sized and broadcasts into the scorer;
    vocab_size is a driver-side scalar (one count of a vocab-sized
    frame, the bpe_train boundedness class)."""
    toks = F.filter(tokens_col(F.lower(F.col(text_col))), lambda t: t != "")
    arr = df.select(toks.alias("__ts"))
    pairs_col = F.zip_with(
        F.slice(F.col("__ts"), 1, F.size("__ts") - 1),
        F.slice(F.col("__ts"), 2, F.size("__ts") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pair_counts = (
        arr.filter(F.size("__ts") >= 2)
        .select(F.explode(pairs_col).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
    )
    uni_counts = (
        arr.select(F.explode("__ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    if materialize:
        pair_counts = pair_counts.localCheckpoint(eager=True)
        uni_counts = uni_counts.localCheckpoint(eager=True)
    vocab_size = uni_counts.count()
    return pair_counts, uni_counts, vocab_size


def bigram_perplexity(
    df: DataFrame,
    pair_counts: DataFrame,
    uni_counts: DataFrame,
    vocab_size: int,
    k_smooth: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram LM:

        p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)

    — the next quality-filter rung above unigram_perplexity (word-
    order-aware: scrambled or template-stitched text scores high
    bigram perplexity even when its unigram mix looks clean). Unseen
    bigrams and unseen contexts are both well-defined through the
    smoothing (c terms coalesce to 0). Documents with fewer than two
    tokens emit no row. Returns (id, n_bigrams, avg_neg_logprob,
    perplexity), rounded for cross-engine comparison.

    Plan: bigrams inside the token array (zip_with slices), LEFT
    joins against the broadcast count frames, one hash aggregate per
    doc — the unigram_perplexity shape with a pair-keyed join."""
    toks = F.filter(tokens_col(F.lower(F.col(text_col))), lambda t: t != "")
    arr = df.select(F.col(id_col), toks.alias("__ts")).filter(
        F.size("__ts") >= 2
    )
    pairs_col = F.zip_with(
        F.slice(F.col("__ts"), 1, F.size("__ts") - 1),
        F.slice(F.col("__ts"), 2, F.size("__ts") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    exploded = arr.select(F.col(id_col), F.explode(pairs_col).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    kv = float(k_smooth) * float(vocab_size)
    scored = (
        exploded.join(F.broadcast(pair_counts), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni_counts.withColumnRenamed("w", "w1")), ["w1"], "left"
        )
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0.0)) + F.lit(float(k_smooth)))
                / (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(kv))
            ).alias("logp"),
        )
    )
    nll = -F.sum("logp") / F.count(F.lit(1))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        round_det(nll, 4).alias("avg_neg_logprob"),
        round_det(F.exp(nll), 4).alias("perplexity"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    group — Efraimidis–Spirakis A-Res: each row draws a reproducible
    uniform u from md5(id) and keeps key ``u^(1/w)``; the k largest
    keys per group are a weight-proportional sample. The training-mix
    primitive when docs should be kept in proportion to a quality or
    length weight rather than uniformly (contrast stratified_sample's
    per-stratum RATES).

    Content-addressed like deterministic_sample: same ids win on every
    engine, run, and partitioning, so mixes are byte-reproducible.

    Scale design (100 TB): the key is a narrow per-row expression
    inside the scan. Selection is a balanced TWO-PHASE top-k (r8 —
    the brute_force_topk reduction): a single per-group window would
    ship EVERY row of a group to one reducer — a monster task for any
    popular source — so rows first rank per (group, input partition)
    under the SAME total order and keep k, provably containing the
    global per-group top-k; the global rank then sees at most
    |partitions| × k rows per group. Output rows are identical to the
    single-window plan (the driver-seated sample_weighted entry
    hash-checks this against DuckDB's single-window oracle). For
    global (ungrouped) top-k pass a constant group column. Weights
    must be > 0; rows with NULL or non-positive weight are dropped
    (logged intent: unweightable).
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    order = [F.col("__ares_key").desc(), F.col(id_col).asc()]
    keyed = df.filter(F.col(weight_col) > 0).withColumn("__ares_key", key)
    w_local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(*order)
    pruned = (
        keyed.withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= k)
        .drop("__lrn")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__ares_key", "__rn")
    )


def source_token_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Training-mix distribution monitoring: per-source token-level
    Shannon entropy and KL divergence against the whole-corpus token
    distribution — the quantitative answer to 'which source is
    off-distribution / repetitive?' (low entropy = templated text;
    high KL = vocabulary far from the corpus mix). Output:
    (group, n_tokens, entropy, kl_vs_corpus) in nats.

    KL is well-defined without smoothing because every source token
    is by construction inside the corpus distribution (q > 0
    wherever p > 0).

    Scale design (100 TB): one explode+hash-agg to (group, token, n)
    — map-side partials collapse repeats — then |vocab|-sized
    aggregates for the marginals joined back ON TOKEN (AQE broadcasts
    when small) and one final per-group sum. No pair space, no
    windows; the token frame is the only large intermediate.
    """
    toks = F.filter(tokens_col(F.lower(F.col(text_col))), lambda t: t != "")
    tc = (
        df.select(F.col(group_col), F.explode(toks).alias("w"))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    ).persist()
    src_tot = tc.groupBy(group_col).agg(F.sum("n").alias("__ns"))
    glob = tc.groupBy("w").agg(F.sum("n").alias("__ng"))
    gt = glob.agg(F.sum("__ng").alias("__g"))
    p = F.col("n") / F.col("__ns")
    q = F.col("__ng") / F.col("__g")
    out = (
        tc.join(src_tot, group_col)
        .join(glob, "w")
        .crossJoin(F.broadcast(gt))
        .groupBy(group_col, "__ns")
        .agg(
            (-F.sum(p * F.log(p))).alias("entropy"),
            F.sum(p * F.log(p / q)).alias("kl_vs_corpus"),
        )
        .select(
            group_col,
            F.col("__ns").cast("bigint").alias("n_tokens"),
            "entropy",
            "kl_vs_corpus",
        )
    )
    # the output is |groups| rows — materializing it eagerly costs
    # nothing, and releasing the corpus-vocabulary-sized token cache
    # before returning keeps long-running drivers leak-free (the
    # pagerank/build_unigram_lm lifecycle discipline)
    out = out.localCheckpoint(eager=True)
    tc.unpersist()
    return out


def bpe_word_histogram(
    df: DataFrame,
    text_col: str = "text",
    vocab_cap: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Phase 1 of BPE training — the only data-proportional step:
    pre-tokenize the corpus (pretokens_col, the GPT-2-style split)
    and aggregate to a (word, freq) histogram in ONE explode +
    hash-aggregate shuffle (map-side partials collapse repeats).
    Output is |distinct pretokens| rows — bounded by VOCABULARY, not
    corpus size, which is what makes driver-side merge learning sound
    at 100 TB (HF tokenizers / sentencepiece train on exactly this
    capped histogram). ``vocab_cap`` keeps the top-V words by
    frequency (word asc tie-break) as a hard driver-memory bound."""
    t = F.col(text_col)
    toks = pretokens_col(F.lower(t) if lowercase else t)
    hist = (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    if vocab_cap is not None:
        hist = hist.orderBy(F.desc("freq"), F.asc("word")).limit(vocab_cap)
    return hist


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    vocab_cap: int | None = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn a byte-pair-encoding merge table from a corpus
    (Sennrich et al. 2016) — the tokenizer-training step every LLM
    data pipeline runs before token counting means anything.

    Two phases with an honest scale boundary:
    - distributed: bpe_word_histogram — one shuffle, vocabulary-sized
      output, the ONLY pass over the corpus;
    - driver: the classic merge loop over the histogram, with an
      incrementally-maintained pair-count index (each merge touches
      only the words containing the merged pair), so the loop is
      O(n_merges × words-containing-pair), not O(n_merges × vocab).
      This part is inherently sequential — distributing it buys
      nothing because the input is already vocabulary-sized.

    Deterministic: ties in pair frequency break lexicographically.
    Returns the ordered merge list [(left, right), ...] (index =
    merge rank), the exact format bpe_apply consumes.

    ``vocab_cap=None`` is guarded (VERDICT r7 §wrong 2): the merge
    loop needs the WHOLE histogram driver-side, and at web-corpus
    scale an uncapped distinct-word histogram is a driver OOM. If the
    uncapped histogram exceeds the default cap, this raises with the
    bounded alternative instead of silently collecting — the same
    fail-loud discipline as band_join_bucketed's duplicate-left
    guard."""
    from collections import Counter, defaultdict

    hist = bpe_word_histogram(df, text_col, vocab_cap, lowercase)
    if vocab_cap is None:
        # one cheap count before the unbounded collect; the default
        # cap is the documented safe driver size
        n_words = hist.count()
        if n_words > MAX_UNCAPPED_VOCAB:
            raise ValueError(
                f"bpe_train(vocab_cap=None) would collect {n_words} distinct "
                f"words driver-side (bound {MAX_UNCAPPED_VOCAB}); pass "
                "vocab_cap (default 50_000 keeps the top-V by frequency — "
                "the HF/sentencepiece training recipe) or pre-filter the "
                "corpus"
            )
    rows = hist.collect()
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        words[tuple(r["word"])] = words.get(tuple(r["word"]), 0) + int(r["freq"])

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, f in words.items():
        for p in zip(w, w[1:]):
            pair_counts[p] += f
            pair_words[p].add(w)

    def _merge_word(w: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
        out, i, merged = [], 0, pair[0] + pair[1]
        while i < len(w):
            if i + 1 < len(w) and w[i] == pair[0] and w[i + 1] == pair[1]:
                out.append(merged)
                i += 2
            else:
                out.append(w[i])
                i += 1
        return tuple(out)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = +pair_counts  # drop non-positive entries
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        best = min(p for p, n in pair_counts.items() if n == best_n)
        merges.append(best)
        for w in list(pair_words[best]):
            f = words.pop(w, None)
            if f is None:
                continue
            for p in zip(w, w[1:]):
                pair_counts[p] -= f
                if w in pair_words[p] and p != best:
                    pair_words[p].discard(w)
            nw = _merge_word(w, best)
            words[nw] = words.get(nw, 0) + f
            for p in zip(nw, nw[1:]):
                pair_counts[p] += f
                pair_words[p].add(nw)
        del pair_words[best]
        pair_counts.pop(best, None)
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode text with a learned merge table: pre-tokenize, then
    greedily apply the LOWEST-RANK applicable merge per word until
    none applies (the GPT-2 encode loop). Adds ``out_col``
    (array<string>) and ``n_bpe_tokens`` — the REAL token count the
    n_tok whitespace proxy approximates.

    Scale design: the merge table broadcasts with the Arrow-batched
    mapInPandas closure (vocab-sized, ~MBs); per batch a word→tokens
    memo collapses the Zipf-heavy repeats, so the merge loop runs
    roughly once per DISTINCT word per batch, not once per token.

    Pre-tokenization runs through the SAME Spark expression the
    trainer used (pretokens_col over F.lower), not a Python re —
    Java's ``\\s`` is ASCII-only while Python's matches Unicode
    whitespace (NBSP, U+2028, …), and str.lower diverges from
    F.lower on some codepoints, so a Python-side re-split could
    produce words no merge ever saw and break the documented
    n_pretokens ≤ n_bpe_tokens invariant (ADVICE r7)."""
    rank = {p: i for i, p in enumerate(merges)}

    def _encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    pretok_col = "__bpe_pretoks"

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            memo: dict[str, list[str]] = {}
            toks_out, counts = [], []
            for words in pdf[pretok_col]:
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = _encode_word(w)
                    toks.extend(enc)
                toks_out.append(toks)
                counts.append(len(toks))
            pdf = pdf.drop(columns=[pretok_col])
            pdf[out_col] = toks_out
            pdf["n_bpe_tokens"] = pd.array(counts, dtype="int64")
            yield pdf

    import pyspark.sql.types as T

    schema = T.StructType(
        list(df.schema)
        + [
            T.StructField(out_col, T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )
    t = F.col(text_col)
    pre = df.withColumn(
        pretok_col, pretokens_col(F.lower(t) if lowercase else t)
    )
    return pre.mapInPandas(_encode, schema)


def save_bpe_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge table as parquet (rank, left, right) —
    pickle-free, engine-neutral, so the tokenizer trained in one job
    is loadable by any later scoring job (the save/load_ivf_pq_index
    persistence discipline)."""
    rows = [(i, l, r) for i, (l, r) in enumerate(merges)]
    spark.createDataFrame(rows, "rank bigint, left string, right string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_bpe_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge table saved by save_bpe_merges, in rank order,
    ready for bpe_apply."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS of ln(count)
    against ln(rank) over the frequency-ranked vocabulary — the
    one-row corpus health check (natural language sits near slope −1;
    a far-off slope flags template spam, boilerplate floods, or
    tokenizer damage; r² measures how Zipfian the corpus is at all).
    Returns (n_types, n_tokens, slope, intercept, r2).

    Plan: one explode + hash-agg builds the vocabulary counts, the
    rank window runs over the VOCAB-sized frame (not the corpus —
    bounded like bpe_train's histogram), and the fit is Spark's
    single-pass mergeable regr_* aggregates (a21's proven-parity
    path)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    pts = counts.select(
        "c",
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log("c").alias("lc"),
    )
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.regr_slope("lc", "lr").alias("slope"),
        F.regr_intercept("lc", "lr").alias("intercept"),
        F.regr_r2("lc", "lr").alias("r2"),
    )
