"""Model-evaluation battery: exact AUC-ROC, calibration bins,
precision/recall over a threshold grid — all single-pass Column
expressions, all group-able.

Beyond-reference LLM-data-pipeline stage: a corpus pipeline that
TRAINS a quality classifier (operators/mlquality) also has to
EVALUATE it — is the score actually separating good from junk
(AUC), are its probabilities honest (calibration / reliability
diagram), and where should the keep-threshold sit
(precision/recall/F1 across a grid)? The reference has no ML layer
at all (its quality gate is a fixed AVG threshold,
data_transformation_dag.py's quality check); this module is the
evaluation half of the CCNet/LLaMA-style filtering loop.

Scale design (100 TB):

- ``auc_roc`` never ranks rows. The textbook rank-sum (Mann-Whitney)
  formulation needs a per-row global sort; instead we aggregate to
  ONE ROW PER DISTINCT SCORE first (hash agg, map-side partial), then
  run the pair-counting sum as a cumulative window over that
  distinct-score frame — O(|distinct scores|) window state, keyed by
  the group columns. Ties are exact, not approximated: a (pos, neg)
  pair at the SAME score contributes 1/2 by the trapezoidal
  definition, which the integer numerator carries as
  2·pos·neg_below + pos·neg_equal (everything stays BIGINT until the
  final division — bit-identical across engines, regen-robust).
- ``calibration_bins`` is one hash aggregation over a computed bin
  key; ``precision_recall_at`` aggregates per distinct score, then
  explodes the LITERAL threshold grid over that small frame (never
  over the raw rows) — |grid| × |distinct scores| intermediate, no
  cartesian join, no second scan.
- Nothing collects to the driver; every output is a small
  per-group/per-bin/per-threshold frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _round6(c):
    """Half-up 6-dp rounding via FLOOR — the corpus's cross-engine
    rounding idiom (DuckDB ROUND is banker's-free but float noise on
    *engine-computed* values differs; inputs here are exact-integer
    ratios, so both engines see identical doubles)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact (tie-aware) ROC AUC of ``score_col`` ranking the binary
    ``label_col``, per ``by`` group.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) over all
    (positive, negative) pairs. Computed without ranking rows:
    aggregate (n, n_pos) per distinct score, then one cumulative
    window ordered by score gives each score's strictly-below
    negative count; the doubled numerator
    Σ_s [2·pos(s)·neg_below(s) + pos(s)·neg_eq(s)] and the
    denominator 2·P·N stay BIGINT — ``auc`` is their ratio (NULL for
    degenerate all-positive/all-negative groups, via try_divide).

    Rows with a NULL label are EXCLUDED up front: they are neither
    positive nor negative, so they belong to no (pos, neg) pair —
    and an all-NULL score run would otherwise NULL-poison the
    cumulative negative count.

    Output: by + n_pos, n_neg, auc_num2, auc (6-dp). A keyed window
    when ``by`` is non-empty; with by=[] the window is global but
    runs over the distinct-score frame (bounded by score
    cardinality, not rows)."""
    by = by or []
    df = df.where(F.col(label_col).isNotNull())
    lab = F.col(label_col).cast("bigint")
    per_score = df.groupBy(*by, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(lab).alias("__p"),
    )
    w = Window.partitionBy(*by).orderBy("__s")
    cum = per_score.withColumn(
        "__neg_lt",
        F.coalesce(
            F.sum(F.col("__n") - F.col("__p")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    out = cum.groupBy(*by).agg(
        F.sum("__p").alias("n_pos"),
        F.sum(F.col("__n") - F.col("__p")).alias("n_neg"),
        F.sum(
            F.lit(2) * F.col("__p") * F.col("__neg_lt")
            + F.col("__p") * (F.col("__n") - F.col("__p"))
        ).alias("auc_num2"),
    )
    return out.select(
        *by,
        "n_pos",
        "n_neg",
        "auc_num2",
        _round6(
            F.try_divide(
                F.col("auc_num2"),
                F.lit(2) * F.col("n_pos") * F.col("n_neg"),
            )
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    by: list[str] | None = None,
) -> DataFrame:
    """Reliability-diagram bins: fixed-width score bins over
    [lo, hi), per-bin count, positive fraction and mean score — is
    a claimed 0.8 really right 80% of the time? One hash
    aggregation (map-side partial); scores outside [lo, hi] clamp
    into the edge bins so no row silently drops.

    Rows with a NULL label are excluded (they can neither confirm
    nor refute a bin's claimed probability, and an all-NULL bin
    would NULL-poison frac_pos).

    Output: by + bin (0..n_bins-1), n, n_pos, frac_pos (6-dp),
    avg_score (6-dp)."""
    by = by or []
    df = df.where(F.col(label_col).isNotNull())
    s = F.col(score_col).cast("double")
    bin_raw = F.floor((s - F.lit(lo)) * n_bins / F.lit(hi - lo))
    bin_ = F.greatest(
        F.lit(0), F.least(F.lit(n_bins - 1), bin_raw.cast("bigint"))
    )
    lab = F.col(label_col).cast("bigint")
    agg = df.groupBy(*by, bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lab).alias("n_pos"),
        F.sum(s).alias("__score_sum"),
    )
    return agg.select(
        *by,
        "bin",
        "n",
        "n_pos",
        _round6(F.col("n_pos") / F.col("n")).alias("frac_pos"),
        _round6(F.col("__score_sum") / F.col("n")).alias("avg_score"),
    )


def lift_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Cumulative-gains / lift table: bucket rows into ``n_buckets``
    score-descending quantile buckets, then report per-bucket and
    cumulative capture — "the top decile of the model's scores holds
    3.2× its share of positives" is the table a corpus filter's
    keep-budget is negotiated over (keep the top-k% of documents:
    what fraction of the good ones survive?).

    NO per-row global rank (the textbook NTILE form needs one):
    aggregate to ONE ROW PER DISTINCT SCORE (hash agg, map-side
    partial), run a keyed cumulative-count window over that frame,
    and assign each score run to the bucket of its LAST row via
    exact integer ceiling division ``(cum_n·k + total − 1) div
    total``. Tie handling is therefore deterministic and engine-
    independent: all rows sharing a score land in one bucket
    (buckets flex around heavy ties instead of splitting them
    arbitrarily, the same contract NTILE cannot keep), which is why
    the whole table stays BIGINT-exact until the final 6-dp ratios.

    Output: by + bucket (1..k, empty buckets absent when a score run
    spans them), n, n_pos, cum_n, cum_pos, gain (= cum_pos /
    total_pos), capture (= cum_n / total_n), lift (= (cum_pos /
    cum_n) / (total_pos / total_n); NULL when the group has no
    positives). Ratios are divisions of exact BIGINTs — identical
    doubles cross-engine before the rounding. A NULL group key is a
    real group (the repo-wide contract): totals come from a window
    over the same keyed partitioning, never a name-based join that
    NULL keys would fall out of. Rows with a NULL LABEL count toward
    n / cum_n / capture (they are kept corpus volume) but contribute
    0 positives.

    Scale design (100 TB): window state is O(|distinct scores|) per
    group, never O(rows); per-group totals are an unbounded frame
    over the SAME distinct-score partitioning (no extra shuffle, no
    join); lift divides two exact double ratios instead of
    cross-multiplying BIGINTs, so it cannot overflow at any scale."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    by = by or []
    # NULL scores are unrankable (and engines disagree on NULL sort
    # placement under DESC) — excluded up front.
    df = df.where(F.col(score_col).isNotNull())
    lab = F.coalesce(F.col(label_col).cast("bigint"), F.lit(0))
    per_score = df.groupBy(*by, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(lab).alias("__p"),
    )
    w = Window.partitionBy(*by).orderBy(F.col("__s").desc())
    w_all = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        per_score.withColumn(
            "__cn",
            F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__tn", F.sum("__n").over(w_all))
        .withColumn("__tp", F.sum("__p").over(w_all))
    )
    bucket = F.expr(
        f"(__cn * {int(n_buckets)} + __tn - 1) div __tn"
    ).cast("bigint")
    per_bucket = (
        cum.withColumn("bucket", bucket)
        .groupBy(*by, "bucket", "__tn", "__tp")
        .agg(F.sum("__n").alias("n"), F.sum("__p").alias("n_pos"))
    )
    w2 = Window.partitionBy(*by).orderBy("bucket")
    cum2 = per_bucket.select(
        *by,
        "bucket",
        "n",
        "n_pos",
        F.sum("n").over(w2.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_n"
        ),
        F.sum("n_pos")
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_pos"),
        "__tn",
        "__tp",
    )
    base_rate = F.try_divide(
        F.col("__tp").cast("double"), F.col("__tn").cast("double")
    )
    return cum2.select(
        *by,
        "bucket",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        _round6(F.try_divide(F.col("cum_pos"), F.col("__tp"))).alias("gain"),
        _round6(F.col("cum_n").cast("double") / F.col("__tn")).alias(
            "capture"
        ),
        _round6(
            F.try_divide(
                F.col("cum_pos").cast("double") / F.col("cum_n"), base_rate
            )
        ).alias("lift"),
    )


def precision_recall_at(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list,
    by: list[str] | None = None,
) -> DataFrame:
    """Precision / recall / F1 of the rule ``score >= t`` for every
    ``t`` in a LITERAL threshold grid — the keep-threshold sweep a
    corpus filter runs before fixing its cut.

    The grid explodes over the per-distinct-score aggregate, not the
    raw rows: one hash agg to (score → n, n_pos), |grid| copies of
    that small frame, one final agg per (by, t). Thresholds with no
    qualifying rows still appear (tp = fp = 0, precision NULL) so
    the sweep's domain is the caller's grid, not the data's.

    Rows with a NULL label are excluded — tp/fp/fn are undefined for
    an unlabeled row, and an all-NULL score run would NULL-poison
    the confusion counts.

    Output: by + threshold, tp, fp, fn, precision, recall, f1
    (ratios 6-dp; NULL where undefined)."""
    if not thresholds:
        raise ValueError("empty threshold grid")
    by = by or []
    df = df.where(F.col(label_col).isNotNull())
    lab = F.col(label_col).cast("bigint")
    per_score = df.groupBy(*by, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(lab).alias("__p"),
    )
    grid = F.array(*[F.lit(t) for t in thresholds])
    exploded = per_score.withColumn("threshold", F.explode(grid))
    counted = exploded.groupBy(*by, "threshold").agg(
        F.sum(
            F.when(F.col("__s") >= F.col("threshold"), F.col("__p")).otherwise(
                F.lit(0)
            )
        ).alias("tp"),
        F.sum(
            F.when(
                F.col("__s") >= F.col("threshold"),
                F.col("__n") - F.col("__p"),
            ).otherwise(F.lit(0))
        ).alias("fp"),
        F.sum(
            F.when(F.col("__s") < F.col("threshold"), F.col("__p")).otherwise(
                F.lit(0)
            )
        ).alias("fn"),
    )
    precision = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    recall = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return counted.select(
        *by,
        "threshold",
        "tp",
        "fp",
        "fn",
        _round6(precision).alias("precision"),
        _round6(recall).alias("recall"),
        _round6(
            F.try_divide(
                F.lit(2) * F.col("tp"),
                F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
            )
        ).alias("f1"),
    )


def conformal_interval(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    role_col: str,
    alpha: float = 0.1,
    digits: int = 4,
) -> DataFrame:
    """Mondrian (group-conditional) SPLIT-CONFORMAL prediction
    intervals (Vovk et al., "Algorithmic Learning in a Random World";
    Lei et al., JASA 2018) — the distribution-free way to attach a
    finite-sample-valid ± band to ANY point predictor, per group.
    ``role_col`` partitions rows into 'train' / 'calib' / 'test'
    (deterministic assignment is the caller's job — e.g. an md5
    bucket of the row key, so both engines and every rerun see the
    same split).

    Per group: the point predictor is the TRAIN mean of
    ``value_col`` (the simplest exchangeability-respecting model —
    swap in any model upstream by adding a prediction column; the
    conformal machinery is identical); the nonconformity score is
    the absolute residual |y − ŷ|; q_hat is the k-th smallest CALIB
    residual with k = ⌈(n_calib + 1)·(1 − alpha)⌉ — the EXACT order
    statistic, no interpolation, which is what the finite-sample
    guarantee P(|y_test − ŷ| ≤ q_hat) ≥ 1 − alpha is proven for.
    TEST rows then report achieved coverage — the honest empirical
    check next to the theoretical target.

    Exactness: the corpus entry feeds integer-cents values, so the
    train mean is a ratio of exact integers (identical double on
    both engines), every residual is an exact double difference of
    identical inputs, the order statistic is selection (not
    arithmetic), and coverage is an exact integer ratio — the whole
    pipeline is hash-exact cross-engine with no reassociation
    window. Rounding at ``digits`` only cosmetifies the output.

    Fail-loud contracts: unknown role values raise (a typo'd role
    silently vanishing a split would corrupt the guarantee); any
    group where k > n_calib raises with the group named (alpha too
    small for the calibration size — q_hat would be undefined);
    groups missing any of the three splits raise. NULL values are
    excluded up front (no information); a NULL group key is a real
    group (eqNullSafe joins).

    Scale design (100 TB): train means = one hash agg (|groups|
    rows, broadcast back); calib quantile = ONE keyed window
    (row_number over residual order per group — no global sort);
    q_hat frame is |groups|-sized and broadcast onto test. No
    data-proportional collect; the only full-data operations are
    one agg, one keyed window, two broadcast joins."""
    from ..functions.scalars import round_det

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    v = F.col(value_col).cast("double")
    # integral inputs accumulate the train sum EXACTLY (decimal(38,0),
    # matching DuckDB's HUGEINT widening): the prediction is then one
    # double division of identical exact integers on both engines, so
    # residuals/ranks/q_hat are bit-identical — the hash-exactness
    # contract in the docstring. Float inputs keep double sums.
    vt = df.schema[value_col].dataType.typeName()
    acc = (
        F.col(value_col).cast("decimal(38,0)")
        if vt in ("byte", "short", "integer", "long")
        else v
    )
    base = df.where(v.isNotNull()).select(
        *group_cols,
        v.alias("__y"),
        acc.alias("__yacc"),
        F.col(role_col).alias("__role"),
    )
    # NULL-safe: ~isin() is NULL for a NULL role, which where() would
    # silently drop — exactly the silent vanish the guard exists for
    bad = base.where(
        F.col("__role").isNull()
        | ~F.col("__role").isin("train", "calib", "test")
    )
    bad_row = bad.select("__role").first()
    if bad_row is not None:
        raise ValueError(
            f"conformal_interval: unknown role {bad_row['__role']!r} in "
            f"{role_col!r} — every row must be 'train', 'calib' or 'test'"
        )
    counts = base.groupBy(*group_cols).agg(
        F.count(F.when(F.col("__role") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("__role") == "calib", 1)).alias("n_calib"),
        F.count(F.when(F.col("__role") == "test", 1)).alias("n_test"),
        F.sum(
            F.when(F.col("__role") == "train", F.col("__yacc"))
        ).alias("__train_sum"),
    )
    # k and the split-presence guard: both need only the |groups|-sized
    # counts frame — one driver scan of bounded size
    import math as _math

    k_expr = F.ceil(
        (F.col("n_calib") + 1) * F.lit(1.0 - alpha)
    ).cast("bigint")
    gframe = counts.withColumn("__k", k_expr)
    bad_g = gframe.where(
        (F.col("n_train") == 0)
        | (F.col("n_calib") == 0)
        | (F.col("n_test") == 0)
        | (F.col("__k") > F.col("n_calib"))
    ).first()
    if bad_g is not None:
        need = _math.ceil((bad_g["n_calib"] + 1) * (1.0 - alpha))
        raise ValueError(
            "conformal_interval: group "
            f"{[bad_g[c] for c in group_cols]!r} has splits "
            f"(train={bad_g['n_train']}, calib={bad_g['n_calib']}, "
            f"test={bad_g['n_test']}) and needs k={need} ≤ n_calib — "
            "every group requires all three splits and a calibration "
            "set large enough for alpha"
        )
    pred = gframe.select(
        *group_cols,
        "n_train",
        "n_calib",
        "n_test",
        "__k",
        (
            F.col("__train_sum").cast("double")
            / F.col("n_train").cast("double")
        ).alias("__pred"),
    )

    def _keyed(a: DataFrame, b: DataFrame) -> DataFrame:
        cond = None
        for c in group_cols:
            t = a[c].eqNullSafe(b[c])
            cond = t if cond is None else cond & t
        return a.join(F.broadcast(b), on=cond, how="inner").drop(
            *[b[c] for c in group_cols]
        )

    scored = _keyed(base, pred).withColumn(
        "__r", F.abs(F.col("__y") - F.col("__pred"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__r", "__y")
    qhat = (
        scored.where(F.col("__role") == "calib")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == F.col("__k"))
        .select(*group_cols, F.col("__r").alias("__qhat"))
    )
    test = _keyed(
        scored.where(F.col("__role") == "test").select(
            *group_cols, "__r", "n_train", "n_calib", "n_test", "__pred"
        ),
        qhat,
    )
    return test.groupBy(
        *group_cols,
        "n_train",
        "n_calib",
        "n_test",
    ).agg(
        round_det(F.max("__pred"), digits).alias("prediction"),
        round_det(F.max("__qhat"), digits).alias("q_hat"),
        round_det(
            F.count(F.when(F.col("__r") <= F.col("__qhat"), 1)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            digits,
        ).alias("coverage"),
        F.lit(round(1.0 - alpha, 6)).alias("target"),
    )
