"""Data-level privacy / de-identification operators.

Beyond-reference, domain-aligned: the reference ships an
infrastructure-level HIPAA checker (encryption/IAM/audit-log posture,
security/compliance/hipaa_compliance_checker.py:37-360) but nothing
that inspects the DATA for re-identification risk. These operators
are that missing half — the Safe-Harbor/Expert-Determination toolkit
a healthcare lakehouse actually runs before sharing a dataset:

- k_anonymity_audit / l_diversity_audit: quasi-identifier group-size
  and sensitive-diversity risk reports (Sweeney's k-anonymity;
  Machanavajjhala's l-diversity);
- generalize_columns: banding / prefix-truncation / date-coarsening
  — the generalization step that raises k;
- suppress_rare_groups: drop rows whose quasi-identifier group is
  smaller than k (suppression, the enforcement counterpart).

They compose: audit → generalize → audit → suppress residual.
Free-text PHI masking is the separate text.scrub_pii operator.

Scale design (100 TB): every audit is ONE hash aggregation on the
quasi-identifier columns (map-side partial aggregation collapses
repeats before the shuffle); the reports are |groups|-sized, never
row-sized. suppress_rare_groups uses a full-partition window so the
per-group count and the filter share a single shuffle — no
agg-then-join second pass over the fact; generalization is pure
narrow Column expressions in the scan stage.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Groups of quasi-identifier values with fewer than ``k`` rows —
    each output row is an equivalence class whose members are
    re-identifiable below the k-anonymity bar. Empty result ⇒ the
    dataset is k-anonymous w.r.t. ``quasi_cols``.

    Output: quasi_cols + n (group size, bigint), smallest first."""
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") < k)
        .orderBy(F.col("n").asc(), *[F.col(c).asc() for c in quasi_cols])
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,  # noqa: E741  — the literature's name for the parameter
) -> DataFrame:
    """Quasi-identifier groups whose sensitive attribute takes fewer
    than ``l`` distinct values — k-anonymous groups can still leak
    when everyone in the group shares one diagnosis (homogeneity
    attack); distinct-l-diversity is the standard first gate.

    NULL sensitive values don't count toward diversity (an absent
    diagnosis discloses nothing). Output: quasi_cols + n (group
    size) + n_distinct_sensitive, least-diverse first."""
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("n_distinct_sensitive"),
        )
        .filter(F.col("n_distinct_sensitive") < l)
        .orderBy(
            F.col("n_distinct_sensitive").asc(),
            F.col("n").asc(),
            *[F.col(c).asc() for c in quasi_cols],
        )
    )


def generalize_columns(
    df: DataFrame, spec: Mapping[str, tuple]
) -> DataFrame:
    """Column generalization for de-identification — each spec entry
    replaces a column in place with its coarsened form:

    - ``("band", width)``: numeric → left edge of its width-sized
      band (floor(x/width)*width, bigint) — ages, balances, counts;
    - ``("prefix", n)``: string → first n characters — ZIP3, phone
      exchange (Safe Harbor's geographic truncation);
    - ``("year",)``: date/timestamp → January 1 of its year (Safe
      Harbor: all date elements except year removed);
    - ``("suppress",)``: column → NULL (full suppression).

    Pure narrow projections — generalization runs inside the scan
    stage and never shuffles."""
    out = df
    for col, rule in spec.items():
        kind = rule[0]
        if kind == "band":
            width = int(rule[1])
            out = out.withColumn(
                col,
                (F.floor(F.col(col) / F.lit(width)) * F.lit(width)).cast("bigint"),
            )
        elif kind == "prefix":
            out = out.withColumn(col, F.substring(F.col(col), 1, int(rule[1])))
        elif kind == "year":
            out = out.withColumn(col, F.trunc(F.col(col), "year"))
        elif kind == "suppress":
            out = out.withColumn(col, F.lit(None).cast(df.schema[col].dataType))
        else:
            raise ValueError(f"unknown generalization rule {rule!r} for {col!r}")
    return out


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    *,
    seed: int,
    count_name: str = "noisy_count",
    key_domain: DataFrame | None = None,
) -> DataFrame:
    """ε-differentially-private group counts — the release mechanism
    for publishing aggregate statistics (cohort sizes, per-diagnosis
    tallies) when even exact COUNTs leak membership: Laplace noise
    with scale 1/ε added to every group's count (sensitivity of a
    count under add/remove-one is 1, so scale b = 1/ε gives ε-DP).

    Noise is drawn by inverse-CDF from an md5-derived uniform keyed
    on (seed, group values): u ∈ (0,1) → b·sign(u−½)·ln(1−2|u−½|).
    Seeding makes a release REPRODUCIBLE — re-running the job
    publishes the same numbers instead of leaking a fresh sample of
    the noise each run (repeated fresh draws of the same statistic
    compose their ε budgets; a fixed-seed re-release does not). For a
    new release under a new budget, change ``seed``. The md5 path
    also makes the mechanism engine-reproducible (DuckDB rebuilds the
    identical noise), which is how the corpus entry hash-checks it.

    **The seed is a SECRET KEY, not a convenience.** The noise is a
    deterministic function of (seed, group values); anyone who knows
    the seed recomputes it exactly and recovers the true counts — the
    ε-DP guarantee holds only against adversaries who do NOT know the
    seed (the same trust model as any keyed PRF; DP literature's
    "the random bits are private"). Hence no default: the caller must
    supply it, and must store/handle it like a credential, never in
    the released artifact. (ADVICE r8.)

    **Presence leakage**: releasing only the groups that OCCUR in the
    data leaks membership of rare groups regardless of noise (the row
    "diagnosis=X" existing at all reveals someone had X). Pass
    ``key_domain`` — a DataFrame declaring the full public domain of
    group keys — to release a noisy count for EVERY declared key
    (absent groups release noise around 0) and to drop undeclared
    groups from the release. Without it the released key set is the
    observed one, and the ε-DP claim covers the counts only, not the
    key set — acceptable only when the key set is public knowledge
    (e.g. a fixed enum).

    Noisy counts are clamped at 0; the TRUE count is deliberately not
    emitted alongside — callers wanting utility metrics should join
    back to the exact aggregate under their own access controls.

    Scale: one hash aggregation (map-side partials) + narrow noise
    projection; output is |groups|-sized (|domain|-sized with
    ``key_domain``, broadcast when small)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    b = 1.0 / float(epsilon)
    agg = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("__true_n")
    )
    if key_domain is not None:
        dom = key_domain.select(*group_cols).distinct()
        agg = dom.join(agg, list(group_cols), "left").fillna(
            0, subset=["__true_n"]
        )
    # u in (0,1): (first-8-hex-of-md5 + 0.5) / 2^32 — never exactly
    # 0, 1/2, or 1, so the inverse CDF below is finite
    key = F.concat_ws(
        "§", F.lit(str(seed)), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return agg.select(
        *group_cols,
        F.greatest(
            F.round(F.col("__true_n") + noise).cast("bigint"), F.lit(0)
        ).alias(count_name),
    )


def dp_noisy_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    *,
    seed: int,
    sum_name: str = "noisy_sum",
    key_domain: DataFrame | None = None,
) -> DataFrame:
    """ε-DP group sums with bounded contribution: each row's value is
    clipped to [0, clip] BEFORE aggregation (one row can then move
    the sum by at most ``clip``, so Laplace scale clip/ε gives ε-DP
    under add/remove-one), and seeded Laplace noise is added per
    group exactly as in dp_noisy_counts. The clip bound is the
    utility/privacy dial: too low biases the sum, too high wastes ε
    on noise — standard practice is a high data-independent
    percentile chosen WITHOUT looking at this dataset.

    Same seeding/reproducibility contract as dp_noisy_counts — and
    the same trust model: the ``seed`` is a SECRET KEY (the noise is
    a deterministic function of it; ε-DP holds only against
    adversaries who don't know it), hence required with no default.
    ``key_domain`` addresses presence-of-group leakage exactly as in
    dp_noisy_counts (absent groups release noise around a 0 sum).
    Noise keys on (seed, 'sum', group) so a joint count+sum release
    draws independent noise per statistic. Output sums are clamped
    at 0."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    b = float(clip) / float(epsilon)
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)), F.lit(float(clip))
    )
    agg = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum(clipped).alias("__true_sum")
    )
    if key_domain is not None:
        dom = key_domain.select(*group_cols).distinct()
        agg = dom.join(agg, list(group_cols), "left").fillna(
            0.0, subset=["__true_sum"]
        )
    key = F.concat_ws(
        "§",
        F.lit(str(seed)),
        F.lit("sum"),
        *[F.col(c).cast("string") for c in group_cols],
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    from ..functions.scalars import round_det

    # 2 dp, not 4: IEEE summation order differs across engines, and on
    # ~1e6-scale sums the cross-engine delta (~1e-6 absolute) would
    # straddle a 1e-4 rounding boundary too often to hash reliably
    return agg.select(
        *group_cols,
        F.greatest(
            round_det(F.col("__true_sum") + noise, 2), F.lit(0.0)
        ).alias(sum_name),
    )


def suppress_rare_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Keep only rows whose quasi-identifier group has ≥ ``k``
    members — record suppression for the residual classes that
    generalization couldn't merge over the bar. The surviving
    dataset is k-anonymous w.r.t. ``quasi_cols`` by construction.

    One shuffle: the group count is a full-partition window over the
    quasi columns (no ORDER BY ⇒ every row sees its group's total),
    and the filter rides the same exchange — cheaper than the
    aggregate + join-back alternative, which shuffles twice unless
    the group list broadcasts."""
    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") >= k)
        .drop("__n")
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """t-closeness risk report (Li, Li & Venkatasubramanian 2007):
    per quasi-identifier group, the distance between the group's
    sensitive-value distribution and the GLOBAL one — the refinement
    over l-diversity that catches skew attacks (a group can hold l
    distinct diagnoses yet still be 95% one of them). For categorical
    sensitive attributes the EMD with uniform ground distance is the
    total variation distance, ½·Σ_v |p_g(v) − p(v)|.

    Returns one row per group: quasi cols, n (group size),
    t_distance, and violates = t_distance > t. Empty report ⇒ the
    release satisfies t-closeness at the given t.

    Scale design (100 TB): one hash aggregation on
    (quasi, sensitive) — map-side combined — then group-sized math.
    Values ABSENT from a group still contribute their global mass,
    but no group×value grid is materialized: with P = Σ_present p(v),
    ½(Σ_present |p_g−p| + (1−P)) needs only the present pairs."""
    n_total = df.count()
    if n_total == 0:
        raise ValueError("t_closeness_audit on an empty frame")
    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("double").alias("__c_gv")
    )
    global_counts = df.groupBy(sensitive_col).agg(
        (F.count(F.lit(1)) / F.lit(float(n_total))).alias("__p_v")
    )
    joined = cell.join(F.broadcast(global_counts), sensitive_col)
    w_grp = [F.col(c) for c in quasi_cols]
    per_group = joined.groupBy(*w_grp).agg(
        F.sum("__c_gv").alias("__n_g"),
        F.sum("__p_v").alias("__p_present"),
        F.collect_list(F.struct("__c_gv", "__p_v")).alias("__cells"),
    )
    # Σ_present |c_gv/n_g − p_v| via a fold over the group's own cells
    # (group-sized arrays — |distinct sensitive values| per group)
    abs_sum = F.aggregate(
        F.col("__cells"),
        F.lit(0.0),
        lambda acc, s: acc
        + F.abs(s["__c_gv"] / F.col("__n_g") - s["__p_v"]),
    )
    dist = 0.5 * (abs_sum + (1.0 - F.col("__p_present")))
    return (
        per_group.select(
            *quasi_cols,
            F.col("__n_g").cast("bigint").alias("n"),
            dist.alias("t_distance"),
        )
        .withColumn("violates", F.col("t_distance") > F.lit(float(t)))
    )
