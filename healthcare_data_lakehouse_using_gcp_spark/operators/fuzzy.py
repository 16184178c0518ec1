"""Fuzzy string matching (entity resolution): find all pairs within
a small edit distance WITHOUT the quadratic compare-everything join.

Blocking scheme: SymSpell-style deletion neighborhoods. If
lev(a, b) ≤ d, then some common string is reachable from BOTH a and b
by deleting at most d characters each (a substitution is one deletion
on each side at the same spot; an insertion in b is one deletion in b;
transpositions cost two). So the set of ≤d-deletion variants of a and
of b intersect — making the variant string an EXACT equi-join key
whose matches are a guaranteed SUPERSET of the true pairs. A final
``levenshtein() ≤ d`` filter (JVM built-in) removes the false
candidates, so the result is exactly the quadratic join's answer.

Scale design (100 TB):
- per-row fan-out is len^d / d! variant keys (len+1 at d=1) — linear
  blow-up, generated as a pure Column ``transform(sequence(...))``
  expression inside the scan stage, no UDF;
- the candidate join is a plain equi-join on the variant key: shuffle
  on variant, pairs materialize only within a block. Block sizes are
  bounded by how many real strings collapse onto one variant — the
  fuzzy analogue of dedup's band buckets (a pathological key, e.g.
  millions of equal-ish strings, is the same skew as any hot join key
  and takes the same remedies: AQE skew split / salting);
- verification touches candidates only, never the n² pair space.

This is the same bucket-then-verify shape as MinHash-LSH dedup
(operators/dedup) with a DIFFERENT guarantee: deletion blocking is
lossless for edit distance, so the output is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants_col(col_name: str, d: int = 1):
    """Array Column of all strings reachable from ``col_name`` by
    deleting 0..d characters (distinct). Pure SQL transform/sequence
    expressions — stays in whole-stage codegen; d is capped at 2
    (variant count grows ~len^d)."""
    if d not in (1, 2):
        raise ValueError("deletion blocking supports d in {1, 2}")

    def one_deletion(expr: str) -> str:
        # all single-character deletions of the string expression
        return (
            f"transform(sequence(1, greatest(length({expr}), 1)), i -> "
            f"concat(substring({expr}, 1, i - 1), "
            f"substring({expr}, i + 1, length({expr}) - i)))"
        )

    c = col_name
    variants = f"array_union(array({c}), {one_deletion(c)})"
    if d == 2:
        variants = (
            f"array_distinct(flatten(transform({variants}, v -> "
            f"array_union(array(v), {one_deletion('v')}))))"
        )
    return F.array_distinct(F.expr(variants))


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``str_col`` values are within
    ``max_distance`` Levenshtein edits — EXACTLY the quadratic
    self-join's answer, computed via deletion blocking (module
    docstring). Output: (id_a, id_b, distance)."""
    v = df.select(
        F.col(id_col),
        F.col(str_col),
        F.explode(deletion_variants_col(str_col, max_distance)).alias("__block"),
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(str_col).alias("__sa"), "__block"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(str_col).alias("__sb"), "__block"
    )
    cands = (
        a.join(b, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return (
        cands.withColumn("distance", F.levenshtein("__sa", "__sb").cast("bigint"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_str: str,
    right_str: str,
    max_distance: int = 1,
) -> DataFrame:
    """Two-table fuzzy equi-join (dirty → clean reference matching):
    every (left, right) pair within ``max_distance`` edits. Same
    deletion-blocking plan as fuzzy_self_join."""
    a = left.select(
        F.col(left_id).alias("__ida"),
        F.col(left_str).alias("__sa"),
        F.explode(deletion_variants_col(left_str, max_distance)).alias("__block"),
    )
    b = right.select(
        F.col(right_id).alias("__idb"),
        F.col(right_str).alias("__sb"),
        F.explode(deletion_variants_col(right_str, max_distance)).alias("__block"),
    )
    cands = a.join(b, "__block").select("__ida", "__idb", "__sa", "__sb").distinct()
    return (
        cands.withColumn("distance", F.levenshtein("__sa", "__sb").cast("bigint"))
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("__ida").alias(left_id),
            F.col("__idb").alias(right_id),
            "distance",
        )
    )


def fs_weights(m: float, u: float, scale: int = 1000) -> tuple[int, int]:
    """Fellegi–Sunter field weights as INTEGER milli-bits:
    agreement weight log2(m/u), disagreement weight
    log2((1−m)/(1−u)), each scaled by ``scale`` and rounded ONCE to
    an integer literal. Integer weights make every pair's composite
    score an exact integer — order-independent, hash-exact across
    engines — while losing nothing practical (0.001-bit resolution).
    m = P(field agrees | pair is a true match), u = P(agrees | pair
    is a non-match); requires 0 < u < m < 1 (agreement must be MORE
    likely among matches, else the field's evidence is inverted)."""
    import math

    if not (0.0 < u < m < 1.0):
        raise ValueError(
            f"fs_weights: need 0 < u < m < 1, got m={m}, u={u} — m is "
            "P(agree | match), u is P(agree | non-match)"
        )
    wa = round(scale * math.log2(m / u))
    wd = round(scale * math.log2((1.0 - m) / (1.0 - u)))
    return wa, wd


def fs_linkage_scores(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[tuple[str, "F.Column", int, int]],
    match_threshold: int,
    possible_threshold: int,
    digits: int = 6,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter,
    JASA 1969) — the principled scoring layer above blocking/fuzzy
    candidate generation: each candidate pair accumulates per-field
    log-likelihood-ratio weights (agreement → log2(m/u), disagreement
    → log2((1−m)/(1−u)), missing → 0: no evidence either way) and is
    classified match / possible / non_match by the two thresholds.

    ``fields`` is a list of (name, agreement Column over the
    suffixed pair frame, w_agree, w_disagree) — build agreement
    expressions against columns renamed ``<col>_a`` / ``<col>_b``,
    and take the integer milli-bit weights from ``fs_weights`` so the
    composite score is an EXACT integer (hash-exact cross-engine; a
    float weight sum would be reassociation-ordered).

    Output per tier: n_pairs, total/min/max score and the exact-ratio
    mean score — the review-queue sizing numbers (how many pairs land
    in the clerical-review band) rather than the raw pair dump.

    Scale design (100 TB): candidate pairs come from an EQUI-join on
    the blocking key (Catalyst extracts the equality conjuncts;
    pairs materialize only within blocks — the fuzzy_self_join
    discipline; a hot block is ordinary join skew: AQE split or
    salt). Per-pair scoring is pure Column arithmetic in the join's
    output stage; ONE final hash agg to ≤3 tier rows. The id_a <
    id_b residual keeps each unordered pair once."""
    from functools import reduce as _reduce

    from ..functions.scalars import round_det

    if not block_cols:
        raise ValueError(
            "fs_linkage_scores: blocking columns are required — an "
            "unblocked self-join is the O(n²) pair space this operator "
            "exists to avoid"
        )
    a = df.select([F.col(c).alias(f"{c}_a") for c in df.columns])
    b = df.select([F.col(c).alias(f"{c}_b") for c in df.columns])
    cond = _reduce(
        lambda x, y: x & y,
        [F.col(f"{c}_a") == F.col(f"{c}_b") for c in block_cols],
    ) & (F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    pairs = a.join(b, on=cond)
    score = F.lit(0).cast("bigint")
    for name, agree, wa, wd in fields:
        score = score + (
            F.when(agree, F.lit(int(wa)))
            .when(~agree, F.lit(int(wd)))
            .otherwise(F.lit(0))  # NULL agreement: no evidence
            .cast("bigint")
        )
    scored = pairs.select(score.alias("__score"))
    tier = (
        F.when(F.col("__score") >= match_threshold, "match")
        .when(F.col("__score") >= possible_threshold, "possible")
        .otherwise("non_match")
    )
    agg = scored.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__score").alias("__total"),
        F.min("__score").alias("min_score"),
        F.max("__score").alias("max_score"),
    )
    return agg.select(
        "tier",
        "n_pairs",
        F.col("__total").cast("bigint").alias("total_score"),
        "min_score",
        "max_score",
        round_det(
            F.col("__total").cast("double")
            / F.col("n_pairs").cast("double"),
            digits,
        ).alias("avg_score"),
    )
