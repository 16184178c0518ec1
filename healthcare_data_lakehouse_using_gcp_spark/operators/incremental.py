"""Incremental aggregate maintenance (incremental view maintenance
for distributive/algebraic rollups).

Beyond-reference scale pattern: the reference rebuilds its daily
rollups from scratch every dbt run (reports/daily models); at 100 TB
a daily delta is ~1/1000th of the fact, so recomputing the world is
a 1000× overspend. These operators keep a MERGEABLE state table —
count / sum / min / max / sum-of-squares per key — and fold delta
batches into it associatively, exactly the partial-aggregation
algebra Spark's own hash aggregate uses map-side, lifted to the
table level so it persists ACROSS runs:

    state = partial_rollup(base, keys, cols)           # once
    state = merge_rollup_states(state, partial_rollup(delta, ...))
    finalize_rollup(state, ...)                        # avg/var views

Invariant (oracle-proven in the corpus entry `incremental_rollup`
and pytest): merge(partial(A), partial(B)) ≡ partial(A ∪ B) — the
merged state finalizes to EXACTLY the from-scratch aggregate, to the
last bit for count/sum/min/max (pure integer/comparison algebra) and
to IEEE-sum-reordering for doubles.

Scale design: every step is one hash aggregation with map-side
combine; the state table is |keys|-sized, deltas shuffle only their
own keys. Retractions (deletes) fold in with ``weight=-1`` — counts
and sums are groups under +, so deletion is exact; min/max are NOT
retractable (a semilattice has no inverse), so with deletions
finalize only count/sum/avg/var or rebuild min/max from the base.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    weight: int = 1,
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Aggregate a batch to its mergeable state: per key and value
    column c — __n (row count), c__sum, c__min, c__max, c__sumsq.
    ``weight=-1`` encodes a retraction batch (see module docstring
    for what stays exact under deletion).

    ``distinct_cols`` (r8) adds mergeable APPROXIMATE distinct counts:
    exact COUNT(DISTINCT) has no bounded mergeable state (its state IS
    the distinct set), so each listed column keeps a binary
    HyperLogLog sketch (``d__hll``, Spark's native hll_sketch_agg) —
    states union associatively (merge ≡ rebuild within the HLL
    envelope), finalize estimates with ~2-5% relative error, and the
    state stays O(1) per key. Like min/max, sketches are NOT
    retractable (set union has no inverse)."""
    w = F.lit(weight)
    aggs = [F.sum(w).cast("bigint").alias("__n")]
    for c in value_cols:
        col = F.col(c).cast("double")
        aggs += [
            F.sum(col * w).alias(f"{c}__sum"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.sum(col * col * w).alias(f"{c}__sumsq"),
        ]
    for d in distinct_cols:
        aggs.append(F.hll_sketch_agg(F.col(d)).alias(f"{d}__hll"))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_rollup_states(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold two state tables into one: sums add, mins min, maxes max
    — associative and commutative, so states merge in any order and
    any grouping (tree-merge a year of dailies, fold one delta, …).
    One union + hash aggregation; no join."""
    stats = [c for c in a.columns if c not in keys]
    assert stats == [c for c in b.columns if c not in keys], "state schemas differ"
    aggs = []
    for c in stats:
        if c.endswith("__min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("__max"):
            aggs.append(F.max(c).alias(c))
        elif c.endswith("__hll"):
            aggs.append(F.hll_union_agg(c).alias(c))
        elif c == "__n":
            aggs.append(F.sum(c).cast("bigint").alias(c))
        else:
            aggs.append(F.sum(c).alias(c))
    return a.unionByName(b).groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def finalize_rollup(
    state: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    round_digits: int | None = 4,
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Render a state table as the user-facing aggregate: per value
    column — n, sum, min, max, avg, var_pop (sum-of-squares form:
    sumsq/n − (sum/n)², clamped at 0 for the negative-epsilon IEEE
    cases). ``round_digits`` applies deterministic floor(x·10^d+0.5)
    rounding so cross-engine comparisons are stable; pass None for
    raw doubles.

    Keys whose rows were FULLY retracted (weight=-1 folding __n to 0)
    are dropped, not emitted (ADVICE r7): finalizing them would yield
    n=0 with NULL avg/var (non-ANSI x/0 → NULL), which downstream
    consumers could misread as a real group."""

    def _r(col):
        if round_digits is None:
            return col
        m = 10**round_digits
        return F.floor(col * m + F.lit(0.5)) / m

    out = [F.col(k) for k in keys] + [F.col("__n").alias("n")]
    for c in value_cols:
        s, n = F.col(f"{c}__sum"), F.col("__n")
        mean = s / n
        var = F.greatest(F.col(f"{c}__sumsq") / n - mean * mean, F.lit(0.0))
        out += [
            _r(s).alias(f"{c}_sum"),
            _r(F.col(f"{c}__min")).alias(f"{c}_min"),
            _r(F.col(f"{c}__max")).alias(f"{c}_max"),
            _r(mean).alias(f"{c}_avg"),
            _r(var).alias(f"{c}_var"),
        ]
    for d in distinct_cols:
        out.append(
            F.hll_sketch_estimate(F.col(f"{d}__hll"))
            .cast("bigint")
            .alias(f"{d}_approx_distinct")
        )
    return state.filter(F.col("__n") > 0).select(*out)


# ---------------------------------------------------------------------
# Incremental JOIN maintenance (z-sets / DBSP bilinearity)
# ---------------------------------------------------------------------


def zset(df: DataFrame, weight: int = 1, weight_col: str = "__weight") -> DataFrame:
    """Lift a plain frame to a z-set: every row annotated with a
    signed multiplicity (+1 batch of inserts, -1 batch of
    retractions). The z-set representation (DBSP / differential
    dataflow) is what makes JOIN views incrementally maintainable the
    same way the rollup states above make aggregates maintainable."""
    return df.withColumn(weight_col, F.lit(int(weight)).cast("long"))


def consolidate(z: DataFrame, weight_col: str = "__weight") -> DataFrame:
    """Canonical z-set: identical rows folded to one row with the
    summed weight, zero-weight rows dropped (a fully retracted row
    disappears — the finalize_rollup __n>0 discipline for joins).
    One hash aggregate on the row itself."""
    cols = [c for c in z.columns if c != weight_col]
    return (
        z.groupBy(*cols)
        .agg(F.sum(weight_col).cast("long").alias(weight_col))
        .filter(F.col(weight_col) != 0)
    )


def join_delta(
    r_old: DataFrame,
    delta_r: DataFrame,
    s_old: DataFrame,
    delta_s: DataFrame,
    on: Sequence[str],
    weight_col: str = "__weight",
) -> DataFrame:
    """Signed delta of an inner equi-join under simultaneous batch
    updates to both inputs — the join bilinearity identity:

        Δ(R ⋈ S) = ΔR ⋈ S  ∪  R ⋈ ΔS  ∪  ΔR ⋈ ΔS

    (R, S = OLD states; all five frames are z-sets; output weights
    are the products of the matched rows' weights, consolidated).
    Retractions compose for free: a -1 delta row cancels exactly the
    join outputs it produced, because multiplication distributes the
    sign. Maintaining a 100 TB materialized join view then costs
    three joins whose smaller sides are DELTA-sized (the ΔR⋈S term
    shuffles the delta and probes the state — broadcast the delta
    when it fits), never a from-scratch recompute.

    Non-key columns of R and S must be disjoint (standard equi-join
    hygiene); pair with sources/snapshots.changes_between to derive
    the signed deltas directly from snapshot-table history."""
    from functools import reduce

    on = list(on)
    overlap = (set(r_old.columns) & set(s_old.columns)) - set(on) - {weight_col}
    if overlap:
        raise ValueError(
            f"non-key columns appear on both sides: {sorted(overlap)}; "
            "rename before join_delta"
        )

    def wjoin(a: DataFrame, b: DataFrame) -> DataFrame:
        a2 = a.withColumnRenamed(weight_col, "__wl")
        b2 = b.withColumnRenamed(weight_col, "__wr")
        return (
            a2.join(b2, on)
            .withColumn(weight_col, F.col("__wl") * F.col("__wr"))
            .drop("__wl", "__wr")
        )

    parts = [wjoin(delta_r, s_old), wjoin(r_old, delta_s), wjoin(delta_r, delta_s)]
    return consolidate(
        reduce(lambda x, y: x.unionByName(y), parts), weight_col
    )


def apply_delta(
    state: DataFrame, delta: DataFrame, weight_col: str = "__weight"
) -> DataFrame:
    """Fold a signed delta into a materialized z-set view:
    consolidate(state ∪ delta). The state stays weight-annotated;
    read it as a plain table by repeating rows per weight (or, for
    the common weight≤1 case, dropping the column)."""
    return consolidate(state.unionByName(delta), weight_col)


def partial_rollup_zset(
    z: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    weight_col: str = "__weight",
) -> DataFrame:
    """partial_rollup for a z-set: each row contributes its OWN
    signed multiplicity (__n = Σw, c__sum = Σ w·x, c__sumsq =
    Σ w·x²) instead of a batch-wide ±1. This is the composition
    piece that makes an AGGREGATE OVER A JOIN incrementally
    maintainable end to end:

        Δview  = join_delta(R, ΔR, S, ΔS, on)        # signed join rows
        state' = merge_rollup_states(state,
                     partial_rollup_zset(Δview, keys, cols), keys)
        finalize_rollup(state', keys, cols)           # == recompute

    — the grouped SUM/COUNT/AVG/VAR over a 100 TB join stays current
    for the cost of three delta-sized joins plus one delta-sized
    aggregation. The state schema matches partial_rollup's so the two
    merge freely, but the delta's c__min/c__max are emitted NULL
    (min/max are not retractable — module docstring — and a z-set
    delta's whole point is carrying retractions): after folding a
    delta, the merged min/max are as-of-the-last-full-rebuild bounds,
    exact only for count/sum/avg/var."""
    w = F.col(weight_col).cast("double")
    aggs = [F.sum(w).cast("bigint").alias("__n")]
    for c in value_cols:
        col = F.col(c).cast("double")
        aggs += [
            F.sum(col * w).alias(f"{c}__sum"),
            F.min(F.lit(None).cast("double")).alias(f"{c}__min"),
            F.max(F.lit(None).cast("double")).alias(f"{c}__max"),
            F.sum(col * col * w).alias(f"{c}__sumsq"),
        ]
    return z.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
