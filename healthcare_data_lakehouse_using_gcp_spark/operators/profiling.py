"""Table profiling: per-column quality summary in one pass.

The engine-side generalization of the reference's monitoring queries
(data_quality_monitoring.sql computes null-rate/range checks for a
fixed column list; a lakehouse needs the same for ANY table): row
count, null count, distinct count, min/max per column, emitted as one
tidy row per column.

Scale design (100 TB):
- Everything is ONE global aggregation pass over the table — null
  counts, min/max are plain mergeable aggregates (map-side partials,
  a single tiny shuffle of one partial row per partition).
- Exact COUNT(DISTINCT c) per column makes Catalyst EXPAND the input
  once per distinct column (N columns → N× the scan's rows through
  the first agg). Fine for profiling a sample or a partition;
  for full-table 100 TB profiles pass ``approx=True`` — HLL++
  sketches keep the plan a true single pass with fixed-size buffers.
- min/max are cast to string AFTER aggregation (per-column typed
  aggregation underneath, one string per column at the end).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column.

    Physical shape (optimization r16, guide §2.3/§5): min/max over a
    STRING (or other non-fixed-width) column has an immutable
    aggregation buffer that HashAggregateExec cannot hold, and the
    exact-distinct rewrite gives the first aggregation level real
    grouping keys (gid + distinct value over the Expand), so one
    string min/max used to force the WHOLE pass into a SortAggregate
    — a full local sort of the N×-expanded input on both sides of the
    exchange. In EXACT mode string min/max therefore run in a
    SEPARATE single-row GLOBAL aggregate (no grouping keys → no Sort;
    SortAggregate is sort-free and single-pass there) cross-joined
    back, so the expanded distinct pass stays a codegen HashAggregate.
    Values are byte-identical — the same aggregates over the same
    rows, only grouped into two scans of the pruned column set
    instead of one sorted pass. Note the second scan re-executes
    ``df``'s upstream lineage: profile a (cached or) stable scan, not
    an expensive uncached derivation, or the derivation runs twice.
    ``approx=True`` has no Expand and hence no sort to dodge, so the
    string aggregates stay in the ONE global aggregate and the
    documented single-pass contract holds (optimization r17, ADVICE
    r16: the unconditional split was planning two full scans on the
    100 TB path)."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    cols = list(columns) if columns is not None else list(df.columns)
    distinct_fn = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    hash_friendly = (NumericType, BooleanType, DateType, TimestampType, TimestampNTZType)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    str_aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            distinct_fn(c).alias(f"__nd_{c}"),
        ]
        mn = F.min(c).cast("string").alias(f"__mn_{c}")
        mx = F.max(c).cast("string").alias(f"__mx_{c}")
        if approx or isinstance(dtypes.get(c), hash_friendly):
            aggs += [mn, mx]
        else:
            str_aggs += [mn, mx]
    row = df.agg(*aggs)
    if str_aggs:
        row = row.crossJoin(F.broadcast(df.agg(*str_aggs)))
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def partition_skew(df: DataFrame) -> DataFrame:
    """Per-partition row counts: (partition_id, n_rows). The
    diagnostic half of every skew fix in this repo (salting, AQE skew
    join, salted per-source cap) — measure BEFORE salting. One narrow
    pass + a tiny agg (|partitions| rows through the shuffle)."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(F.col("__pid").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def skew_stats(df: DataFrame) -> dict:
    """Driver-side summary of ``partition_skew``: n_partitions,
    max/mean rows and their ratio (1.0 = perfectly even; ≳5 on a
    join/agg input predicts straggler tasks — reach for salting or
    repartitionByRange). Collects only |partitions| longs."""
    rows = partition_skew(df).collect()
    counts = [r["n_rows"] for r in rows] or [0]
    mean = sum(counts) / len(counts)
    return {
        "n_partitions": len(counts),
        "max_rows": max(counts),
        "mean_rows": mean,
        "skew_ratio": (max(counts) / mean) if mean else 0.0,
    }


def key_skew(df: DataFrame, key_cols: Sequence[str], k: int = 20) -> DataFrame:
    """Top-``k`` heaviest key groups with their share of the table:
    (key_cols..., n_rows, share). A share ≳ 1/shuffle_partitions
    means that key alone overflows one reducer — the precise trigger
    for salting it. One hash-agg + TakeOrderedAndProject; the global
    total rides along as a broadcast 1-row frame."""
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def profile_drift(
    old_profile: DataFrame,
    new_profile: DataFrame,
    null_rate_tol: float = 0.05,
) -> DataFrame:
    """Schema/statistics drift between two ``profile_table`` outputs —
    the monitoring primitive for 'did yesterday's load change shape?'
    (the engine-side generalization of the reference's fixed
    monitoring checks: this diffs ANY table's profile against its
    previous run).

    One row per column present in EITHER profile, with:
    - ``status``: 'added' / 'removed' / 'ok' / 'drifted'
    - ``null_rate_old`` / ``null_rate_new`` (4 dp) and
      ``null_rate_drifted`` when the rate moved more than
      ``null_rate_tol`` absolute
    - ``range_widened``: new min/max outside the old min/max (string
      comparison of the profile's casts — exact for same-typed
      columns' lexical bounds on dates/strings, indicative for
      numerics; profiles carry strings by design)
    - ``distinct_ratio``: n_distinct_new / n_distinct_old (4 dp,
      NULL when old is 0)

    Scale: both inputs are |columns|-row frames — the full-outer join
    and every comparison are driver-trivial; the expensive pass (the
    profile itself) already happened upstream, once per snapshot.
    """
    o = old_profile.alias("o")
    n = new_profile.alias("n")
    joined = o.join(
        n, F.col("o.column_name") == F.col("n.column_name"), "full_outer"
    )
    o_missing = F.col("o.column_name").isNull()
    n_missing = F.col("n.column_name").isNull()
    nr_old = F.col("o.n_nulls") / F.col("o.n_rows")
    nr_new = F.col("n.n_nulls") / F.col("n.n_rows")
    null_drift = F.abs(nr_new - nr_old) > null_rate_tol
    range_widened = (F.col("n.min_value") < F.col("o.min_value")) | (
        F.col("n.max_value") > F.col("o.max_value")
    )
    drifted = (
        F.coalesce(null_drift, F.lit(False))
        | F.coalesce(range_widened, F.lit(False))
    )
    status = (
        F.when(o_missing, F.lit("added"))
        .when(n_missing, F.lit("removed"))
        .when(drifted, F.lit("drifted"))
        .otherwise(F.lit("ok"))
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return joined.select(
        F.coalesce(F.col("o.column_name"), F.col("n.column_name")).alias(
            "column_name"
        ),
        status.alias("status"),
        r4(nr_old).alias("null_rate_old"),
        r4(nr_new).alias("null_rate_new"),
        F.coalesce(null_drift, F.lit(False)).alias("null_rate_drifted"),
        F.coalesce(range_widened, F.lit(False)).alias("range_widened"),
        F.when(
            F.col("o.n_distinct") > 0,
            r4(F.col("n.n_distinct") / F.col("o.n_distinct")),
        ).alias("distinct_ratio"),
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard ML-monitoring drift score (rule of thumb:
    <0.1 stable, 0.1-0.25 moderate shift, >0.25 investigate).
    ``psi = Σ_bins (p_new − p_old) · ln(p_new / p_old)`` over
    ``bins`` fixed-width buckets on [lo, hi] (outliers clamp into the
    edge buckets); per-bin shares are smoothed with +0.5 counts so
    empty bins stay finite and the score is deterministic. Output is
    the PER-BIN frame (bin, bin_lo, p_old, p_new, psi_contrib) —
    Σ psi_contrib is the headline score, and the per-bin view shows
    WHERE the distribution moved (profile_drift says THAT a column
    moved; this says where).

    Scale: each side is one bucketing hash-agg (|bins| rows out);
    the spine join and arithmetic are driver-trivial frames.
    """
    width = (hi - lo) / bins
    spark = old.sparkSession

    def _bucketed(df: DataFrame, name: str) -> DataFrame:
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col(value_col) - lo) / width).cast("bigint")
            ),
        )
        return df.groupBy(b.alias("bin")).agg(
            F.count(F.lit(1)).cast("double").alias(name)
        )

    spine = spark.range(bins).select(F.col("id").cast("bigint").alias("bin"))
    joined = (
        spine.join(_bucketed(old, "__no"), "bin", "left")
        .join(_bucketed(new, "__nn"), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("__no"), F.lit(0.0)).alias("__no"),
            F.coalesce(F.col("__nn"), F.lit(0.0)).alias("__nn"),
        )
    )
    tot = joined.agg(
        F.sum("__no").alias("__to"), F.sum("__nn").alias("__tn")
    )
    p_old = (F.col("__no") + 0.5) / (F.col("__to") + 0.5 * bins)
    p_new = (F.col("__nn") + 0.5) / (F.col("__tn") + 0.5 * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
            p_old.alias("p_old"),
            p_new.alias("p_new"),
            ((p_new - p_old) * F.log(p_new / p_old)).alias("psi_contrib"),
        )
    )
