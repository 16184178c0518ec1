"""Mergeable-sketch aggregation: bounded-memory answers to the two
questions a 100 TB monitoring/curation layer asks constantly — "what
are the heaviest keys?" and "what do the distributions look like?" —
without ever buffering a group's values.

Beyond-reference surface (the reference's monitoring layer,
data_quality_monitoring.sql, stops at AVG/COUNT): these are the
operators that keep profiling tractable when exact per-key state no
longer fits an executor.

Two deliberately different accuracy contracts:

- ``heavy_hitters_exact`` is EXACT with bounded memory: a two-pass
  Misra-Gries design. Pass 1 runs an MG summary with ``capacity``
  counters per task (mapInPandas — O(capacity) state regardless of
  partition size or key cardinality) and merges the per-partition
  summaries by summing lower bounds; the MG guarantee says every key
  with global count > n/(capacity+1) survives into the merged
  candidate set. Pass 2 recounts ONLY the candidates (broadcast
  semi-join — no second full shuffle of distinct keys) and takes the
  true top-k of the exact recounts. When the true k-th frequency
  clears the MG threshold the result is EXACTLY the unbounded-memory
  groupBy answer — which is what lets a DuckDB oracle hash-check it.
- ``cms_build``/``cms_query`` is APPROXIMATE with ONE-SIDED error:
  a count-min sketch as a (depth × width) count table built from
  pure Column expressions — point-frequency estimates for ANY key
  (est ≥ true always, overcount ≤ εN w.h.p.), mergeable across
  batches (``cms_merge``), md5-hashed so a DuckDB oracle reproduces
  every estimate bit-for-bit.
- ``sketch_profile`` is APPROXIMATE with a checked guarantee: Spark's
  built-in mergeable sketches (HyperLogLog++ approx_count_distinct,
  t-digest-style approx_percentile) computed SIDE BY SIDE with the
  exact aggregates in one pass, returning the exact values plus
  boolean flags asserting each sketch landed inside its documented
  error envelope. The flags make sketch accuracy itself an
  oracle-checkable fact (oracle side: exact values + literal TRUE).

Scale notes: both operators are single-exchange plans. At 100 TB the
exact side of ``sketch_profile`` is the part you'd drop (exact
COUNT(DISTINCT) shuffles every distinct pair; exact percentile
buffers each group) — the sketches are the product, the exact columns
are the check-scale harness. ``heavy_hitters_exact`` keeps both
passes scale-safe: pass 1 state is O(capacity) per task and its merge
output is ≤ tasks×capacity rows; pass 2 aggregates only rows whose
key is in the (broadcast) candidate set.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int = 512
) -> DataFrame:
    """Per-partition Misra-Gries summaries merged into one candidate
    frame ``(key_col, lower_bound)``.

    Each task keeps at most ``capacity`` counters, maintained with the
    MERGEABLE form of the MG step (Agarwal et al., "Mergeable
    Summaries"): each Arrow batch is counted exactly with a vectorized
    ``value_counts`` (no per-token Python loop), the batch counts are
    added into the running summary, and whenever the summary exceeds
    ``capacity`` keys, the (capacity+1)-th largest count is subtracted
    from every counter and non-positive keys are dropped. Each such
    offset-subtraction under-counts every key by the same amount, and
    the total subtracted weight is at most n_part/(capacity+1) — the
    classic MG bound — so summing per-partition counters under-counts
    globally by at most n/(capacity+1), and any key with true count
    above that bound is guaranteed to survive into the merged output.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > capacity:
                # (capacity+1)-th largest count — subtracting it from
                # every counter zeroes out at least the smallest
                # len-capacity keys, restoring the bound in one pass
                thresh = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - thresh for k, v in counters.items() if v > thresh
                }
        yield pd.DataFrame(
            {
                key_col: list(counters.keys()),
                "lower_bound": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    dt = dict(df.dtypes)[key_col]
    summaries = df.select(key_col).mapInPandas(
        mg, schema=f"{key_col} {dt}, lower_bound bigint"
    )
    return summaries.groupBy(key_col).agg(
        F.sum("lower_bound").alias("lower_bound")
    )


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int = 512,
    count_name: str = "cnt",
) -> DataFrame:
    """Exact global top-``k`` keys by frequency with O(capacity)
    memory per task (module docstring has the two-pass design and the
    exactness condition). Deterministic tie-break: count DESC, key ASC.
    """
    candidates = misra_gries_candidates(df, key_col, capacity).select(key_col)
    exact = (
        df.join(F.broadcast(candidates), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_name))
    )
    return exact.orderBy(F.col(count_name).desc(), F.col(key_col).asc()).limit(k)


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    sketch_col: str = "hll",
) -> DataFrame:
    """Pre-aggregated distinct-count SKETCH table: one DataSketches
    HLL binary per group (e.g. per (source, day)). The point over a
    plain COUNT(DISTINCT) rollup: distinct counts are NOT additive —
    a daily count rollup cannot answer "distinct users last 30 days"
    — but HLL sketches union losslessly, so the rollup table answers
    distinct-count questions over ANY later grouping/range without
    re-touching raw data. THE pattern for 100 TB monitoring: raw
    events are scanned once at ingest; every dashboard range query
    reads |days × groups| kilobyte sketches."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(distinct_col).alias(sketch_col)
    )


def hll_estimate_over(
    rollup: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate a sketch rollup to a coarser grouping: union the
    per-bucket sketches (hll_union_agg — register-wise max over the
    HLL state) and estimate. Any subset of the rollup's buckets can
    be filtered first (a date range, a source list); the unioned
    estimate carries the same error guarantee as sketching the
    matching raw rows directly (not bit-identical — DataSketches
    sparse-mode sketches change representation on merge)."""
    return rollup.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("bigint")
        .alias(out_col)
    )


def hll_overlap(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    group_a,
    group_b,
) -> dict:
    """Estimate the distinct-value OVERLAP between two groups from
    sketches alone: |A∩B| ≈ |A| + |B| − |A∪B| (inclusion–exclusion
    over HLL estimates; the union comes from hll_union_agg, never
    from re-scanning raw data). Returns
    {a, b, union, intersection, jaccard} as floats.

    Error note: the intersection inherits the ADDITIVE error of three
    estimates, so its RELATIVE error blows up when the true overlap
    is small compared to either set — fine for "how much do these two
    sources' user bases overlap", wrong for needle-sized
    intersections (use an exact semi-join for those)."""
    sk = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(group_col)
        .agg(F.hll_sketch_agg(distinct_col).alias("hll"))
    )
    per_group = {
        r[group_col]: r["est"]
        for r in sk.select(
            group_col, F.hll_sketch_estimate("hll").alias("est")
        ).collect()
    }
    union = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("u")
    ).first()["u"]
    a, b = float(per_group.get(group_a, 0)), float(per_group.get(group_b, 0))
    inter = max(0.0, a + b - float(union))
    return {
        "a": a,
        "b": b,
        "union": float(union),
        "intersection": inter,
        "jaccard": inter / union if union else 0.0,
    }


def _cms_hash(key: Column, row: int, width: int) -> Column:
    """Row-``row`` count-min hash of ``key`` into [0, width): the
    first 60 bits of md5 over a row-salted key, mod width. md5 (not
    xxhash64) so the oracle reproduces it bit-for-bit in DuckDB:
    ``('0x' || substr(md5(row || ':' || key), 1, 15))::UBIGINT %
    width`` — same prefix, same radix, same result."""
    digest = F.md5(F.concat(F.lit(f"{row}:"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    count_name: str = "cnt",
) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequency distribution as a
    ``(row, bucket, cnt)`` frame of at most ``depth × width`` rows —
    kilobytes, regardless of input size or key cardinality.

    The third classic sketch beside Misra-Gries (heavy_hitters_exact)
    and HLL (hll_rollup), answering the question those don't:
    "approximately how often does THIS key occur?" for ANY key, not
    just the heavy ones, without a distinct-key-cardinality shuffle.

    Implementation is pure Column expressions: each input row explodes
    into ``depth`` (row, bucket) cells (a narrow ×depth fan-out) and
    one hash-aggregate counts cells — map-side partial aggregation
    collapses each task to ≤ depth × width rows before the exchange,
    so the shuffle volume is O(tasks × depth × width) no matter how
    many input rows or distinct keys. Estimates from ``cms_query``
    are one-sided: est ≥ true always; est ≤ true + εN with
    probability ≥ 1 − (1/2)^depth per key, where ε ≈ e/width and N is
    the total (weighted) row count.

    Sketches with the same (width, depth) MERGE by union + sum
    (``cms_merge``) — build per day/source, combine at query time,
    exactly like hll_rollup's union re-aggregation.
    """
    key = F.col(key_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_hash(key, d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.filter(key.isNotNull())
        .select(cells)
        .groupBy(
            F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias(count_name))
    )


def cms_merge(*sketches: DataFrame, count_name: str = "cnt") -> DataFrame:
    """Combine count-min sketches built with the SAME (width, depth):
    cell-wise sum via union + one hash-agg over ≤ depth × width keys.
    Exact (counts are additive), so build-per-batch + merge equals
    building over the concatenated input."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum(count_name).alias(count_name)
    )


def cms_inner_product(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int,
    count_name: str = "cnt",
    est_col: str = "est",
) -> DataFrame:
    """Join-CARDINALITY estimate from two count-min sketches built
    with the SAME (width, depth, hash family): per depth row the
    bucket-wise inner product Σ_b cntA[d,b]·cntB[d,b], minimized
    over the rows — the classic AMS/CMS estimator for
    |A ⋈ B on k| = Σ_k cA(k)·cB(k). One-sided like the point
    estimate: est ≥ true ALWAYS (collisions only add non-negative
    cross terms); est ≤ true + ε·Nₐ·N_b with probability
    ≥ 1 − 2^−depth (ε ≈ e/width). Passing the SAME sketch twice
    estimates the self-join size Σ_k c(k)² — the second frequency
    moment F2, i.e. the candidate-pair count a key-equality
    self-join would emit: the skew pre-check to run BEFORE a dedup
    blocking join or any large self-join, for the price of one
    sketch scan instead of the join.

    Returns a single-row frame (``est_col`` BIGINT). Scale design
    (100 TB): both operands are ≤ depth × width cells REGARDLESS of
    input size, and they merge (cms_merge), so per-day sketches
    built at ingest answer join-size questions about any date range
    without touching raw data; the cell join here is
    kilobytes-by-kilobytes. A depth row with NO shared buckets has
    inner product 0 and would vanish from the join — the
    range(depth) left join keeps it so the min correctly reads 0
    for disjoint key sets."""
    a = sketch_a.select("row", "bucket", F.col(count_name).alias("__ca"))
    b = sketch_b.select("row", "bucket", F.col(count_name).alias("__cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    rows = sketch_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("row")
    )
    return rows.join(per_row, "row", "left").agg(
        F.min(F.coalesce(F.col("__ip"), F.lit(0)))
        .cast("bigint")
        .alias(est_col)
    )


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int,
    depth: int,
    est_col: str = "est",
    count_name: str = "cnt",
) -> DataFrame:
    """Point-estimate frequencies for EVERY row of ``keys`` (extra
    columns pass through, duplicate rows each get their own estimate):
    probe the ``depth`` cells of each key and take the MIN — the
    count-min estimator. The sketch side is tiny (≤ depth × width
    rows) and broadcast, so querying any number of keys is one
    broadcast join, no shuffle of the sketch. Keys absent from the
    input estimate as ≥ 0 (0 when their cells are empty)."""
    # ADVICE r7: tag each input row so (a) duplicate key rows don't
    # collapse in the regroup and (b) the probe columns can't collide
    # with caller columns named "row"/"bucket"
    tag, rowc, bukc, cntc = "__cms_tag", "__cms_row", "__cms_bucket", "__cms_cnt"
    for reserved in (tag, rowc, bukc, cntc):
        if reserved in keys.columns:
            raise ValueError(f"keys column {reserved!r} is reserved by cms_query")
    key = F.col(key_col)
    tagged = keys.withColumn(tag, F.monotonically_increasing_id())
    probes = tagged.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_hash(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(
        *tagged.columns,
        F.col("cell.row").alias(rowc),
        F.col("cell.bucket").alias(bukc),
    )
    sketch_probe = sketch.select(
        F.col("row").alias(rowc),
        F.col("bucket").alias(bukc),
        F.col(count_name).alias(cntc),
    )
    joined = probes.join(F.broadcast(sketch_probe), [rowc, bukc], "left")
    return (
        joined.groupBy(tag, *keys.columns)
        .agg(
            F.min(F.coalesce(F.col(cntc), F.lit(0))).cast("bigint").alias(est_col)
        )
        .drop(tag)
    )


def sketch_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    value_col: str,
    hll_rel_err: float = 0.15,
    quantile_eps: float = 0.02,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """One-pass grouped profile: exact COUNT(DISTINCT) and exact
    median next to their sketch estimates (HLL++, approx_percentile),
    plus per-group guarantee flags:

    - ``hll_ok``: |HLL estimate − exact| / exact ≤ ``hll_rel_err``
      (default 0.15 = 3× the default HLL rsd of 0.05);
    - ``pq_ok``: the approx median lies between the exact
      (0.5−eps)- and (0.5+eps)-quantiles — rank-space tolerance, the
      form of approx_percentile's actual guarantee (rank error ≤
      n/accuracy, far inside eps=0.02 for any group over ~100 rows).

    Output: group_cols + (n_distinct, hll_ok, p50, pq_ok); the exact
    columns are what the oracle recomputes, the flags are how the
    sketches get hash-checked (oracle side emits literal TRUE).
    """
    gcols = [F.col(c) for c in group_cols]
    probs = [0.5 - quantile_eps, 0.5, 0.5 + quantile_eps]
    agg = df.groupBy(*gcols).agg(
        F.countDistinct(distinct_col).alias("n_distinct"),
        F.approx_count_distinct(distinct_col).alias("__hll"),
        F.expr(f"percentile({value_col}, 0.5)").alias("__p50_exact"),
        F.expr(f"percentile({value_col}, {probs[0]})").alias("__p_lo"),
        F.expr(f"percentile({value_col}, {probs[2]})").alias("__p_hi"),
        F.expr(f"approx_percentile({value_col}, 0.5, {approx_accuracy})").alias(
            "__pq"
        ),
    )
    return agg.select(
        *group_cols,
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        (
            F.abs(F.col("__hll") - F.col("n_distinct"))
            <= F.lit(hll_rel_err) * F.col("n_distinct")
        ).alias("hll_ok"),
        F.round("__p50_exact", 4).alias("p50"),
        (
            (F.col("__pq") >= F.col("__p_lo")) & (F.col("__pq") <= F.col("__p_hi"))
        ).alias("pq_ok"),
    )


# ---------------------------------------------------------------- KLL


def _kll_compact(levels: list[list[float]], k: int) -> None:
    """Deterministic KLL compaction in place: whenever a level holds
    more than ``k`` items, sort it and promote the EVEN-index items to
    the next level (each promoted item's implicit weight doubles),
    discarding the odd ones. The randomized original flips a coin for
    even/odd; fixing it keeps the sketch reproducible for a given
    input order at ~the same rank-error envelope (each compaction
    shifts any rank by at most 2^level/2 · #compactions — the classic
    O(log(n/k)/k) uniform-capacity bound)."""
    i = 0
    while i < len(levels):
        if len(levels[i]) > k:
            levels[i].sort()
            promoted = levels[i][0::2]
            levels[i] = []
            if i + 1 == len(levels):
                levels.append([])
            levels[i + 1].extend(promoted)
        i += 1


def kll_partition_sketches(
    df: DataFrame, value_col: str, k: int = 200
) -> DataFrame:
    """Phase 1 of mergeable quantile sketching — the fourth classic
    sketch beside Misra-Gries, HLL, and count-min: each task folds its
    rows into a KLL summary (levels of ≤ k samples, level i weighing
    2^i) and emits it as (level, value) rows — O(k·log(n_part/k))
    rows per task regardless of partition size. NULLs are skipped.

    Use kll_quantiles for the one-shot build→merge→query path, or
    merge the emitted rows yourself (they are just weighted samples:
    concatenate per level and re-compact — associative, so daily
    sketches tree-merge into monthly ones without touching raw data).
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: list[list[float]] = [[]]
        for pdf in batches:
            vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
            # bulk insert per Arrow batch, then cascade-compact: fewer
            # compactions than item-at-a-time (strictly less discarded
            # weight), and the hot path stays vectorized
            levels[0].extend(float(v) for v in vals.to_numpy())
            _kll_compact(levels, k)
        _kll_compact(levels, k)
        out_lv, out_v = [], []
        for lv, items in enumerate(levels):
            out_lv.extend([lv] * len(items))
            out_v.extend(items)
        yield pd.DataFrame(
            {"level": pd.Series(out_lv, dtype="int32"),
             "value": pd.Series(out_v, dtype="float64")}
        )

    return df.select(value_col).mapInPandas(build, schema="level int, value double")


def kll_quantiles(
    df: DataFrame, value_col: str, qs: Sequence[float], k: int = 200
) -> dict[float, float]:
    """Mergeable quantile estimates: build per-partition KLL sketches
    distributed (one corpus pass), collect the bounded sketch rows
    (≤ partitions · k · log levels — driver-tiny), merge them with
    the same deterministic compaction, and answer each quantile from
    the weighted sample (smallest value whose cumulative weight
    reaches q·W). Rank error is O(log(n/k)/k) — k=200 keeps the
    estimate within ~1-2 rank-percent at any n that fits a cluster;
    the corpus entry checks exactly that invariant against the true
    rank."""
    rows = kll_partition_sketches(df, value_col, k).collect()
    levels: list[list[float]] = []
    for r in rows:
        lv = r["level"]
        while len(levels) <= lv:
            levels.append([])
        levels[lv].append(r["value"])
    _kll_compact(levels, k)
    weighted = [
        (v, 1 << lv) for lv, items in enumerate(levels) for v in items
    ]
    if not weighted:
        return {float(q): None for q in qs}
    weighted.sort()
    total = sum(w for _, w in weighted)
    out: dict[float, float] = {}
    for q in qs:
        target = q * total
        acc = 0
        est = weighted[-1][0]
        for v, w in weighted:
            acc += w
            if acc >= target:
                est = v
                break
        out[float(q)] = est
    return out
