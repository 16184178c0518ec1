"""Dataset export: the last stage of a training-data pipeline —
assign stable contiguous example ids and write fixed-size shards a
data loader can stream.

Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star): the reference ends at BigQuery tables; a pretraining pipeline
ends at numbered shards.

Scale design — the trap here is the obvious plan: a global
ROW_NUMBER() over one unpartitioned window serializes 100 TB through
ONE reducer. ``assign_contiguous_ids`` does the classic two-phase
assignment instead: number rows locally per partition, collect only
the per-partition COUNTS (one tiny driver round — |partitions|
longs), prefix-sum them, and add the broadcast offset back. No
single-reducer bottleneck anywhere: the per-partition numbering is
one PARALLEL hash exchange on partition id (one task per pid), plus
one range shuffle when a global ``order_by`` is requested
(quantile-based, skew-resistant — the same mechanism as
sources/layout.write_range_sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_contiguous_ids(
    df: DataFrame,
    id_name: str = "example_id",
    order_by: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based contiguous BIGINT id column (exactly 0..n-1).

    With ``order_by``, ids follow the global order of those columns
    (range-repartition + local sort first); without it, ids follow
    the existing partition layout (cheapest — zero shuffle).

    monotonically_increasing_id cannot do this (its ids have gaps per
    partition); a single global window cannot do it at scale (one
    reducer). Two phases: per-partition row_number minus one, plus a
    driver-side prefix sum of per-partition counts broadcast back.
    The count collection is the only driver data: |partitions| rows.
    """
    if order_by:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, *[F.col(c) for c in order_by]).sortWithinPartitions(
            *order_by
        )
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    # cache the pid frame: partition assignment must be IDENTICAL
    # between the count pass and the numbering pass (round-robin /
    # non-deterministic upstream repartitions could otherwise move
    # rows between passes and break contiguity)
    with_pid = with_pid.localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["c"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("__pid"),
    )
    order = [F.col(c) for c in order_by] if order_by else [F.lit(1)]
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        with_pid.withColumn(
            id_name,
            (offset_col + F.row_number().over(w) - 1).cast("bigint"),
        )
        .drop("__pid")
    )


def shuffle_for_training(
    df: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    id_name: str = "example_id",
) -> DataFrame:
    """Deterministic GLOBAL shuffle for training order: contiguous
    example ids that follow md5(seed, id) — i.e. a reproducible
    random permutation of the corpus. Every epoch/run/engine that
    uses the same seed sees the identical order (orderBy(rand()) does
    not survive re-runs or partition changes); a new seed is a fresh
    permutation for the next epoch.

    Plan: the shuffle key is a narrow scan-stage expression; ordering
    + numbering ride assign_contiguous_ids' range-repartition +
    per-partition prefix-sum (no single-reducer global sort). Compose
    with write_training_shards(order_by=[key]) to land shuffled
    shards directly."""
    key = F.md5(F.concat_ws("§", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = assign_contiguous_ids(
        df.withColumn("__shuffle_key", key),
        id_name,
        order_by=["__shuffle_key", id_col],
    )
    return out.drop("__shuffle_key")


def write_training_shards(
    df: DataFrame,
    path: str,
    examples_per_shard: int,
    order_by: list[str] | None = None,
    shard_col: str = "shard_id",
) -> int:
    """Write ``df`` as numbered fixed-size shards: every shard holds
    exactly ``examples_per_shard`` examples (the last may be short),
    laid out as ``path/shard_id=K/`` with ONE file per shard — the
    unit a training loader streams, checkpoints, and shuffles at.

    Composition: assign_contiguous_ids → shard_id = id // size →
    repartition by shard (each shard's rows converge to one task →
    one file) → hive-partitioned write. Returns the shard count.

    Sizing note: pick examples_per_shard so a shard is O(100 MB-1 GB)
    serialized; the repartition is hash-on-shard_id, so shards spread
    evenly over the cluster regardless of source skew."""
    ids = assign_contiguous_ids(df, "__example_id", order_by)
    # integer DIV, not float division: float /-then-cast truncates via
    # a double and is only exact below 2^53 ids; DIV is exact bigint
    # floor division at any scale
    sharded = ids.withColumn(
        shard_col, F.expr(f"__example_id DIV {int(examples_per_shard)}")
    )
    n_shards = sharded.agg(F.countDistinct(shard_col)).first()[0] or 0
    (
        sharded.repartition(max(int(n_shards), 1), shard_col)
        # intra-shard order follows the id assignment (hence order_by
        # when given) — loaders reading a shard file see sorted rows
        .sortWithinPartitions("__example_id")
        .drop("__example_id")
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
    return int(n_shards)
