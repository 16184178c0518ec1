"""Idempotent merge-upsert over a parquet zone (ROADMAP 3).

The reference's lakehouse is append-only (BigQuery WRITE_APPEND,
healthcare_etl_pipeline.py:300-348): a replayed Pub/Sub batch or a
re-run Dataflow job duplicates rows. This writer gives the processed
zone Delta-MERGE-like semantics with plain parquet: latest version
per entity key wins, and replaying ANY batch converges to the same
table.

How it stays bounded at 100 TB:
- only the date partitions present in the incoming batch are read
  back (partition-pruned scan) and rewritten
  (``partitionOverwriteMode=dynamic`` — untouched history is never
  opened);
- the per-key reduction is one hash-aggregate: max_by of the payload
  struct over a lexicographic (version, orderable columns) ordering —
  map-side partials collapse intra-batch duplicates before the
  shuffle, the same technique as operators/joins.asof_select_min_by;
- ``localCheckpoint`` materializes the merged result before the
  overwrite so the plan does not read the path it is replacing (file
  sources refuse self-overwrites otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort/compare this type (maps cannot)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def merge_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str = "processed_at",
    partition_col: str | None = "event_date",
) -> int:
    """Upsert ``incoming`` into the parquet table at ``path``.

    For each ``key_cols`` group the row with the greatest
    (``version_col``, remaining columns) wins — deterministic even on
    version ties. Returns the number of rows written (rows in the
    touched partitions after the merge).
    """
    touched = None
    if partition_col is not None:
        touched = [
            r[0] for r in incoming.select(partition_col).distinct().collect()
        ]

    # Only a MISSING table means "first write". Anything else raised by
    # the read (transient FS failure, corrupt footer, permissions) must
    # propagate: treating it as first-write would make the dynamic
    # overwrite below silently replace existing partitions with just
    # the incoming batch.
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(hpath):
        existing = spark.read.parquet(path)
        if touched is not None:
            vals = [v for v in touched if v is not None]
            cond = F.col(partition_col).isin(vals)
            if any(v is None for v in touched):
                # the incoming batch writes __HIVE_DEFAULT_PARTITION__,
                # so prior NULL-partition rows must join the merge or
                # the dynamic overwrite would drop them
                cond = cond | F.col(partition_col).isNull()
            existing = existing.filter(cond)
        # align column order for unionByName
        both = existing.unionByName(incoming, allowMissingColumns=True)
    else:  # first write: nothing to merge
        both = incoming

    value_cols = [c for c in both.columns if c not in key_cols]
    ordered = [version_col] + [c for c in value_cols if c != version_col]
    # the WINNING row can carry any type (max_by value), but the
    # ORDERING must be orderable — maps (e.g. ehr lab_results) are
    # not, so the deterministic tie-break uses version + the orderable
    # value columns only
    schema = {f.name: f.dataType for f in both.schema.fields}
    order_cols = [c for c in ordered if _orderable(schema[c])]
    packed = F.struct(*[F.col(c).alias(c) for c in ordered])
    ordering = F.struct(*[F.col(c).alias(c) for c in order_cols])
    merged = (
        both.groupBy(*key_cols)
        .agg(F.max_by(packed, ordering).alias("__row"))
        .select(*key_cols, *[F.col(f"__row.{c}").alias(c) for c in ordered])
        .select(*both.columns)  # original column order
    )
    # cut lineage: the overwrite below must not re-read `path`
    merged = merged.localCheckpoint(eager=True)
    n = merged.count()

    writer = merged.write.mode("overwrite")
    if partition_col is not None:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            writer.partitionBy(partition_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        writer.parquet(path)
    return n
