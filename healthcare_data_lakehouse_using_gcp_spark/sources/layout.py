"""Physical data layout for scan pruning — the cheapest 100 TB query
is the one that never reads the bytes.

Three pruning levers, from coarsest to finest:
- hive partitioning (``partition_cols``) prunes DIRECTORIES on
  partition predicates (readers.write_zone already uses it for
  event_date);
- range-partitioned + sorted writes (``write_range_sorted``) make
  parquet footer min/max statistics TIGHT and NON-OVERLAPPING across
  files, so range/point predicates on the sort column prune whole
  FILES and ROW GROUPS at planning/scan time — without this, every
  file's [min, max] spans the whole domain and stats prune nothing;
- bucketing (lakehouse.write_bucketed_table) hash-clusters join keys
  so co-bucketed joins skip the shuffle.

The audit half (``file_column_ranges`` / ``row_group_ranges`` /
``prunable_fraction``) reads parquet FOOTERS only (no data pages) and
quantifies what a predicate can skip — the measurable counterpart of
"is the filter pushed down": pushdown without tight stats still reads
everything.

Reference parity note: the reference delegates layout entirely to
BigQuery (clustered tables); this module is the explicit Spark-side
equivalent (cluster-by ≈ range-sort, partition ≈ hive partition).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, functions as F


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted on ``sort_cols``.

    repartitionByRange samples the sort-key distribution and assigns
    each output file a disjoint key range (skew-resistant: ranges are
    quantile-based, not fixed-width); sortWithinPartitions then orders
    rows inside each file so EVERY row group's min/max is tight. One
    extra range shuffle at write time buys stats-based file and
    row-group pruning on every subsequent scan — the right trade
    whenever data is written once and scanned many times.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *[F.col(c) for c in sort_cols]).sortWithinPartitions(
        *sort_cols
    )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def _column_chunk_stats(rg_meta, column: str):
    for i in range(rg_meta.num_columns):
        col = rg_meta.column(i)
        if col.path_in_schema == column:
            st = col.statistics
            if st is not None and st.has_min_max:
                return st.min, st.max
            return None
    return None


def _parquet_files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.getsize(f) > 0
    )


def row_group_ranges(path: str, column: str) -> list[tuple[str, int, object, object]]:
    """(file, row_group_index, min, max) for every row group, straight
    from the parquet footers — no data pages read."""
    import pyarrow.parquet as pq

    out = []
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            stats = _column_chunk_stats(md.row_group(rg), column)
            if stats is not None:
                out.append((f, rg, stats[0], stats[1]))
    return out


def file_column_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) per file (row-group stats folded)."""
    by_file: dict[str, list] = {}
    for f, _rg, mn, mx in row_group_ranges(path, column):
        by_file.setdefault(f, []).append((mn, mx))
    return [
        (f, min(mn for mn, _ in v), max(mx for _, mx in v))
        for f, v in sorted(by_file.items())
    ]


def ranges_overlap_count(ranges: list[tuple[str, object, object]]) -> int:
    """Number of overlapping (file, file) range pairs — 0 for a
    perfect range-sorted layout, O(n²/2) for an unsorted one."""
    n = 0
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            _, amn, amx = ranges[i]
            _, bmn, bmx = ranges[j]
            if amn <= bmx and bmn <= amx:
                n += 1
    return n


def prunable_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups a ``column BETWEEN lo AND hi`` predicate
    can skip on stats alone — what the scan saves before reading any
    data page. 0.0 when stats are useless, → 1.0 for a narrow
    predicate over a range-sorted layout."""
    rgs = row_group_ranges(path, column)
    if not rgs:
        return 0.0
    skipped = sum(1 for _f, _rg, mn, mx in rgs if mx < lo or mn > hi)
    return skipped / len(rgs)
