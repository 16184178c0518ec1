"""Physical data layout for scan pruning — the cheapest 100 TB query
is the one that never reads the bytes.

Four pruning levers, from coarsest to finest:
- hive partitioning (``partition_cols``) prunes DIRECTORIES on
  partition predicates (readers.write_zone already uses it for
  event_date);
- range-partitioned + sorted writes (``write_range_sorted``) make
  parquet footer min/max statistics TIGHT and NON-OVERLAPPING across
  files, so range/point predicates on the sort column prune whole
  FILES and ROW GROUPS at planning/scan time — without this, every
  file's [min, max] spans the whole domain and stats prune nothing;
- Z-order clustering (``write_zorder``) trades the single perfect
  sort dimension for USEFUL stats on SEVERAL dimensions at once:
  rows are sorted by the bit-interleaving of their (quantized)
  column values, so spatially-near rows co-locate and every file's
  per-column [min, max] covers only a sub-rectangle of the domain —
  predicates on ANY of the clustered columns prune, where a linear
  sort prunes only its leading column;
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


def _quantize_cols(
    df: DataFrame, cols: list[str], bits: int, quantize: str
) -> list:
    """Map each numeric column onto [0, 2^bits) long buckets — the
    shared quantization front of the Z-order and Hilbert layouts
    (semantics documented on ``zorder_layout``: "minmax" = linear
    scale, one 2-scalar driver agg per column; "quantile" =
    equal-population buckets from approxQuantile cutpoints, bits
    capped at 8). NULLs quantize to bucket 0."""
    if quantize not in ("minmax", "quantile"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if quantize == "quantile" and bits > 8:
        raise ValueError("quantile mode caps bits at 8 (2^bits comparisons/row)")
    top = (1 << bits) - 1
    scaled = []
    if quantize == "quantile":
        probs = [i / (top + 1) for i in range(1, top + 1)]
        for c in cols:
            cuts = df.stat.approxQuantile(c, probs, 0.001)
            arr = F.array(*[F.lit(float(x)) for x in cuts])
            q = F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, cut: acc
                + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
            )
            scaled.append(F.coalesce(q, F.lit(0).cast("long")))
    else:
        stats = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in cols],
            *[F.max(c).alias(f"mx_{c}") for c in cols],
        ).first()
        for c in cols:
            mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
            span = (mx - mn) if (mn is not None and mx is not None) else 0
            if not span:
                scaled.append(F.lit(0).cast("long"))
                continue
            q = F.floor(
                (F.coalesce(F.col(c), F.lit(mn)) - F.lit(mn)) * top / F.lit(span)
            ).cast("long")
            scaled.append(F.least(F.lit(top), F.greatest(F.lit(0), q)))
    return scaled


def zorder_value(
    scaled_cols: list, bits: int, out_name: str = "__z"
):
    """Bit-interleave already-quantized long columns (each in
    [0, 2^bits)) into one Z-value Column. Pure shift/mask expressions
    — JVM-side, whole-stage-codegen'd; ``bits × len(cols)`` must fit
    a signed long (≤ 62)."""
    ncols = len(scaled_cols)
    if bits * ncols > 62:
        raise ValueError(f"bits*cols = {bits * ncols} exceeds long range")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z.alias(out_name)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    quantize: str = "minmax",
) -> DataFrame:
    """``df`` re-laid-out along the Z-order curve on numeric ``cols``
    (repartitionByRange + in-partition sort on the interleaved
    Z-value) — the clustering half of ``write_zorder``, exposed so
    other writers (snapshot-table compaction) can commit a Z-ordered
    layout through their own transactional path. Cast dates to epoch
    days/seconds first.

    Quantization maps each column onto [0, 2^bits) before the bits
    interleave:
    - ``"minmax"`` (default): linear scale between the column's min
      and max — one tiny driver agg (2 scalars per column), exact
      monotone map. Right for roughly uniform columns; a heavy-tailed
      column collapses most rows into a few low buckets and its
      pruning evaporates.
    - ``"quantile"``: scale by approximate quantile rank instead —
      2^bits−1 sketch cutpoints per column (one approxQuantile pass),
      bucket = #cutpoints ≤ value via an aggregate() over the
      broadcast cutpoint array literal. Equal-POPULATION buckets
      regardless of skew, so per-file rectangles stay tight on any
      distribution; costs ~2^bits comparisons per row, so bits is
      capped at 8 in this mode (256 buckets per dim — plenty: the
      curve only needs as many distinct cells as files).

    The scaled values are bit-interleaved into a Z-value;
    repartitionByRange + sortWithinPartitions on that value lays rows
    out along the space-filling curve. NULLs quantize to bucket 0
    (they cluster with the domain minimum — parquet null counts
    still prune them). The audit functions below show whether the
    resulting per-file rectangles came out tight.
    """
    scaled = _quantize_cols(df, cols, bits, quantize)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__z", zorder_value(scaled, bits))
        .repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    quantize: str = "minmax",
) -> None:
    """Write ``df`` Z-order-clustered on numeric ``cols`` (cast dates
    to epoch days/seconds first) — ``zorder_layout`` + an overwrite
    parquet write. The audit functions below show whether the
    resulting per-file rectangles came out tight.
    """
    zorder_layout(df, cols, bits, num_files, quantize).write.mode(
        "overwrite"
    ).parquet(path)


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


def compact_parquet_dir(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction — the lakehouse maintenance job that
    keeps append-heavy zones scannable. Streaming/micro-batch appends
    (lakehouse raw/processed zones) accrete thousands of KB-sized
    files; at 100 TB each scan then pays per-file open/footer/seek
    costs that dwarf the data read, and the driver's file index
    itself becomes a bottleneck.

    Bin-packs the directory into ``ceil(total_bytes/target_bytes)``
    output files. Without ``sort_cols`` the rewrite uses
    ``coalesce`` — a NARROW merge of adjacent input splits, no
    shuffle at all; with ``sort_cols`` it re-runs the
    ``write_range_sorted`` layout (one range shuffle) so compaction
    simultaneously restores stats-pruning tightness.

    Swap protocol: the compacted copy is FULLY written to a sibling
    ``.__compact_tmp`` dir before the original is removed and the tmp
    renamed into place — a crash mid-swap leaves either the original
    or a complete tmp on disk, never a half-rewritten zone. (On a
    real object store you'd commit via manifest/metadata swap —
    Iceberg/Delta style — instead of a rename.)

    Returns (files_before, files_after); no-ops (and skips the
    rewrite) when the directory is already at or below the target
    file count.
    """
    import math
    import shutil

    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_out >= len(files):
        return (len(files), len(files))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    if sort_cols:
        write_range_sorted(df, tmp, sort_cols, num_files=n_out)
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return (len(files), len(_parquet_files(path)))


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


def _hilbert_automaton() -> dict:
    """Derive the 2-D Hilbert quadrant automaton FROM the textbook
    xy2d bit-rotation algorithm (Wikipedia "Hilbert curve", the
    standard public formulation), instead of hard-coding a table that
    could silently drift from it: states are distinct quadrant→digit
    maps discovered by walking a depth-4 quadtree of the reference
    implementation; transitions are the observed child maps. Returns
    {state: {(rx, ry): (digit, next_state)}} — asserts the automaton
    closes at exactly 4 states with a total deterministic transition
    function, so a derivation bug fails at import, not in data."""

    def xy2d(order: int, x: int, y: int) -> int:
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if x & s else 0
            ry = 1 if y & s else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    order = 4
    n = 1 << order
    maps: dict[tuple, dict] = {}
    for x in range(n):
        for y in range(n):
            d = xy2d(order, x, y)
            path: tuple = ()
            for lev in range(order - 1, -1, -1):
                q = ((x >> lev) & 1, (y >> lev) & 1)
                dig = (d >> (2 * lev)) & 3
                node = maps.setdefault(path, {})
                assert node.setdefault(q, dig) == dig, "xy2d inconsistent"
                path = path + (q,)
    sig: dict[tuple, int] = {}

    def state_of(path: tuple) -> int:
        key = tuple(sorted(maps[path].items()))
        return sig.setdefault(key, len(sig))

    table: dict[int, dict] = {}
    for path, m in maps.items():
        if len(path) >= order - 1:
            continue  # children are leaves without full maps
        s_id = state_of(path)
        row = table.setdefault(s_id, {})
        for q, dig in m.items():
            entry = (dig, state_of(path + (q,)))
            assert row.setdefault(q, entry) == entry, "nondeterministic"
    assert len(table) == 4 and all(len(r) == 4 for r in table.values()), (
        "Hilbert automaton did not close at 4 total states"
    )
    return table


_HILBERT_TABLE = _hilbert_automaton()


def hilbert_value(scaled_x, scaled_y, bits: int, out_name: str = "__h"):
    """2-D Hilbert index of two already-quantized long columns (each
    in [0, 2^bits)) — the space-filling curve with strictly better
    locality than Z-order: consecutive indices are always
    UNIT-adjacent cells (no Z-shaped jumps across the space), so
    per-file bounding rectangles come out tighter for the same file
    count. Evaluated as ONE ``aggregate()`` fold over the bit
    positions with the 4-state quadrant automaton (derived at import
    from the textbook algorithm, above) as a literal when-chain —
    constant expression size per step, pure JVM, no UDF. 2·bits must
    fit a signed long (≤ 62 → bits ≤ 31; practical layouts use
    8-16)."""
    if bits < 1 or bits > 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xcol = scaled_x.cast("long")
    ycol = scaled_y.cast("long")

    def step(acc, i):
        p = F.pow(F.lit(2.0), i.cast("double"))
        rx = F.floor(xcol.cast("double") / p).cast("long") % 2
        ry = F.floor(ycol.cast("double") / p).cast("long") % 2
        dchain = None
        schain = None
        for st, row in _HILBERT_TABLE.items():
            for (qx, qy), (dig, ns) in row.items():
                cond = (
                    (acc["s"] == st) & (rx == qx) & (ry == qy)
                )
                dchain = (
                    F.when(cond, F.lit(dig))
                    if dchain is None
                    else dchain.when(cond, F.lit(dig))
                )
                schain = (
                    F.when(cond, F.lit(ns))
                    if schain is None
                    else schain.when(cond, F.lit(ns))
                )
        return F.struct(
            (acc["d"] * 4 + dchain.cast("long")).alias("d"),
            schain.cast("long").alias("s"),
        )

    seq = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    acc0 = F.struct(
        F.lit(0).cast("long").alias("d"), F.lit(0).cast("long").alias("s")
    )
    return F.aggregate(seq, acc0, step, lambda a: a["d"]).alias(out_name)


def hilbert_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    quantize: str = "minmax",
) -> DataFrame:
    """``df`` re-laid-out along the 2-D HILBERT curve on numeric
    ``cols`` — the drop-in alternative to ``zorder_layout`` when the
    clustered dimensions are exactly two (the common case: key ×
    time, key × value). Same quantization modes and write path as
    Z-order; the difference is the curve: Hilbert's unit-step
    adjacency avoids Z-order's quadrant-jump seams, so file bounding
    boxes are tighter and stats pruning strictly no worse (typically
    better on the seam-crossing query bands). For d > 2 clustered
    columns use ``zorder_layout`` — the bit-interleave generalizes,
    the automaton here is the 2-D one."""
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_layout clusters exactly 2 columns, got {len(cols)} "
            "— use zorder_layout for other dimensionalities"
        )
    scaled = _quantize_cols(df, cols, bits, quantize)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__h", hilbert_value(scaled[0], scaled[1], bits))
        .repartitionByRange(n, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__h")
    )


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    quantize: str = "minmax",
) -> None:
    """Write ``df`` Hilbert-clustered on two numeric ``cols`` —
    ``hilbert_layout`` + an overwrite parquet write."""
    hilbert_layout(df, cols, bits, num_files, quantize).write.mode(
        "overwrite"
    ).parquet(path)
