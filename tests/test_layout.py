"""Physical-layout pruning tests (sources/layout): range-sorted
writes must produce non-overlapping per-file stats so predicates can
prune files/row groups from footers alone — the write-once/scan-many
lever a 100 TB table lives or dies by."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.sources import layout


@pytest.fixture()
def shuffled(spark):
    # keys arrive in hash-scrambled order — the realistic ingest case
    # where a naive write leaves every file spanning the whole domain
    return (
        spark.range(20_000)
        .select(
            F.xxhash64("id").alias("scramble"),
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .repartition(8, "scramble")
        .drop("scramble")
    )


def test_range_sorted_write_prunes_unsorted_does_not(shuffled, tmp_path):
    sorted_path = str(tmp_path / "sorted")
    naive_path = str(tmp_path / "naive")
    layout.write_range_sorted(shuffled, sorted_path, ["k"], num_files=8)
    shuffled.write.mode("overwrite").parquet(naive_path)

    sorted_ranges = layout.file_column_ranges(sorted_path, "k")
    naive_ranges = layout.file_column_ranges(naive_path, "k")
    assert len(sorted_ranges) >= 4
    # range partitioning: file key ranges are pairwise disjoint
    assert layout.ranges_overlap_count(sorted_ranges) == 0
    # the hash-scrambled naive write: (almost) every pair overlaps
    n = len(naive_ranges)
    assert layout.ranges_overlap_count(naive_ranges) == n * (n - 1) // 2

    # a narrow predicate prunes nearly everything on the sorted layout
    # and nothing on the naive one — measured from footers only
    assert layout.prunable_fraction(sorted_path, "k", 100, 200) >= 0.75
    assert layout.prunable_fraction(naive_path, "k", 100, 200) == 0.0

    # layout must not change content
    back = shuffled.sparkSession.read.parquet(sorted_path)
    assert back.count() == 20_000
    assert back.agg(F.sum("k")).first()[0] == sum(range(20_000))


def test_range_sorted_spark_scan_skips_files(shuffled, tmp_path, spark):
    """End-to-end: Spark's own scan over the sorted layout reports the
    pushed filter, and the filtered read returns exactly the predicate
    rows (correctness of the layout path, not just the stats)."""
    path = str(tmp_path / "sorted2")
    layout.write_range_sorted(shuffled, path, ["k"], num_files=8)
    scan = spark.read.parquet(path).filter((F.col("k") >= 100) & (F.col("k") <= 200))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(k,100)" in plan
    assert scan.count() == 101


@pytest.fixture()
def grid(spark):
    # 128×128 grid in hash-scrambled arrival order: two independent
    # dimensions, the shape Z-ordering exists for
    return (
        spark.range(16_384)
        .select(
            F.xxhash64("id").alias("scramble"),
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
        )
        .repartition(8, "scramble")
        .drop("scramble")
    )


def test_zorder_prunes_both_dimensions_linear_sort_only_one(grid, tmp_path, spark):
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    layout.write_zorder(grid, z_path, ["x", "y"], bits=7, num_files=16)
    layout.write_range_sorted(grid, lin_path, ["x"], num_files=16)

    # narrow band on each dimension (1/8 of the domain)
    zx = layout.prunable_fraction(z_path, "x", 0, 15)
    zy = layout.prunable_fraction(z_path, "y", 0, 15)
    lx = layout.prunable_fraction(lin_path, "x", 0, 15)
    ly = layout.prunable_fraction(lin_path, "y", 0, 15)
    # linear sort: near-perfect on its sort column, useless on the other
    assert lx >= 0.8
    assert ly == 0.0
    # z-order: substantial pruning on BOTH dimensions
    assert zx >= 0.5, f"z-order x pruning only {zx:.2%}"
    assert zy >= 0.5, f"z-order y pruning only {zy:.2%}"

    # layout must not change content
    back = spark.read.parquet(z_path)
    assert back.count() == 16_384
    assert back.agg(F.sum("x"), F.sum("y")).first() == grid.agg(
        F.sum("x"), F.sum("y")
    ).first()


def test_zorder_value_interleaves_bits(spark):
    # (x=0b101, y=0b011) with 3 bits → z = y2x2 y1x1 y0x0 = 0b 01 11 01... ;
    # spelled per-bit: bit i of x lands at 2i, bit i of y at 2i+1
    row = spark.range(1).select(
        layout.zorder_value([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3)
    ).first()
    x, y = 0b101, 0b011
    expect = sum((((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)) for i in range(3))
    assert row[0] == expect


def test_compact_parquet_dir_bin_packs_and_preserves_content(grid, tmp_path, spark):
    path = str(tmp_path / "fragmented")
    grid.repartition(64).write.mode("overwrite").parquet(path)
    before_files = len(layout._parquet_files(path))
    assert before_files >= 64
    total = sum(
        __import__("os").path.getsize(f) for f in layout._parquet_files(path)
    )
    # target ≈ quarter of the data → expect ~4 output files
    before, after = layout.compact_parquet_dir(spark, path, target_bytes=total // 4 + 1)
    assert before == before_files
    assert 1 <= after <= 8
    back = spark.read.parquet(path)
    assert back.count() == 16_384
    assert back.agg(F.sum("x"), F.sum("y")).first() == grid.agg(
        F.sum("x"), F.sum("y")
    ).first()
    # target below current file sizes → nothing to gain, no-op
    b2, a2 = layout.compact_parquet_dir(spark, path, target_bytes=1)
    assert (b2, a2) == (after, after)


def test_compact_with_sort_restores_pruning(grid, tmp_path, spark):
    """Compaction with sort_cols simultaneously merges small files AND
    re-tightens footer stats — the combined maintenance pass."""
    path = str(tmp_path / "fragmented_sorted")
    grid.repartition(64).write.mode("overwrite").parquet(path)
    assert layout.prunable_fraction(path, "x", 0, 15) == 0.0
    total = sum(
        __import__("os").path.getsize(f) for f in layout._parquet_files(path)
    )
    _, after = layout.compact_parquet_dir(
        spark, path, target_bytes=total // 8 + 1, sort_cols=["x"]
    )
    assert after <= 16
    assert layout.ranges_overlap_count(layout.file_column_ranges(path, "x")) == 0
    assert layout.prunable_fraction(path, "x", 0, 15) >= 0.5


def test_zorder_quantile_mode_survives_skew(tmp_path, spark):
    """Heavy-tailed column: min-max quantization collapses ~all rows
    into the lowest buckets (the domain is set by a few huge
    outliers), so file rectangles on the skewed dim stay wide and a
    low-range predicate prunes poorly. Quantile quantization buckets
    by POPULATION and keeps pruning alive on the same data."""
    df = (
        spark.range(16_384)
        .select(
            F.xxhash64("id").alias("scramble"),
            # exponential-ish: 75% of rows below 16, outliers to ~2^20
            F.pow(F.lit(2.0), (F.col("id") % 128) / F.lit(6.4)).cast("long").alias("x"),
            (F.col("id") % 97).alias("y"),
        )
        .repartition(8, "scramble")
        .drop("scramble")
    )
    mm_path = str(tmp_path / "zmm")
    qt_path = str(tmp_path / "zqt")
    layout.write_zorder(df, mm_path, ["x", "y"], bits=7, num_files=16)
    layout.write_zorder(
        df, qt_path, ["x", "y"], bits=7, num_files=16, quantize="quantile"
    )
    # predicate over the dense low range (~45% of rows)
    mm = layout.prunable_fraction(mm_path, "x", 0, 3)
    qt = layout.prunable_fraction(qt_path, "x", 0, 3)
    assert qt >= 0.4, f"quantile-mode pruning only {qt:.2%}"
    assert qt > mm, (qt, mm)
    # content preserved
    back = spark.read.parquet(qt_path)
    assert back.count() == 16_384
    assert back.agg(F.sum("x")).first()[0] == df.agg(F.sum("x")).first()[0]


def test_corpus_zorder_scratch_prunes_real_orders(spark):
    """The two-dimension pruning floor gated on the SAME files the
    layout_zorder_scan corpus entry reads back — real orders clustered
    on (o_custkey, o_totalprice). The driver row proves content
    equality; this proves the curve BUYS stats pruning on both
    clustered columns, including the trailing one a linear sort would
    leave unprunable."""
    import os

    from healthcare_data_lakehouse_using_gcp_spark import corpus

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata unavailable")
    path = corpus._zorder_scratch_write(spark, sf_dir)
    stats = (
        spark.read.parquet(path)
        .agg(
            F.min("o_custkey"), F.max("o_custkey"),
            F.min("o_totalprice"), F.max("o_totalprice"),
        )
        .first()
    )
    ck_lo, ck_hi = stats[0], stats[1]
    tp_lo, tp_hi = stats[2], stats[3]
    ck_band = (ck_lo, ck_lo + (ck_hi - ck_lo) * 0.1)
    tp_band = (tp_lo, tp_lo + (tp_hi - tp_lo) * 0.1)
    fc = layout.prunable_fraction(path, "o_custkey", *ck_band)
    ft = layout.prunable_fraction(path, "o_totalprice", *tp_band)
    assert fc >= 0.3, f"o_custkey pruning only {fc:.2%}"
    assert ft >= 0.3, f"o_totalprice pruning only {ft:.2%}"


def test_corpus_layout_scratch_prunes_real_lineitem(spark):
    """VERDICT r5 item 3: the pruning floor gated on the SAME files
    the layout_pruned_scan corpus entry reads back — real lineitem
    range-sorted on l_shipdate, not a synthetic frame. The driver row
    proves content equality; this proves the layout actually BUYS the
    skip: the corpus entry's six-month predicate must leave ≥60% of
    row groups skippable on footer stats alone, with zero overlapping
    (file, file) range pairs."""
    import datetime as dt
    import os

    from healthcare_data_lakehouse_using_gcp_spark import corpus

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata unavailable")
    path = corpus._layout_scratch_write(spark, sf_dir)
    ranges = layout.file_column_ranges(path, "l_shipdate")
    assert len(ranges) >= 4
    assert layout.ranges_overlap_count(ranges) == 0
    frac = layout.prunable_fraction(
        path, "l_shipdate", dt.datetime(1996, 1, 1), dt.datetime(1996, 7, 1)
    )
    assert frac >= 0.6, f"only {frac:.2%} of row groups prunable"


# ---------------------------------------------------------------------
# Hilbert-curve clustering (born r13)
# ---------------------------------------------------------------------


def _xy2d_reference(order, x, y):
    """Textbook Hilbert xy→d (the public bit-rotation algorithm the
    import-time automaton is derived from)."""
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


def test_hilbert_value_matches_textbook_on_full_grid(spark):
    """Bit-exact parity with the reference algorithm over the entire
    64×64 grid — the automaton derivation cannot drift."""
    bits = 6
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", layout.hilbert_value(F.col("x"), F.col("y"), bits, "h")
        ).collect()
    }
    assert all(got[(x, y)] == _xy2d_reference(bits, x, y) for x, y in rows)


def test_hilbert_unit_step_locality(spark):
    """The curve's defining property — consecutive indices are UNIT
    adjacent cells (|dx|+|dy| == 1 for every step), which Z-order
    violates at every quadrant seam. This is WHY Hilbert file
    rectangles come out tighter."""
    bits = 5
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        r["h"]: (r["x"], r["y"])
        for r in df.select(
            "x", "y", layout.hilbert_value(F.col("x"), F.col("y"), bits, "h")
        ).collect()
    }
    assert len(got) == n * n  # bijection
    assert all(
        abs(got[d][0] - got[d + 1][0]) + abs(got[d][1] - got[d + 1][1]) == 1
        for d in range(n * n - 1)
    )
    # and Z-order does NOT have this property (the seam jumps exist)
    zgot = {}
    zdf = df.select(
        "x", "y",
        layout.zorder_value(
            [F.col("x").cast("long"), F.col("y").cast("long")], bits, "z"
        ),
    )
    for r in zdf.collect():
        zgot[r["z"]] = (r["x"], r["y"])
    z_steps = [
        abs(zgot[d][0] - zgot[d + 1][0]) + abs(zgot[d][1] - zgot[d + 1][1])
        for d in range(n * n - 1)
    ]
    assert max(z_steps) > 1


def test_hilbert_prunes_both_dimensions(grid, tmp_path, spark):
    h_path = str(tmp_path / "hilbert")
    layout.write_hilbert(grid, h_path, ["x", "y"], bits=7, num_files=16)
    hx = layout.prunable_fraction(h_path, "x", 0, 15)
    hy = layout.prunable_fraction(h_path, "y", 0, 15)
    assert hx >= 0.5, f"hilbert x pruning only {hx:.2%}"
    assert hy >= 0.5, f"hilbert y pruning only {hy:.2%}"
    # content preserved
    back = spark.read.parquet(h_path)
    assert back.count() == 16_384
    assert back.agg(F.sum("x"), F.sum("y")).first() == grid.agg(
        F.sum("x"), F.sum("y")
    ).first()


def test_hilbert_fail_loud_and_quantile_mode(grid, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly 2"):
        layout.hilbert_layout(grid, ["x"], bits=7)
    with _pytest.raises(ValueError, match="exactly 2"):
        layout.hilbert_layout(grid, ["x", "y", "x"], bits=7)
    # quantile quantization path works end to end
    p = str(tmp_path / "hq")
    layout.write_hilbert(grid, p, ["x", "y"], bits=6, num_files=8,
                         quantize="quantile")
    assert layout.prunable_fraction(p, "x", 0, 15) >= 0.3


def test_corpus_hilbert_scratch_prunes_real_orders(spark):
    """Pruning floor on the SAME files the layout_hilbert_scan corpus
    entry reads back (driver row = content equality; this = the curve
    buys footer pruning on both clustered columns of real orders)."""
    import os

    from healthcare_data_lakehouse_using_gcp_spark import corpus

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata unavailable")
    path = corpus._hilbert_scratch_write(spark, sf_dir)
    stats = (
        spark.read.parquet(path)
        .agg(
            F.min("o_custkey"), F.max("o_custkey"),
            F.min("o_totalprice"), F.max("o_totalprice"),
        )
        .first()
    )
    ck_band = (stats[0], stats[0] + (stats[1] - stats[0]) * 0.1)
    tp_band = (stats[2], stats[2] + (stats[3] - stats[2]) * 0.1)
    fc = layout.prunable_fraction(path, "o_custkey", *ck_band)
    ft = layout.prunable_fraction(path, "o_totalprice", *tp_band)
    assert fc >= 0.3, f"o_custkey pruning only {fc:.2%}"
    assert ft >= 0.3, f"o_totalprice pruning only {ft:.2%}"
