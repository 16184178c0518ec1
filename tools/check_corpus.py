"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the
same parquet tables, compare row count + column names + order-
insensitive values.

Usage: python tools/check_corpus.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from healthcare_data_lakehouse_using_gcp_spark import corpus  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _driver_hashable(dt) -> bool:
    """The driver canonicalizes results with pandas sort_values +
    hashing — array/map/struct cells raise 'unhashable type' there
    (the round-1 multimodal_features failure), and DecimalType columns
    hash-flip silently: Spark's toPandas delivers object-dtype
    ``Decimal`` cells while DuckDB's .df() widens DECIMAL to float64,
    so the driver's value hash diverges on REPRESENTATION even when
    every value is identical (the round-15 ann_ivf_*_invariants red
    seats). Reject both classes up front — widen-then-sum internally,
    but emit bigint/double."""
    return not isinstance(
        dt, (T.ArrayType, T.MapType, T.StructType, T.DecimalType)
    )


def make_oracle_connection(sf_dir: str):
    """One DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare_one(spark, con, sf_dir: str, name: str, fn, sql: str | None):
    """Run one (Spark builder, DuckDB oracle) pair and return
    ("pass"|"rows_only"|"fail", detail) — the driver-replica
    comparison used by main() below AND the per-tail-entry pytest
    sweep (tests/test_corpus_tail.py)."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        return ("fail", f"SPARK ERROR: {e}")
    if sql is None:
        return ("rows_only", len(srows))
    bad = [f.name for f in sdf.schema.fields if not _driver_hashable(f.dataType)]
    if bad:
        return ("fail", f"DRIVER-UNHASHABLE columns {bad}: the grading driver's "
                        "pandas canonicalization cannot hash array/map/struct "
                        "cells, and decimal cells hash-flip vs the oracle's "
                        "float64 widening (round-15 artifact) — cast to "
                        "bigint/double before returning")
    try:
        # values via fetchall (native date/None types — pandas
        # widens DATE to Timestamp and NULL to NaN); a second
        # execute for the pandas frame feeding the dtype check
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        opdf = con.execute(sql).df()
    except Exception as e:  # noqa: BLE001
        return ("fail", f"DUCKDB ERROR: {e}")
    if sorted(scols) != sorted(ocols):
        return ("fail", f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}")
    # The driver hash-compares pandas values, which is dtype-
    # sensitive: an int64 Spark column vs a float64 oracle column
    # (e.g. DuckDB HUGEINT SUMs) hash-mismatches even when the
    # values are numerically equal (the round-3 pack_documents
    # failure). Flag kind mismatches up front.
    skinds = {
        f.name: ("i" if isinstance(f.dataType, (T.ByteType, T.ShortType,
                 T.IntegerType, T.LongType)) else
                 "f" if isinstance(f.dataType, (T.FloatType, T.DoubleType))
                 else "o")
        for f in sdf.schema.fields
    }
    # spark-int vs oracle-float is only benign when the floats come
    # from NULLs (both engines' pandas paths widen nullable ints the
    # same way); spark-float vs oracle-int always mismatches.
    hash_risk = [
        c for c in scols
        if (skinds.get(c) == "i" and opdf[c].dtype.kind == "f"
            and opdf[c].notna().all())
        or (skinds.get(c) == "f" and opdf[c].dtype.kind == "i")
    ]
    if hash_risk:
        return ("fail", f"HASH-RISK int/float dtype mismatch on {hash_risk}: "
                        f"spark={[skinds[c] for c in hash_risk]} "
                        f"oracle={[opdf[c].dtype.kind for c in hash_risk]}")
    # an oracle column that DuckDB keeps as object-dtype Decimal
    # (very wide DECIMALs it declines to widen to float64) also
    # hash-flips against any numeric Spark column — same class of
    # representation divergence as the Spark-side DecimalType reject
    dec_risk = [
        c for c in scols
        if skinds.get(c) in ("i", "f")
        and opdf[c].dtype.kind == "O"
        and opdf[c].map(lambda x: isinstance(x, Decimal)).any()
    ]
    if dec_risk:
        return ("fail", f"HASH-RISK oracle Decimal objects on {dec_risk}: "
                        "cast the oracle expression to BIGINT/DOUBLE")
    if len(srows) != len(orows):
        return ("fail", f"ROWCOUNT: spark={len(srows)} oracle={len(orows)}")
    sn, on = norm_rows(srows, scols), norm_rows(orows, ocols)
    if sn != on:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sn, on)) if a != b)
        return ("fail", f"VALUES at sorted-row {diff[0]}:\n"
                        f"  spark={diff[1]}\n  oracle={diff[2]}")
    return ("pass", len(srows))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # a PLAIN session, exactly like the driver's (no custom conf, no
    # tuned shuffle/timezone): every query must be self-defending
    spark = SparkSession.builder.master("local[8]").appName("check-corpus").getOrCreate()
    con = make_oracle_connection(sf_dir)

    qs, oracles = corpus.queries(), corpus.oracle_sql()
    failures, passes, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        status, detail = compare_one(spark, con, sf_dir, name, fn, oracles.get(name))
        if status == "pass":
            passes.append((name, detail))
        elif status == "rows_only":
            rows_only.append((name, detail))
        else:
            failures.append((name, detail))

    print(f"\n== PASS ({len(passes)}) ==")
    for n, c in passes:
        print(f"  {n}: {c} rows")
    print(f"== ROWS-ONLY ({len(rows_only)}) ==")
    for n, c in rows_only:
        print(f"  {n}: {c} rows")
    print(f"== FAIL ({len(failures)}) ==")
    for n, msg in failures:
        print(f"  {n}: {msg}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
