"""Generic format matrix for zone tables: parquet / orc / json / csv.

The reference's storage boundary is GCS objects + BigQuery tables;
its ingest accepts JSON messages and its exports are CSV-ish BigQuery
extracts. This module is the engine-side equivalent surface: one
reader/writer pair that works across the batch file formats Spark
ships built-in, with schema fidelity rules made explicit.

Format guidance at 100 TB:
- ``parquet`` (default) — columnar + predicate pushdown + column
  pruning; the only sane analytics format at scale. Always the
  processed/curated zone format.
- ``orc`` — same class as parquet; provided for interop with
  ORC-based warehouses.
- ``json`` — row-major, schema-on-read, 5-10× the scan cost; raw/
  error zones only (mirrors the reference's JSON Pub/Sub payloads).
- ``csv`` — header-dependent, TYPE-LOSSY (arrays/maps/structs are not
  representable; everything is a string without an explicit schema).
  Export/interchange only; ``write_table`` refuses nested columns
  rather than silently flattening.

Readers take an optional explicit schema — at scale, schema inference
is a full extra pass over the data (Spark samples but may still scan
GBs of JSON/CSV); production pipelines should always pass one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "json", "csv")


def _check_fmt(fmt: str) -> str:
    if fmt not in _FORMATS:
        raise ValueError(f"format {fmt!r} not in {_FORMATS}")
    return fmt


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read a zone table in any supported batch format.

    csv defaults: header=true; pass an explicit schema (or
    inferSchema=true, costing an extra data pass) for typed columns.
    """
    reader = spark.read.format(_check_fmt(fmt))
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_cols: list[str] | None = None,
    **options,
) -> None:
    """Write a zone table in any supported batch format.

    Refuses nested (array/map/struct) columns for csv instead of
    failing deep inside the writer or silently stringifying.
    """
    _check_fmt(fmt)
    if fmt == "csv":
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            raise ValueError(
                f"csv cannot represent nested columns {nested}; "
                "serialize them explicitly (e.g. to_json) first"
            )
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def convert_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    src_fmt: str,
    dst_fmt: str,
    schema: T.StructType | str | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a table between formats (e.g. raw json → parquet
    promotion when a raw zone graduates to processed). One distributed
    read→write; no driver materialization."""
    write_table(
        read_table(spark, src_path, src_fmt, schema),
        dst_path,
        dst_fmt,
        mode="overwrite",
        partition_cols=partition_cols,
    )


def zone_path(warehouse: str, zone: str, table: str) -> str:
    return os.path.join(warehouse, zone, table)
