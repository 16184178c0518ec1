"""Format-matrix tests: round-trip fidelity per format + the explicit
failure modes (csv nested refusal, unknown format)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.sources.formats import (
    convert_table,
    read_table,
    write_table,
)


@pytest.fixture()
def typed_df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, "2024-06-01", ["x", "y"]),
            (2, "b", -0.25, "2024-06-02", []),
        ],
        "id bigint, name string, score double, d string, tags array<string>",
    ).withColumn("d", F.to_date("d"))


def test_parquet_orc_roundtrip_preserves_types(spark, typed_df, tmp_path):
    for fmt in ("parquet", "orc"):
        p = str(tmp_path / fmt)
        write_table(typed_df, p, fmt, mode="overwrite")
        back = read_table(spark, p, fmt)
        assert back.schema == typed_df.schema
        assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_json_roundtrip_with_schema(spark, typed_df, tmp_path):
    p = str(tmp_path / "j")
    write_table(typed_df, p, "json", mode="overwrite")
    back = read_table(spark, p, "json", schema=typed_df.schema)
    assert back.schema == typed_df.schema
    row = {r["id"]: r for r in back.collect()}
    assert row[1]["tags"] == ["x", "y"] and row[1]["score"] == 1.5


def test_csv_roundtrip_flat_with_schema(spark, typed_df, tmp_path):
    flat = typed_df.drop("tags")
    p = str(tmp_path / "c")
    write_table(flat, p, "csv", mode="overwrite")
    back = read_table(spark, p, "csv", schema=flat.schema)
    assert back.schema == flat.schema
    assert back.count() == 2


def test_csv_refuses_nested(typed_df, tmp_path):
    with pytest.raises(ValueError, match="nested"):
        write_table(typed_df, str(tmp_path / "bad"), "csv")


def test_unknown_format_rejected(spark, typed_df, tmp_path):
    with pytest.raises(ValueError, match="not in"):
        write_table(typed_df, str(tmp_path / "x"), "avro")


def test_convert_json_to_parquet(spark, typed_df, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(typed_df, src, "json", mode="overwrite")
    convert_table(spark, src, dst, "json", "parquet", schema=typed_df.schema)
    back = read_table(spark, dst, "parquet")
    assert back.schema == typed_df.schema and back.count() == 2
