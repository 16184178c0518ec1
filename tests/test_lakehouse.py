"""End-to-end lakehouse test: raw JSON → zones → fact → reports,
including partition-pruning of the date-partitioned processed zone."""

from __future__ import annotations

import os

from healthcare_data_lakehouse_using_gcp_spark.lakehouse import HealthcareLakehouse
from healthcare_data_lakehouse_using_gcp_spark.sources.generator import HealthcareDataGenerator


def test_full_pipeline(spark, cfg, tmp_path):
    gen = HealthcareDataGenerator(seed=23, now=cfg.as_of)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    msgs = gen.generate_messages(400)
    (raw_dir / "batch1.json").write_text("\n".join(msgs))

    lh = HealthcareLakehouse(spark, str(tmp_path / "wh"), cfg)
    out = lh.run_all(str(raw_dir))

    assert out["etl_counts"]["vitals"] > 0
    assert out["freshness"]["recent_records"] > 0
    assert out["health"]["total_encounters"] > 0
    assert spark.table("fact_patient_encounters").count() > 0

    # processed zone is date-partitioned (hive-style directories)
    vit_dir = os.path.join(str(tmp_path / "wh"), "processed", "vitals")
    parts = [p for p in os.listdir(vit_dir) if p.startswith("event_date=")]
    assert len(parts) > 1

    # partition pruning: a single-date filter must scan < all partitions
    one_date = parts[0].split("=", 1)[1]
    df = spark.read.parquet(vit_dir).filter(f"event_date = DATE'{one_date}'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or df.count() < lh.read_processed("vitals").count()


def test_incremental_append(spark, cfg, tmp_path):
    gen = HealthcareDataGenerator(seed=29, now=cfg.as_of)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "b1.json").write_text("\n".join(gen.generate_messages(100)))
    lh = HealthcareLakehouse(spark, str(tmp_path / "wh"), cfg)
    c1 = lh.run_etl(str(raw_dir))["vitals"]
    # append-only semantics (WRITE_APPEND, healthcare_etl_pipeline.py:306)
    c2 = lh.run_etl(str(raw_dir))["vitals"]
    assert c2 == 2 * c1
