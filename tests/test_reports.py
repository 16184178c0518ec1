"""Report query + model-runner tests (A7-A9, S6-S7, §3.2-3.3)."""

from __future__ import annotations

import json

import pytest

from healthcare_data_lakehouse_using_gcp_spark.operators.etl import build_etl
from healthcare_data_lakehouse_using_gcp_spark.plans import reports
from healthcare_data_lakehouse_using_gcp_spark.plans.models import ModelRunner, healthcare_models
from healthcare_data_lakehouse_using_gcp_spark.sources.generator import HealthcareDataGenerator


@pytest.fixture(scope="module")
def warehouse_frames(spark, cfg):
    """End-to-end: generator → ETL → processed frames → models → fact."""
    gen = HealthcareDataGenerator(seed=5, now=cfg.as_of)
    msgs = gen.generate_messages(600, malformed_rate=0.02, unknown_rate=0.02)
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    routed = build_etl(raw, cfg)
    return routed


@pytest.fixture(scope="module")
def fact_df(spark, cfg, warehouse_frames, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    runner = ModelRunner(spark, warehouse=wh, cfg=cfg)
    runner.add_source("patient_vitals", warehouse_frames["vitals"])
    runner.add_source("insurance_claims", warehouse_frames["claims"])
    runner.add_source("ehr_records", warehouse_frames["ehr"])
    for m in healthcare_models():
        runner.add(m)
    out = runner.run()
    return out["fact_patient_encounters"]


def test_model_runner_registers_views(spark, cfg, fact_df):
    assert spark.table("stg_patient_vitals").count() > 0
    assert spark.table("fact_patient_encounters").count() > 0
    assert fact_df.count() == spark.table("fact_patient_encounters").count()


def test_fact_encounter_types(fact_df):
    types = {r["encounter_type"] for r in fact_df.select("encounter_type").distinct().collect()}
    assert "vitals_only" in types  # sparse joins at this scale
    assert types <= {"vitals_only", "claims_only", "ehr_only", "comprehensive"}


def test_freshness_and_quality_checks(spark, cfg, warehouse_frames):
    vitals = warehouse_frames["vitals"]
    # processed_at == as_of → within the 1-hour freshness window
    row = reports.check_freshness(vitals, cfg)
    assert row["recent_records"] > 0
    q = reports.check_quality(vitals, cfg)
    assert q["avg_quality_score"] == pytest.approx(1.0)  # post-filter rows are clean
    assert q["below_threshold"] is False


def test_health_and_staleness(spark, cfg, fact_df):
    health = reports.check_pipeline_health(fact_df, cfg)
    assert health["total_encounters"] > 0
    stale = reports.check_staleness(fact_df, cfg)
    assert stale["latest_timestamp"] is not None


def test_monitoring_and_claims_reports(spark, cfg, fact_df):
    mon = reports.patient_monitoring_report(fact_df, cfg)
    rows = mon.collect()
    assert len(rows) >= 1
    assert rows[0]["total_measurements"] > 0
    claims = reports.claims_processing_report(fact_df, cfg).collect()
    for r in claims:
        assert r["total_claims"] > 0


def test_gate_severity_warn_and_error(spark, cfg):
    """dbt-style warn_if/error_if severity on the report gates
    (dbt_project.yml:33-36,89-94 parity)."""
    import dataclasses
    import datetime as dt

    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.config import GatePolicy

    def vitals_with(n_low):
        rows = [("P%06d" % i, cfg.as_of.isoformat(), 0.5 if i < n_low else 1.0)
                for i in range(n_low + 5)]
        return spark.createDataFrame(
            rows, "patient_id string, processed_at string, data_quality_score double"
        ).withColumn("processed_at", F.col("processed_at").cast("timestamp_ntz"))

    tight = dataclasses.replace(
        cfg, low_quality_gate=GatePolicy(warn_if=2, error_if=10, store_failures=True)
    )
    # 0 low → pass, no stored failures
    ok = reports.check_quality(vitals_with(0), tight)
    assert ok["gate_status"] == "pass" and "failures" not in ok

    # 3 low → warn + stored failing rows
    warn = reports.check_quality(vitals_with(3), tight)
    assert warn["gate_status"] == "warn"
    assert warn["failures"].count() == 3

    # 11 low → error raises like a dbt test at severity error
    with pytest.raises(reports.PipelineHealthError, match="quality gate error"):
        reports.check_quality(vitals_with(11), tight)

    # staleness: warn between warn_if and error_if, error beyond
    def fact_latest(minutes_ago):
        ts = (cfg.as_of - dt.timedelta(minutes=minutes_ago)).isoformat()
        return spark.createDataFrame(
            [("PA", ts)], "patient_id string, measurement_timestamp string"
        ).withColumn(
            "measurement_timestamp", F.col("measurement_timestamp").cast("timestamp_ntz")
        )

    s_cfg = dataclasses.replace(
        cfg, staleness_gate=GatePolicy(warn_if=30, error_if=240)
    )
    assert reports.check_staleness(fact_latest(5), s_cfg)["gate_status"] == "pass"
    w = reports.check_staleness(fact_latest(90), s_cfg)
    assert w["gate_status"] == "warn" and w["stale"] is True
    with pytest.raises(reports.PipelineHealthError, match="staleness gate error"):
        reports.check_staleness(fact_latest(500), s_cfg)
