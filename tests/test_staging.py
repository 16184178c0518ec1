"""Staging model tests (SURVEY.md §2.2 P4-P6, §2.7) — hand-written
frames hitting both sides of every threshold (FIXTURES.md edge rows)."""

from __future__ import annotations

import pytest

from healthcare_data_lakehouse_using_gcp_spark.plans import staging


def _vitals_df(spark, rows):
    base = {
        "patient_id": "P000001",
        "timestamp": "2024-06-01T10:30:00",
        "heart_rate": 72,
        "blood_pressure_systolic": 120,
        "blood_pressure_diastolic": 80,
        "temperature": 36.8,
        "oxygen_saturation": 98,
        "respiratory_rate": 16,
        "device_id": "DEV0001",
        "location": "ICU",
        "processed_at": "2024-06-01T10:31:00",
        "pipeline_version": "1.0.0",
        "heart_rate_category": "normal",
        "hour_of_day": 10,
        "day_of_week": "Saturday",
        "data_quality_score": 1.0,
    }
    data = [dict(base, **r) for r in rows]
    schema = (
        "patient_id string, timestamp string, heart_rate int,"
        "blood_pressure_systolic int, blood_pressure_diastolic int,"
        "temperature double, oxygen_saturation int, respiratory_rate int,"
        "device_id string, location string, processed_at string,"
        "pipeline_version string, heart_rate_category string, hour_of_day int,"
        "day_of_week string, data_quality_score double"
    )
    return spark.createDataFrame([tuple(d.values()) for d in data], schema)


def test_vitals_null_key_filter(spark, cfg):
    df = _vitals_df(spark, [{}, {"patient_id": None}, {"timestamp": None}])
    assert staging.stg_patient_vitals(df, cfg).count() == 1


def test_vitals_validate_to_null(spark, cfg):
    # P5: out-of-range → NULL, in-range → passthrough
    df = _vitals_df(
        spark,
        [
            {"heart_rate": 300, "temperature": 50.0, "oxygen_saturation": 50},
            {"heart_rate": 40, "temperature": 35.0, "oxygen_saturation": 70},
        ],
    )
    rows = sorted(
        staging.stg_patient_vitals(df, cfg).collect(),
        key=lambda r: (r["heart_rate"] is None, r["heart_rate"] or 0),
    )
    ok, bad = rows[0], rows[1]
    assert bad["heart_rate"] is None and bad["temperature"] is None
    assert bad["oxygen_saturation"] is None
    assert ok["heart_rate"] == 40 and ok["temperature"] == 35.0


def test_vitals_flags_use_raw_values(spark, cfg):
    # anomaly flags computed on pre-validation values
    df = _vitals_df(spark, [{"heart_rate": 300, "temperature": 45.0}])
    r = staging.stg_patient_vitals(df, cfg).first()
    assert r["heart_rate_anomaly"] is True
    assert r["temperature_anomaly"] is True
    assert r["fever_alert"] is True  # 45 > 38 on raw value
    assert r["elevated_heart_rate_alert"] is True


def test_vitals_alerts_and_derived(spark, cfg):
    df = _vitals_df(
        spark,
        [
            {"oxygen_saturation": 93, "heart_rate": 55, "temperature": 38.5},
            {"hour_of_day": 3, "day_of_week": "Sunday"},
        ],
    )
    rows = staging.stg_patient_vitals(df, cfg).collect()
    alerty = next(r for r in rows if r["oxygen_saturation"] == 93)
    assert alerty["low_oxygen_alert"] and alerty["low_heart_rate_alert"] and alerty["fever_alert"]
    assert alerty["pulse_pressure"] == 40
    assert alerty["rate_pressure_product"] == pytest.approx(66.0)
    assert alerty["shift_category"] == "day_shift"
    assert next(r for r in rows if r["hour_of_day"] == 3)["shift_category"] == "night_shift"
    assert next(r for r in rows if r["day_of_week"] == "Sunday")["day_category"] == "weekend"


def _claims_df(spark, rows):
    base = {
        "claim_id": "CLM000001",
        "patient_id": "P000001",
        "provider_id": "DR0001",
        "service_date": "2024-05-20",
        "diagnosis_codes": ["I10", "E11.9"],
        "procedure_codes": ["99213"],
        "total_amount": 450.0,
        "insurance_type": "Medicare",
        "claim_status": "Paid",
        "submission_date": "2024-05-25",
        "processed_at": "2024-06-01T10:31:00",
        "pipeline_version": "1.0.0",
        "processing_days": 5,
        "amount_category": "medium",
        "data_quality_score": 1.0,
    }
    data = [dict(base, **r) for r in rows]
    schema = (
        "claim_id string, patient_id string, provider_id string,"
        "service_date string, diagnosis_codes array<string>,"
        "procedure_codes array<string>, total_amount double,"
        "insurance_type string, claim_status string, submission_date string,"
        "processed_at string, pipeline_version string, processing_days int,"
        "amount_category string, data_quality_score double"
    )
    return spark.createDataFrame([tuple(d.values()) for d in data], schema)


def test_claims_staging(spark, cfg):
    df = _claims_df(
        spark,
        [
            {},
            {"claim_id": None},
            {"claim_id": "CLM2", "total_amount": 200000.0},  # → NULL + anomaly
            {"claim_id": "CLM3", "processing_days": -2},
            {"claim_id": "CLM4", "processing_days": 400, "claim_status": "Under Review"},
            {"claim_id": "CLM5", "total_amount": 5000.0, "insurance_type": "Private"},
            {"claim_id": "CLM6", "insurance_type": "Self-Pay", "claim_status": "Denied"},
        ],
    )
    out = {r["claim_id"]: r for r in staging.stg_insurance_claims(df, cfg).collect()}
    assert None not in out and len(out) == 6
    assert out["CLM2"]["total_amount"] is None and out["CLM2"]["amount_anomaly"] is True
    assert out["CLM3"]["negative_processing_days"] is True
    assert out["CLM4"]["excessive_processing_days"] is True
    assert out["CLM4"]["pending_claim"] is True
    assert out["CLM4"]["lifecycle_stage"] == "reviewing"
    assert out["CLM5"]["high_value_claim"] is True
    assert out["CLM5"]["value_category"] == "high_value"
    assert out["CLM5"]["insurance_category"] == "private"
    assert out["CLM6"]["insurance_category"] == "self_pay"
    assert out["CLM6"]["denied_claim"] is True
    assert out["CLM1" if "CLM1" in out else "CLM000001"]["daily_claim_value"] == pytest.approx(90.0)
    assert out["CLM000001"]["diagnosis_count"] == 2
    assert out["CLM000001"]["procedure_count"] == 1
    assert out["CLM000001"]["processing_efficiency"] == "excellent"


def test_ehr_staging(spark, cfg):
    schema = (
        "record_id string, patient_id string, visit_date string, provider_id string,"
        "diagnosis string, treatment string, medications array<string>,"
        "lab_results map<string,struct<value:double,unit:string,normal_range:string>>,"
        "notes string, processed_at string, pipeline_version string,"
        "medication_count int, lab_test_count int, data_quality_score double"
    )
    rows = [
        (
            "EHR1", "P1", "2024-05-28", "DR1", "dx", "tx",
            ["Aspirin"], {"CBC": (5.0, "K/uL", "4.5-11.0")}, "n",
            "2024-06-01T10:31:00", "1.0.0", None, None, 0.95,
        ),
        ("EHR2", None, "2024-05-28", "DR1", "dx", "tx", [], {}, "n",
         "2024-06-01T10:31:00", "1.0.0", None, None, 0.6),
    ]
    df = spark.createDataFrame(rows, schema)
    from healthcare_data_lakehouse_using_gcp_spark.plans.staging import stg_ehr_records

    out = stg_ehr_records(df, cfg).collect()
    assert len(out) == 1
    r = out[0]
    assert r["medication_count"] == 1 and r["lab_test_count"] == 1
    assert r["quality_category"] == "excellent"
