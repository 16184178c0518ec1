"""Scalar column builders (SURVEY.md §2.7).

Every function returns a pyspark Column built from built-in
expressions only — no Python UDFs — so the whole ETL/staging layer
stays inside Catalyst + whole-stage codegen (the reference's Beam
DoFns are dict-at-a-time Python; this is the Spark-first rewrite,
see SURVEY.md §2.9: zero ops genuinely require UDFs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import EngineConfig, Thresholds

def round_det(col: Column, digits: int) -> Column:
    """Deterministic cross-engine rounding: floor(x*10^d + 0.5)/10^d.

    Spark's round() (BigDecimal HALF_UP on the shortest decimal repr)
    and DuckDB's round() disagree on doubles whose shortest repr ends
    exactly in ...5 at digit d+1. This form uses only exact IEEE ops,
    so for bit-identical inputs both engines produce bit-identical
    output. Use for per-row values; for cross-engine aggregates
    (inputs already differ by ulps) prefer native round at a digit
    position far from the data's intrinsic precision.

    Magnitude guard (r13): Spark's floor(double) narrows to LONG and
    silently WRAPS past 2^63 (e.g. 2^62 rounded at 6dp came back as
    9.2e12), while DuckDB's floor stays in double space — a silent
    cross-engine divergence for |x·10^d| ≥ 2^63. Once |x·10^d| ≥
    2^52 the scaled double is integer-valued, so floor is the
    IDENTITY on it — both engines compute fl((x·s + 0.5)/s) — and
    Spark can skip the narrowing floor entirely, staying bit-equal
    to the oracle's written-out formula in that regime too."""
    scale = float(10**digits)
    scaled = col * scale
    half_up = scaled + F.lit(0.5)
    return (
        F.when(F.abs(scaled) < F.lit(2.0**52), F.floor(half_up))
        .otherwise(half_up)
        / scale
    )


# --- time helpers ----------------------------------------------------


def now_col(cfg: EngineConfig) -> Column:
    """CURRENT_TIMESTAMP, or the frozen ``as_of`` instant for tests.

    Reference stamps datetime.now() at parse time
    (healthcare_etl_pipeline.py:55); parameterized per SURVEY.md §7
    risk 2.
    """
    if cfg.as_of is None:
        return F.current_timestamp()
    return F.lit(cfg.as_of).cast("timestamp")


def today_col(cfg: EngineConfig) -> Column:
    if cfg.as_of is None:
        return F.current_date()
    return F.lit(cfg.as_of.date() if isinstance(cfg.as_of, dt.datetime) else cfg.as_of).cast(
        "date"
    )


def hour_of_day(ts: Column) -> Column:
    """healthcare_etl_pipeline.py:174 (`timestamp.hour`)."""
    return F.hour(ts)


def day_of_week(ts: Column) -> Column:
    """English day name; healthcare_etl_pipeline.py:175 (strftime %A)."""
    return F.date_format(ts, "EEEE")


# --- validation (validate-to-NULL, stg_patient_vitals.sql:24-58) -----


def valid_in_range(col: Column, lo: float, hi: float) -> Column:
    """CASE WHEN col BETWEEN lo AND hi THEN col ELSE NULL END."""
    return F.when(col.between(lo, hi), col)


def range_anomaly(col: Column, lo: float, hi: float) -> Column:
    """True when non-null and out of range (healthcare_etl_pipeline.py:84-89)."""
    return F.when(col.isNotNull() & ~col.between(lo, hi), F.lit(True)).otherwise(F.lit(False))


# --- categorical bucketing (F5) --------------------------------------


def heart_rate_category(hr: Column, t: Thresholds) -> Column:
    """low / normal / elevated (healthcare_etl_pipeline.py:162-170).

    Reference reads `data.get('heart_rate', 0)` so a missing value
    falls through to 'low'; mirror with coalesce(hr, 0).
    """
    hr0 = F.coalesce(hr, F.lit(0))
    return (
        F.when(hr0 > t.elevated_hr_threshold, F.lit("elevated"))
        .when(hr0 < t.low_hr_threshold, F.lit("low"))
        .otherwise(F.lit("normal"))
    )


def amount_category(amount: Column) -> Column:
    """low(<100) / medium(<1000) / high (healthcare_etl_pipeline.py:187-194)."""
    return (
        F.when(amount < 100, F.lit("low"))
        .when(amount < 1000, F.lit("medium"))
        .otherwise(F.lit("high"))
    )


def value_category(amount: Column) -> Column:
    """stg_insurance_claims.sql:129-134 buckets at 100/1000/10000."""
    return (
        F.when(amount < 100, F.lit("low_value"))
        .when(amount < 1000, F.lit("medium_value"))
        .when(amount < 10000, F.lit("high_value"))
        .otherwise(F.lit("very_high_value"))
    )


def processing_efficiency(days: Column) -> Column:
    """stg_insurance_claims.sql:121-126 buckets at 7/30/90."""
    return (
        F.when(days <= 7, F.lit("excellent"))
        .when(days <= 30, F.lit("good"))
        .when(days <= 90, F.lit("fair"))
        .otherwise(F.lit("poor"))
    )


def quality_category(score: Column) -> Column:
    """stg_patient_vitals.sql:128-133 splits at 0.9/0.7/0.5."""
    return (
        F.when(score >= 0.9, F.lit("excellent"))
        .when(score >= 0.7, F.lit("good"))
        .when(score >= 0.5, F.lit("fair"))
        .otherwise(F.lit("poor"))
    )


def shift_category(hour: Column) -> Column:
    """day shift 6-18 else night (stg_patient_vitals.sql:136-139)."""
    return F.when((hour >= 6) & (hour <= 18), F.lit("day_shift")).otherwise(F.lit("night_shift"))


def day_category(day_name: Column) -> Column:
    """weekend / weekday (stg_patient_vitals.sql:134)."""
    return F.when(day_name.isin("Saturday", "Sunday"), F.lit("weekend")).otherwise(
        F.lit("weekday")
    )


def insurance_category(insurance_type: Column) -> Column:
    """Medicare/Medicaid→government (stg_insurance_claims.sql:137-141)."""
    return (
        F.when(insurance_type.isin("Medicare", "Medicaid"), F.lit("government"))
        .when(insurance_type == "Private", F.lit("private"))
        .otherwise(F.lit("self_pay"))
    )


def claim_lifecycle_stage(status: Column) -> Column:
    """status→stage map (stg_insurance_claims.sql:144-151)."""
    return (
        F.when(status == "Submitted", F.lit("submitted"))
        .when(status == "Under Review", F.lit("reviewing"))
        .when(status == "Approved", F.lit("approved"))
        .when(status == "Denied", F.lit("denied"))
        .when(status == "Paid", F.lit("paid"))
        .otherwise(F.lit("unknown"))
    )


# --- arithmetic (F7) -------------------------------------------------


def pulse_pressure(systolic: Column, diastolic: Column) -> Column:
    """stg_patient_vitals.sql:115-118."""
    return systolic - diastolic


def rate_pressure_product(hr: Column, systolic: Column) -> Column:
    """hr*systolic/100 (stg_patient_vitals.sql:120-125)."""
    return hr * systolic / F.lit(100.0)


def daily_claim_value(amount: Column, processing_days: Column) -> Column:
    """amount/processing_days when amount present and days > 0, else
    NULL (stg_insurance_claims.sql:101-105 — the reference's ELSE
    branch is NULL, not the raw amount)."""
    return F.when(amount.isNotNull() & (processing_days > 0), amount / processing_days)


def quality_score(missing_fields: Column, anomaly_count: Column) -> Column:
    """max(0, 1 - 0.2*missing - 0.3*anomalies)
    (healthcare_etl_pipeline.py:143-159)."""
    return F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(0.2) * missing_fields - F.lit(0.3) * anomaly_count
    )
