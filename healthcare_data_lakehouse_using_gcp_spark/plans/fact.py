"""fact_patient_encounters — the reference's most complex query
(dbt/models/marts/fact_patient_encounters.sql:1-241) as a DataFrame
plan.

Shape: 3 lookback-filtered CTE scans → LEFT band join vitals↔claims
(±7 days, J1) with ROW_NUMBER proximity rank (W1) → LEFT band join
↔ehr (J2) with a second proximity rank → rank-1 CASE projection (J3)
+ wide GROUP BY aggregation (A2-A6).

Literal-semantics notes (SURVEY.md §4, last defect bullet — we
reproduce, not fix):
- The GROUP BY includes claim_id/record_id/both proximity ranks
  (:229-238), so groups are one-per-joined-row and COUNT(DISTINCT
  claim_id) degenerates to 0/1. Kept byte-faithful for oracle parity.
- The second window partitions only by (patient_id, ts) (:134-137),
  so claim-duplicated rows share one partition and ehr ranks run over
  the cross product.
- The reference's rank ordering has ties (same |datediff|) and is
  therefore nondeterministic; we append deterministic tie-breakers
  (claim_id / record_id) — documented divergence that makes the
  output well-defined. Oracle SQL must use the same tie-breakers.

Scale notes: both joins shuffle on patient_id only (band predicate is
a post-join filter); both windows partition by (patient_id,
measurement_timestamp) — a strict refinement of the join key — so
Catalyst reuses the join exchange where possible and AQE handles
patient-level skew. The final groupBy keys are a superset of the
window partition keys, again avoiding a full re-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.scalars import now_col, today_col

VITALS_COLS = [
    "patient_id", "measurement_timestamp", "device_id", "location",
    "heart_rate", "blood_pressure_systolic", "blood_pressure_diastolic",
    "temperature", "oxygen_saturation", "respiratory_rate",
    "heart_rate_category", "pulse_pressure", "rate_pressure_product",
    "shift_category", "day_category", "quality_category",
    "low_oxygen_alert", "elevated_heart_rate_alert",
    "low_heart_rate_alert", "fever_alert",
]

GROUP_COLS = [
    # fact_patient_encounters.sql:229-238, literal order
    "patient_id", "measurement_timestamp", "device_id", "location",
    "heart_rate", "blood_pressure_systolic", "blood_pressure_diastolic",
    "temperature", "oxygen_saturation", "respiratory_rate", "heart_rate_category",
    "pulse_pressure", "rate_pressure_product", "shift_category", "day_category",
    "quality_category", "low_oxygen_alert", "elevated_heart_rate_alert",
    "low_heart_rate_alert", "fever_alert", "claim_proximity_rank", "ehr_proximity_rank",
    "claim_id", "service_date", "total_amount", "insurance_type", "claim_status",
    "processing_days", "record_id", "visit_date", "diagnosis", "treatment",
    "medication_count", "lab_test_count",
]


def fact_patient_encounters(
    stg_vitals: DataFrame,
    stg_claims: DataFrame,
    stg_ehr: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    band = cfg.band_days
    # --- CTE scans with lookback predicates (:31-78) — these reach
    # the parquet scan as pushed filters / partition pruning.
    vitals = stg_vitals.select(*VITALS_COLS).filter(
        F.col("measurement_timestamp")
        >= (now_col(cfg) - F.expr(f"INTERVAL {cfg.lookback_days} DAYS"))
    )
    claims = stg_claims.select(
        "patient_id", "claim_id", "service_date", "submission_date", "provider_id",
        "total_amount", "insurance_type", "insurance_category", "claim_status",
        "lifecycle_stage", "amount_category", "value_category", "processing_days",
        "processing_efficiency", "diagnosis_count", "procedure_count",
        "daily_claim_value", "denied_claim", "paid_claim", "pending_claim",
        "high_value_claim",
    ).filter(F.col("service_date") >= F.date_sub(today_col(cfg), cfg.lookback_days))
    ehr = stg_ehr.select(
        "patient_id", "record_id", "visit_date", "provider_id", "diagnosis",
        "treatment", "medications", "lab_results", "medication_count",
        "lab_test_count", "notes",
    ).filter(F.col("visit_date") >= F.date_sub(today_col(cfg), cfg.lookback_days))

    # --- vitals ⟕ claims band join + proximity rank (:81-115)
    v, c = vitals.alias("v"), claims.alias("c")
    vdate = F.to_date(F.col("v.measurement_timestamp"))
    claim_dist = F.abs(F.datediff(vdate, F.col("c.service_date")))
    vc = (
        v.join(
            c,
            (F.col("v.patient_id") == F.col("c.patient_id")) & (claim_dist <= band),
            "left",
        )
        .drop(F.col("c.patient_id"))
        .withColumnRenamed("provider_id", "claim_provider_id")
        .withColumn("days_from_service", F.datediff(vdate, F.col("service_date")))
        .withColumn(
            "claim_proximity_rank",
            F.row_number().over(
                Window.partitionBy("patient_id", "measurement_timestamp").orderBy(
                    F.abs(
                        F.datediff(F.to_date("measurement_timestamp"), F.col("service_date"))
                    ).asc_nulls_last(),
                    F.col("claim_id").asc_nulls_last(),  # deterministic tie-break
                )
            ),
        )
    )

    # --- (vitals⋈claims) ⟕ ehr band join + proximity rank (:117-142)
    vc_a, e = vc.alias("vc"), ehr.alias("e")
    vcdate = F.to_date(F.col("vc.measurement_timestamp"))
    ehr_dist = F.abs(F.datediff(vcdate, F.col("e.visit_date")))
    enc = (
        vc_a.join(
            e,
            (F.col("vc.patient_id") == F.col("e.patient_id")) & (ehr_dist <= band),
            "left",
        )
        .drop(F.col("e.patient_id"))
        .withColumnRenamed("provider_id", "ehr_provider_id")
        .withColumn("days_from_visit", F.datediff(vcdate, F.col("visit_date")))
        .withColumn(
            "ehr_proximity_rank",
            F.row_number().over(
                Window.partitionBy("patient_id", "measurement_timestamp").orderBy(
                    F.abs(
                        F.datediff(F.to_date("measurement_timestamp"), F.col("visit_date"))
                    ).asc_nulls_last(),
                    F.col("record_id").asc_nulls_last(),
                    F.col("claim_id").asc_nulls_last(),  # deterministic within cross product
                )
            ),
        )
    )

    # --- rank-1 CASE projection + wide aggregation (:144-239)
    rank1_claim = F.col("claim_proximity_rank") == 1
    rank1_ehr = F.col("ehr_proximity_rank") == 1
    agg = enc.groupBy(*GROUP_COLS).agg(
        F.countDistinct("claim_id").alias("total_claims"),
        F.countDistinct("record_id").alias("total_ehr_records"),
        F.sum("total_amount").alias("total_claim_value"),
        F.avg("processing_days").alias("avg_processing_days"),
        F.sum(F.when(F.col("denied_claim"), 1).otherwise(0)).alias("denied_claims_count"),
        F.sum(F.when(F.col("paid_claim"), 1).otherwise(0)).alias("paid_claims_count"),
        F.sum(F.when(F.col("pending_claim"), 1).otherwise(0)).alias("pending_claims_count"),
        F.sum(F.when(F.col("high_value_claim"), 1).otherwise(0)).alias(
            "high_value_claims_count"
        ),
        (
            F.coalesce(F.countDistinct("claim_id"), F.lit(0)) * 0.3
            + F.coalesce(F.countDistinct("record_id"), F.lit(0)) * 0.2
            + F.coalesce(F.sum("diagnosis_count"), F.lit(0)) * 0.2
            + F.coalesce(F.sum("procedure_count"), F.lit(0)) * 0.2
            + F.coalesce(F.sum("medication_count"), F.lit(0)) * 0.1
        ).alias("encounter_complexity_score"),
    )
    total_claims = F.col("total_claims")
    total_ehr = F.col("total_ehr_records")
    return agg.select(
        "patient_id", "measurement_timestamp", "device_id", "location",
        "heart_rate", "blood_pressure_systolic", "blood_pressure_diastolic",
        "temperature", "oxygen_saturation", "respiratory_rate", "heart_rate_category",
        "pulse_pressure", "rate_pressure_product", "shift_category", "day_category",
        "quality_category", "low_oxygen_alert", "elevated_heart_rate_alert",
        "low_heart_rate_alert", "fever_alert",
        F.when(rank1_claim, F.col("claim_id")).alias("primary_claim_id"),
        F.when(rank1_claim, F.col("service_date")).alias("primary_service_date"),
        F.when(rank1_claim, F.col("total_amount")).alias("primary_claim_amount"),
        F.when(rank1_claim, F.col("insurance_type")).alias("primary_insurance_type"),
        F.when(rank1_claim, F.col("claim_status")).alias("primary_claim_status"),
        F.when(rank1_claim, F.col("processing_days")).alias("primary_processing_days"),
        F.when(rank1_ehr, F.col("record_id")).alias("primary_ehr_record_id"),
        F.when(rank1_ehr, F.col("visit_date")).alias("primary_visit_date"),
        F.when(rank1_ehr, F.col("diagnosis")).alias("primary_diagnosis"),
        F.when(rank1_ehr, F.col("treatment")).alias("primary_treatment"),
        F.when(rank1_ehr, F.col("medication_count")).alias("primary_medication_count"),
        F.when(rank1_ehr, F.col("lab_test_count")).alias("primary_lab_test_count"),
        "total_claims", "total_ehr_records", "total_claim_value", "avg_processing_days",
        "denied_claims_count", "paid_claims_count", "pending_claims_count",
        "high_value_claims_count", "encounter_complexity_score",
        # risk indicators (:208-214)
        F.when(
            F.col("low_oxygen_alert")
            | F.col("elevated_heart_rate_alert")
            | F.col("low_heart_rate_alert")
            | F.col("fever_alert"),
            F.lit("high_risk"),
        )
        .when(
            (F.col("heart_rate_category") != "normal") | (F.col("temperature") > 37.5),
            F.lit("medium_risk"),
        )
        .otherwise(F.lit("low_risk"))
        .alias("risk_level"),
        # encounter type (:217-222) — lateral refs to the agg aliases
        F.when((total_claims > 0) & (total_ehr > 0), F.lit("comprehensive"))
        .when(total_claims > 0, F.lit("claims_only"))
        .when(total_ehr > 0, F.lit("ehr_only"))
        .otherwise(F.lit("vitals_only"))
        .alias("encounter_type"),
        now_col(cfg).alias("created_at"),
        now_col(cfg).alias("updated_at"),
    )
