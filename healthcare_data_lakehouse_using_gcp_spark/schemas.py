"""Entity StructTypes (SURVEY.md §1.4).

Authoritative columns come from the reference's generator dataclasses
(ingestion/data_generators/healthcare_data_generator.py:17-56) and
declared BigQuery sink schemas
(dataflow/pipelines/healthcare_etl_pipeline.py:300-335).

Design decision (SURVEY.md §7 risk 3): arrays and maps stay
first-class Spark types end-to-end. The reference flattens
diagnosis_codes / medications / lab_results to strings at the BQ
boundary then re-splits (stg_insurance_claims.sql:108-117); keeping
ArrayType/MapType avoids that round-trip and `F.size` provides the
same count semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw entity schemas (as generated/published) ---------------------

PATIENT_VITALS_SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 in flight; cast in staging
        T.StructField("heart_rate", T.IntegerType()),
        T.StructField("blood_pressure_systolic", T.IntegerType()),
        T.StructField("blood_pressure_diastolic", T.IntegerType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("oxygen_saturation", T.IntegerType()),
        T.StructField("respiratory_rate", T.IntegerType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("location", T.StringType()),
    ]
)

INSURANCE_CLAIM_SCHEMA = T.StructType(
    [
        T.StructField("claim_id", T.StringType()),
        T.StructField("patient_id", T.StringType()),
        T.StructField("provider_id", T.StringType()),
        T.StructField("service_date", T.StringType()),  # 'YYYY-MM-DD' in flight
        T.StructField("diagnosis_codes", T.ArrayType(T.StringType())),
        T.StructField("procedure_codes", T.ArrayType(T.StringType())),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("insurance_type", T.StringType()),
        T.StructField("claim_status", T.StringType()),
        T.StructField("submission_date", T.StringType()),
    ]
)

LAB_RESULT_STRUCT = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("normal_range", T.StringType()),
    ]
)

EHR_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("patient_id", T.StringType()),
        T.StructField("visit_date", T.StringType()),
        T.StructField("provider_id", T.StringType()),
        T.StructField("diagnosis", T.StringType()),
        T.StructField("treatment", T.StringType()),
        T.StructField("medications", T.ArrayType(T.StringType())),
        T.StructField("lab_results", T.MapType(T.StringType(), LAB_RESULT_STRUCT)),
        T.StructField("notes", T.StringType()),
    ]
)

# --- the streamed envelope (pubsub_publisher.py:106,145,184) ---------
# One JSON message = entity payload + data_type discriminator. We model
# the envelope as a struct column per entity type; parsing selects the
# branch matching data_type (operators/etl.py).

ENVELOPE_FIELDS = [
    T.StructField("data_type", T.StringType()),
    T.StructField("ingest_timestamp", T.StringType()),
]


def envelope_schema() -> T.StructType:
    """Superset schema for PERMISSIVE JSON parsing of the mixed stream.

    Field union of the three entity schemas + envelope metadata +
    a corrupt-record column (the error-record semantics of
    healthcare_etl_pipeline.py:70-75).
    """
    seen: dict[str, T.StructField] = {}
    for schema in (PATIENT_VITALS_SCHEMA, INSURANCE_CLAIM_SCHEMA, EHR_RECORD_SCHEMA):
        for f in schema.fields:
            seen.setdefault(f.name, f)
    fields = list(seen.values()) + ENVELOPE_FIELDS
    fields.append(T.StructField("_corrupt_record", T.StringType()))
    return T.StructType(fields)


# --- LLM-data-pipeline tables (TESTDATA.md) --------------------------

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal: opaque payload + typed metadata (operators/multimodal.py)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)
