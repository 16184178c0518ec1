"""Timed mixed-mode streaming demo source (S8, streaming half).

Maps the reference's Pub/Sub publishers onto Spark's rate source:

- mixed mode (pubsub_publisher.py:219-280): each ~1 Hz tick rolls
  three INDEPENDENT probabilities — vitals 60%, claims 20%, ehr 10%
  — and emits 0-3 envelope messages accordingly.
- dedicated mode (publish_vitals_data / publish_claims_data /
  publish_ehr_data, pubsub_publisher.py:94,134,173): one entity type
  at its own interval (1 s / 2 s / 3 s), expressed as rowsPerSecond.

Determinism: the reference rolls wall-clock random; the rate source
provides (timestamp, value) and every roll and payload field derives
from xxhash64(value, seed), so a given tick always produces the same
messages — testable, and replayable across restarts. The envelope
JSON matches the publisher payloads (data_type discriminator +
entity fields), so the stream feeds `build_etl` unchanged.

Scale note: everything is built-in Column expressions — the stream
never enters Python, and the transform is stateless/narrow, so it
scales to any rowsPerSecond the sink can absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIX = (0.6, 0.2, 0.1)  # vitals / claims / ehr tick probabilities


def _roll(seed: int):
    """Deterministic uniform [0,1) per (tick, seed)."""
    return (F.pmod(F.xxhash64(F.col("value"), F.lit(seed)), F.lit(10000)) / 10000.0).cast(
        "double"
    )


def _u(seed: int, modulus: int):
    """Deterministic uniform integer in [0, modulus) per (tick, seed)."""
    return F.pmod(F.xxhash64(F.col("value"), F.lit(seed)), F.lit(modulus))


def _vitals_payload():
    """patient_vitals envelope fields (pubsub_publisher.py:104-117)."""
    systolic = (90 + _u(11, 91)).cast("int")
    return F.struct(
        F.lit("patient_vitals").alias("data_type"),
        F.format_string("P%06d", (1 + _u(10, 1000)).cast("int")).alias("patient_id"),
        F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        (50 + _u(12, 141)).cast("int").alias("heart_rate"),
        systolic.alias("blood_pressure_systolic"),
        (60 + _u(13, 41)).cast("int").alias("blood_pressure_diastolic"),
        (F.round(35.0 + _u(14, 50) / 10.0, 1)).alias("temperature"),
        (90 + _u(15, 11)).cast("int").alias("oxygen_saturation"),
        (12 + _u(16, 9)).cast("int").alias("respiratory_rate"),
        F.format_string("DEV%04d", (1 + _u(17, 50)).cast("int")).alias("device_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("ICU", "Emergency", "General Ward",
                                         "Operating Room", "Recovery Room")]),
            (1 + _u(18, 5)).cast("int"),
        ).alias("location"),
    )


def _claims_payload():
    """insurance_claim envelope fields (pubsub_publisher.py:144-158)."""
    service = F.date_sub(F.to_date("timestamp"), _u(21, 31).cast("int"))
    return F.struct(
        F.lit("insurance_claim").alias("data_type"),
        F.format_string("CLM%06d", _u(20, 1000000).cast("int")).alias("claim_id"),
        F.format_string("P%06d", (1 + _u(10, 1000)).cast("int")).alias("patient_id"),
        F.format_string("DR%04d", (1 + _u(22, 100)).cast("int")).alias("provider_id"),
        F.date_format(service, "yyyy-MM-dd").alias("service_date"),
        (F.round(100 + _u(23, 190000) / 100.0, 2)).alias("total_amount"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("Medicare", "Medicaid", "Private", "Self-Pay")]),
            (1 + _u(24, 4)).cast("int"),
        ).alias("insurance_type"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("Submitted", "Under Review", "Approved",
                                         "Denied", "Paid")]),
            (1 + _u(25, 5)).cast("int"),
        ).alias("claim_status"),
        F.date_format(F.date_add(service, _u(26, 16).cast("int")), "yyyy-MM-dd").alias(
            "submission_date"
        ),
    )


def _ehr_payload():
    """ehr_record envelope fields (pubsub_publisher.py:184-197)."""
    return F.struct(
        F.lit("ehr_record").alias("data_type"),
        F.format_string("EHR%06d", _u(30, 1000000).cast("int")).alias("record_id"),
        F.format_string("P%06d", (1 + _u(10, 1000)).cast("int")).alias("patient_id"),
        F.date_format(
            F.date_sub(F.to_date("timestamp"), _u(31, 91).cast("int")), "yyyy-MM-dd"
        ).alias("visit_date"),
        F.format_string("DR%04d", (1 + _u(32, 100)).cast("int")).alias("provider_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("stable condition", "requires monitoring",
                                         "chronic symptoms", "acute symptoms",
                                         "improved assessment")]),
            (1 + _u(33, 5)).cast("int"),
        ).alias("diagnosis"),
        F.lit("treatment plan follow up").alias("treatment"),
    )


def mix_envelopes(ticks: DataFrame, mix: tuple[float, float, float] = MIX) -> DataFrame:
    """(timestamp, value) ticks → 0-3 envelope JSON messages per tick.

    Pure transform (works on batch tick frames for tests and on the
    rate stream). Three independent rolls per tick, exactly like the
    reference's mixed loop (pubsub_publisher.py:224-277: three
    separate `random.random() < p` checks, not one categorical draw).
    Adds ingest_timestamp to every envelope like the publisher's
    attribute timestamp.
    """
    msgs = F.array(
        F.when(_roll(1) < mix[0], F.to_json(_vitals_payload())),
        F.when(_roll(2) < mix[1], F.to_json(_claims_payload())),
        F.when(_roll(3) < mix[2], F.to_json(_ehr_payload())),
    )
    kept = F.filter(msgs, lambda m: m.isNotNull())
    ingest = F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
    out = ticks.select(F.explode(kept).alias("raw"), ingest.alias("__ingest"))
    # splice ingest_timestamp into the envelope (cheap string surgery
    # beats re-serializing: the payload structs differ per type)
    return out.select(
        F.concat(
            F.expr("substring(raw, 1, length(raw) - 1)"),
            F.lit(',"ingest_timestamp":"'),
            F.col("__ingest"),
            F.lit('"}'),
        ).alias("value")
    )


def mixed_mode_stream(
    spark: SparkSession,
    rows_per_second: int = 1,
    mix: tuple[float, float, float] = MIX,
) -> DataFrame:
    """The mixed-mode publisher as an unbounded stream: ~1 tick/s
    (the reference sleeps uniform(0.5, 2.0) between batches — mean
    1.25 s; rowsPerSecond=1 is the closest constant rate) with the
    60/20/10 per-tick mix. Feed the result to `build_etl` or
    `start_etl_stream`'s transform."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return mix_envelopes(rate, mix)


def dedicated_stream(
    spark: SparkSession, data_type: str = "patient_vitals"
) -> DataFrame:
    """Dedicated-topic publishers: one entity type at its reference
    interval — vitals 1 s, claims 2 s, ehr 3 s
    (pubsub_publisher.py:94,134,173). Sub-1 Hz rates use
    rowsPerSecond=1 with a modulo filter on the tick (rate options
    are integral)."""
    intervals = {"patient_vitals": 1, "insurance_claim": 2, "ehr_record": 3}
    payloads = {
        "patient_vitals": _vitals_payload,
        "insurance_claim": _claims_payload,
        "ehr_record": _ehr_payload,
    }
    if data_type not in intervals:
        raise ValueError(f"unknown data_type: {data_type!r}")
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    every = intervals[data_type]
    ingest = F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss")
    kept = rate.filter(F.pmod(F.col("value"), F.lit(every)) == 0)
    out = kept.select(F.to_json(payloads[data_type]()).alias("raw"), ingest.alias("__ingest"))
    return out.select(
        F.concat(
            F.expr("substring(raw, 1, length(raw) - 1)"),
            F.lit(',"ingest_timestamp":"'),
            F.col("__ingest"),
            F.lit('"}'),
        ).alias("value")
    )
