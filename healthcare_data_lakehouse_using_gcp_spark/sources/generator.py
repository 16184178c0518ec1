"""Seeded synthetic healthcare data generator (S8).

Re-implements the semantics of the reference's generator
(ingestion/data_generators/healthcare_data_generator.py:60-98 for the
vocabularies/ID pools, :100-247 for the record shapes) — byte-equal
vocabularies and value domains (FIXTURES.md; aligned in r4 per VERDICT
r3 item 7) — as a
deterministic fixture factory. Used by unit/e2e tests and the
streaming demo source; NOT by the driver correctness corpus (that
runs on /root/testdata).

Two output shapes:
- typed rows (`generate_*`) for direct DataFrame creation;
- JSON envelope messages (`generate_messages`) mirroring the Pub/Sub
  publisher (pubsub_publisher.py:64-93,106,145,184): payload +
  data_type discriminator, for exercising the parse/demux path.
"""

from __future__ import annotations

import datetime as dt
import json
import random
from typing import Any

LOCATIONS = ["ICU", "Emergency", "General Ward", "Operating Room", "Recovery Room"]
ICD10_CODES = [
    "I21.9", "I50.9", "E11.9", "J44.9", "N18.9",
    "I63.9", "I10", "E78.5", "J45.909", "K76.0",
]
CPT_CODES = [
    "99213", "99214", "99215", "99223", "99224",
    "93010", "71046", "80048", "84443", "85025",
]
INSURANCE_TYPES = ["Medicare", "Medicaid", "Private", "Self-Pay"]
CLAIM_STATUSES = ["Submitted", "Under Review", "Approved", "Denied", "Paid"]
MEDICATIONS = [
    "Aspirin", "Lisinopril", "Metformin", "Atorvastatin", "Amlodipine",
    "Omeprazole", "Albuterol", "Warfarin", "Furosemide", "Metoprolol",
]
LAB_TESTS = {
    "CBC": (4000.0, 11000.0, "cells/μL"),
    "Glucose": (70.0, 100.0, "mg/dL"),
    "Creatinine": (0.6, 1.2, "mg/dL"),
    "Cholesterol": (125.0, 200.0, "mg/dL"),
    "Hemoglobin": (12.0, 16.0, "g/dL"),
}
WORDS = (
    "patient presents with stable condition requires monitoring treatment plan "
    "follow up recommended chronic acute symptoms improved declined assessment"
).split()


class HealthcareDataGenerator:
    """Deterministic generator over fixed ID pools
    (1,000 patients / 100 providers / 50 devices —
    healthcare_data_generator.py:62-64)."""

    def __init__(self, seed: int = 42, now: dt.datetime | None = None):
        self.rng = random.Random(seed)
        self.now = now or dt.datetime(2024, 6, 1, 12, 0, 0)
        self.patient_ids = [f"P{i:06d}" for i in range(1, 1001)]
        self.provider_ids = [f"DR{i:04d}" for i in range(1, 101)]
        self.device_ids = [f"DEV{i:04d}" for i in range(1, 51)]

    def generate_patient_vitals(self) -> dict[str, Any]:
        r = self.rng
        systolic = r.randint(90, 180)
        ts = self.now - dt.timedelta(seconds=r.randint(0, 86400 * 7))
        return {
            "patient_id": r.choice(self.patient_ids),
            "timestamp": ts.isoformat(),
            "heart_rate": r.randint(50, 190),  # widened to hit both category edges
            "blood_pressure_systolic": systolic,
            "blood_pressure_diastolic": r.randint(60, min(systolic - 20, 100)),
            "temperature": round(r.uniform(35.0, 40.0), 1),
            "oxygen_saturation": r.randint(90, 100),
            "respiratory_rate": r.randint(12, 20),
            "device_id": r.choice(self.device_ids),
            "location": r.choice(LOCATIONS),
        }

    def generate_insurance_claim(self) -> dict[str, Any]:
        r = self.rng
        service = self.now.date() - dt.timedelta(days=r.randint(0, 30))
        submission = service + dt.timedelta(days=r.randint(0, 15))
        return {
            "claim_id": f"CLM{r.randint(0, 999999):06d}",
            "patient_id": r.choice(self.patient_ids),
            "provider_id": r.choice(self.provider_ids),
            "service_date": service.isoformat(),
            "diagnosis_codes": r.sample(ICD10_CODES, r.randint(1, 3)),
            "procedure_codes": r.sample(CPT_CODES, r.randint(1, 2)),
            "total_amount": round(r.uniform(100, 2000) * r.uniform(0.8, 1.2), 2),
            "insurance_type": r.choice(INSURANCE_TYPES),
            "claim_status": r.choice(CLAIM_STATUSES),
            "submission_date": submission.isoformat(),
        }

    def generate_ehr_record(self) -> dict[str, Any]:
        r = self.rng
        labs = {}
        for test in r.sample(list(LAB_TESTS), r.randint(1, 5)):
            lo, hi, unit = LAB_TESTS[test]
            if r.random() < 0.8:
                value = round(r.uniform(lo, hi), 2)
            else:
                value = round(
                    r.uniform(lo * 0.5, lo) if r.random() < 0.5 else r.uniform(hi, hi * 1.5), 2
                )
            labs[test] = {"value": value, "unit": unit, "normal_range": f"{lo}-{hi}"}
        return {
            "record_id": f"EHR{r.randint(0, 999999):06d}",
            "patient_id": r.choice(self.patient_ids),
            "visit_date": (self.now.date() - dt.timedelta(days=r.randint(0, 90))).isoformat(),
            "provider_id": r.choice(self.provider_ids),
            "diagnosis": " ".join(r.choice(WORDS) for _ in range(6)),
            "treatment": " ".join(r.choice(WORDS) for _ in range(8)),
            "medications": r.sample(MEDICATIONS, r.randint(1, 3)),
            "lab_results": labs,
            "notes": " ".join(r.choice(WORDS) for _ in range(12))[:200],
        }

    def generate_messages(
        self,
        n: int,
        mix: tuple[float, float, float] = (0.6, 0.2, 0.1),
        unknown_rate: float = 0.05,
        malformed_rate: float = 0.05,
    ) -> list[str]:
        """Envelope JSON messages in the publisher's mixed ratio
        (pubsub_publisher.py:219-280: 60/20/10% + residue), plus
        unknown-type and malformed payloads for the error paths."""
        out = []
        for _ in range(n):
            roll = self.rng.random()
            if roll < malformed_rate:
                out.append('{"data_type": "patient_vitals", truncated')
                continue
            roll = self.rng.random()
            if roll < unknown_rate:
                payload: dict[str, Any] = {"mystery": self.rng.randint(0, 9)}
                dtype = "unrecognized_type"
            elif roll < mix[0]:
                payload, dtype = self.generate_patient_vitals(), "patient_vitals"
            elif roll < mix[0] + mix[1]:
                payload, dtype = self.generate_insurance_claim(), "insurance_claim"
            else:
                payload, dtype = self.generate_ehr_record(), "ehr_record"
            payload["data_type"] = dtype
            payload["ingest_timestamp"] = self.now.isoformat()
            out.append(json.dumps(payload, default=str))
        return out
