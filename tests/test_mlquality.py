"""Trained quality classifier (operators/mlquality): pyspark.ml
logistic regression over hashed bag-of-words features. Not
SQL-expressible (iterative optimizer), so verification is
behavioral: separable weak labels recovered, probabilities ordered,
empty docs surfaced not dropped."""

import pytest

from healthcare_data_lakehouse_using_gcp_spark.operators.mlquality import (
    score_quality,
    train_quality_classifier,
)

GOOD = "the patient was admitted and the doctor reviewed the chart carefully"
JUNK = "zzz qqq xxx buy buy buy click click free free free win win"


@pytest.fixture()
def labeled(spark):
    rows = []
    for i in range(30):
        rows.append((i, f"{GOOD} visit {i % 5}", 1))
        rows.append((100 + i, f"{JUNK} spam {i % 5}", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_weak_labels(spark, labeled):
    model = train_quality_classifier(labeled, "label", dim=128)
    scored = score_quality(
        labeled, model, dim=128, keep_threshold=0.5
    ).collect()
    by_label = {0: [], 1: []}
    for r in scored:
        by_label[r["label"]].append(r["quality_prob"])
    assert min(by_label[1]) > max(by_label[0])  # fully separable fixture
    keeps = {r["doc_id"]: r["keep"] for r in scored}
    assert all(keeps[i] for i in range(30))
    assert not any(keeps[100 + i] for i in range(30))


def test_classifier_scores_unseen_and_empty_docs(spark, labeled):
    model = train_quality_classifier(labeled, "label", dim=128)
    unseen = spark.createDataFrame(
        [(1, f"{GOOD} today"), (2, f"{JUNK} now"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           score_quality(unseen, model, dim=128, keep_threshold=0.5).collect()}
    assert out[1]["quality_prob"] > out[2]["quality_prob"]
    assert out[1]["keep"] and not out[2]["keep"]
    # token-free doc surfaces with NULL prob and keep=false, not dropped
    assert out[3]["quality_prob"] is None and out[3]["keep"] is False


def test_dim_mismatch_is_callers_responsibility(spark, labeled):
    model = train_quality_classifier(labeled, "label", dim=64)
    with pytest.raises(Exception):
        score_quality(labeled, model, dim=128).collect()
