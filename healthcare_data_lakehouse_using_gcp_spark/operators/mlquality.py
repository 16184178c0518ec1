"""Trainable document-quality classifier (pyspark.ml).

Beyond-reference LLM-data-pipeline stage: real corpora train a
lightweight classifier (fastText-style linear model over hashed
bag-of-words) on weak labels — "wiki-like vs crawl junk" — and keep
documents by predicted quality, rather than relying on heuristics
alone. text.classifier_quality_score is the fixed-weight heuristic
half; this module is the LEARNED half, built entirely on
distributed JVM-side pieces:

- features: text.feature_hash_embed (hashed bag-of-words, md5
  bucketing, L2-normalized — no Python in the loop);
- model: pyspark.ml LogisticRegression (JVM L-BFGS, scales with
  executors; the model itself is a dim-sized weight vector that
  broadcasts);
- scoring: Spark ML transform — whole pipeline stays declarative.

Scale design (100 TB): training runs on a SAMPLE (weak labels are
cheap to make, a linear model saturates quickly); scoring is one
embed pass + a broadcast dot product per doc. Nothing collects to
the driver except the dim-sized coefficient vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_ml_vectors(embedded: DataFrame, dim: int) -> DataFrame:
    """array<double> embedding → pyspark.ml dense VectorUDT column
    ``features`` via the built-in array_to_vector (JVM, no UDF)."""
    from pyspark.ml.functions import array_to_vector

    return embedded.withColumn("features", array_to_vector(F.col("embedding")))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit a logistic-regression quality model on (text, 0/1 label)
    rows. Returns the fitted pyspark.ml model; pair with
    score_quality. Labels are typically WEAK — a curated 'good'
    source vs raw crawl — which is exactly how production quality
    classifiers (CCNet, GPT-3's WebText filter) are trained."""
    from pyspark.ml.classification import LogisticRegression

    from .text import feature_hash_embed

    emb = feature_hash_embed(df, dim=dim, text_col=text_col, id_col=id_col)
    labeled = _to_ml_vectors(
        emb.join(
            df.select(F.col(id_col), F.col(label_col).cast("double").alias("label")),
            id_col,
        ),
        dim,
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    keep_threshold: float | None = None,
) -> DataFrame:
    """Score documents with a trained model: adds ``quality_prob``
    (P(label=1)). With ``keep_threshold`` also adds the boolean
    ``keep`` — the corpus-filter decision column. ``dim`` must match
    training (the hashed feature space is positional)."""
    from pyspark.ml.functions import vector_to_array

    from .text import feature_hash_embed

    emb = _to_ml_vectors(
        feature_hash_embed(df, dim=dim, text_col=text_col, id_col=id_col), dim
    )
    scored = (
        model.transform(emb)
        .withColumn("quality_prob", vector_to_array("probability")[1])
        .select(F.col(id_col), "quality_prob")
    )
    # left join: token-free docs have no embedding row — they surface
    # with NULL quality_prob (and keep=false) instead of vanishing
    out = df.join(scored, id_col, "left")
    if keep_threshold is not None:
        out = out.withColumn(
            "keep", F.coalesce(F.col("quality_prob") >= keep_threshold, F.lit(False))
        )
    return out
