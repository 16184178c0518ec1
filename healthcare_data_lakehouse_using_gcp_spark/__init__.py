"""PySpark-native analytics engine with the query/data-processing
capabilities of prasanthmerugu/Healthcare-Data-Lakehouse-using-GCP.

The reference (read-only at /root/reference) is a GCP lakehouse:
Beam ETL (dataflow/pipelines/healthcare_etl_pipeline.py), dbt SQL
models (dbt/models/), Airflow-embedded analytics SQL
(airflow/dags/healthcare_data_pipeline_dag.py). This package
re-expresses every operator in idiomatic PySpark — DataFrame/SQL
declarative plans optimized by Catalyst — plus the LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
  session     SparkSession factory (AQE, UTC, tuned shuffle)
  config      threshold config (mirrors dbt vars)
  schemas     entity StructTypes (vitals / claims / ehr / envelope)
  sources/    batch + streaming readers, seeded synthetic generator
  functions/  scalar column builders (buckets, flags, dates, scores)
  operators/  ETL (parse/validate/enrich/demux), joins (band, as-of
              nearest + backward-LOCF, interval-overlap, runtime-
              filter semi, salted), dedup, similarity/ANN, retrieval,
              text analysis + sampling/mixing, sessions/cohorts,
              graph (PageRank, components), sketches, analytics
              (percentiles, reshape, winsorize, MAD, TWAP, trends),
              profiling + drift (PSI), expectations, SCD2 + CDC,
              export, fuzzy matching, multimodal (real PNG/WAV
              decode), privacy (k-anonymity / l-diversity audits,
              generalization, suppression)
  plans/      model runner: staging views, fact table, reports
  streaming/  structured-streaming pipeline (batch/stream parity)
"""

__version__ = "0.1.0"
