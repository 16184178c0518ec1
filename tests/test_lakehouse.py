"""End-to-end lakehouse test: raw JSON → zones → fact → reports,
including partition-pruning of the date-partitioned processed zone."""

from __future__ import annotations

import os

from healthcare_data_lakehouse_using_gcp_spark.lakehouse import HealthcareLakehouse
from healthcare_data_lakehouse_using_gcp_spark.sources.generator import HealthcareDataGenerator


def test_full_pipeline(spark, cfg, tmp_path):
    gen = HealthcareDataGenerator(seed=23, now=cfg.as_of)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    msgs = gen.generate_messages(400)
    (raw_dir / "batch1.json").write_text("\n".join(msgs))

    lh = HealthcareLakehouse(spark, str(tmp_path / "wh"), cfg)
    out = lh.run_all(str(raw_dir))

    assert out["etl_counts"]["vitals"] > 0
    assert out["freshness"]["recent_records"] > 0
    assert out["health"]["total_encounters"] > 0
    assert spark.table("fact_patient_encounters").count() > 0
    # every report carries a dbt-style severity status in the facade
    assert set(out["gate_statuses"]) == {
        "freshness", "quality", "monitoring", "claims", "health", "staleness"
    }
    assert all(s in ("pass", "warn", "error") for s in out["gate_statuses"].values())

    # processed zone is date-partitioned (hive-style directories)
    vit_dir = os.path.join(str(tmp_path / "wh"), "processed", "vitals")
    parts = [p for p in os.listdir(vit_dir) if p.startswith("event_date=")]
    assert len(parts) > 1

    # partition pruning: a single-date filter must scan < all partitions
    one_date = parts[0].split("=", 1)[1]
    df = spark.read.parquet(vit_dir).filter(f"event_date = DATE'{one_date}'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or df.count() < lh.read_processed("vitals").count()


def test_facade_warn_gate_does_not_raise(spark, cfg, tmp_path):
    """A warn_if breach surfaces as status 'warn' in run_reports output
    without raising (dbt_project.yml:89-94 severity semantics)."""
    import dataclasses

    from healthcare_data_lakehouse_using_gcp_spark.config import GatePolicy

    gen = HealthcareDataGenerator(seed=31, now=cfg.as_of)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "b.json").write_text("\n".join(gen.generate_messages(400)))
    # warn on any staleness at all, never error
    tight = dataclasses.replace(
        cfg, staleness_gate=GatePolicy(warn_if=0, error_if=None, store_failures=False)
    )
    lh = HealthcareLakehouse(spark, str(tmp_path / "wh"), tight)
    out = lh.run_all(str(raw_dir))
    assert out["gate_statuses"]["staleness"] == "warn"
    assert out["staleness"]["gate_status"] == "warn"
    assert "gate_failed" not in out["staleness"]


def test_incremental_append(spark, cfg, tmp_path):
    gen = HealthcareDataGenerator(seed=29, now=cfg.as_of)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "b1.json").write_text("\n".join(gen.generate_messages(100)))
    lh = HealthcareLakehouse(spark, str(tmp_path / "wh"), cfg)
    c1 = lh.run_etl(str(raw_dir))["vitals"]
    # Run-scoped counts (Count.Globally counts records processed in
    # THIS run, healthcare_etl_pipeline.py:351-355): the second run's
    # metric equals its own batch size, while the table itself is
    # append-only (WRITE_APPEND, healthcare_etl_pipeline.py:306) and
    # holds both batches.
    c2 = lh.run_etl(str(raw_dir))["vitals"]
    assert c2 == c1
    assert lh.read_processed("vitals").count() == 2 * c1


def test_bucketed_curated_join_no_exchange(spark, cfg, tmp_path):
    """ROADMAP 5: joins between patient_id-bucketed curated tables
    plan with no Exchange on either side."""
    import contextlib
    import io

    from healthcare_data_lakehouse_using_gcp_spark.lakehouse import HealthcareLakehouse

    lh = HealthcareLakehouse(spark, str(tmp_path), cfg)
    v = spark.createDataFrame(
        [("P%03d" % i, 60 + i) for i in range(50)], "patient_id string, heart_rate int"
    )
    c = spark.createDataFrame(
        [("P%03d" % (i % 40), 100.0 * i) for i in range(80)],
        "patient_id string, total_amount double",
    )
    bucketed = lh.materialize_bucketed_staging({"vitals_b": v, "claims_b": c}, num_buckets=8)
    joined = bucketed["vitals_b"].join(bucketed["claims_b"], "patient_id")

    # at test scale the planner would broadcast (hiding the bucketing);
    # disable it to exercise the sort-merge path a 100 TB join takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and the join still answers correctly
        assert joined.count() == 80  # every claim matches exactly one vitals row
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS curated_vitals_b")
    spark.sql("DROP TABLE IF EXISTS curated_claims_b")


def test_snapshot_append_packs_whole_files(spark, tmp_path):
    # Optimization r17 (guide §6, VERDICT r16 item 6): the snapshot
    # append path used to write one part file per upstream task per
    # batch (SnapshotTable._write_data never reshuffles — it also
    # serves layout commits). The caller-side rebalance by event_date
    # packs whole files and tightens per-file min/max pruning stats.
    import glob

    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.sources.snapshots import (
        SnapshotTable,
    )

    df = spark.range(0, 20000, 1, 32).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01"), (F.col("id") % 5).cast("int")).alias(
            "event_date"
        ),
    )
    st = SnapshotTable(spark, str(tmp_path / "zone"))
    st.commit_append(df.hint("rebalance", "event_date"))
    files = glob.glob(str(tmp_path / "zone" / "data" / "*" / "*.parquet"))
    # 5 dates over 20k rows: a handful of whole files, never the
    # 32-per-batch task count (AQE may split a hot date — allow 2x)
    assert 0 < len(files) <= 10, files
    assert st.read().count() == 20000


def test_cli_txn_id_with_plain_append_is_usage_error():
    # ADVICE r10: the documented incompatibility must surface as a
    # clean argparse usage error (exit code 2), never run_etl's
    # ValueError traceback — and it must fire BEFORE a SparkSession
    # is built (this test would hang for ~20 s if it didn't).
    import pytest

    from healthcare_data_lakehouse_using_gcp_spark.__main__ import main

    with pytest.raises(SystemExit) as e:
        main([
            "etl", "--raw", "/nonexistent", "--warehouse", "/nonexistent",
            "--txn-id", "t1", "--plain-append",
        ])
    assert e.value.code == 2


def test_partitioned_zone_write_packs_whole_files(spark, tmp_path):
    # Optimization r16 (guide §6): a date-partitioned append used to
    # emit one part file per (upstream task × date) — 32 partitions
    # over 5 dates wrote ~160 slivers. The rebalance-by-partition-col
    # clusters each date into whole advisory-sized files; same rows,
    # same directories.
    import glob

    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_using_gcp_spark.sources.readers import (
        write_zone_table,
    )

    df = spark.range(0, 20000, 1, 32).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01"), (F.col("id") % 5).cast("int")).alias(
            "event_date"
        ),
    )
    write_zone_table(df, str(tmp_path), "processed", "demo", ["event_date"])
    files = glob.glob(str(tmp_path / "processed" / "demo" / "*" / "*.parquet"))
    dates = {f.rsplit("/", 2)[1] for f in files}
    assert len(dates) == 5
    # one file per date at this size (AQE may split a genuinely hot
    # date — allow a small factor, never the old tasks×dates blow-up)
    assert len(files) <= 2 * len(dates), files
    assert spark.read.parquet(str(tmp_path / "processed" / "demo")).count() == 20000
