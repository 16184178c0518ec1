"""Dataset-export tests (operators/export): contiguous id assignment
without a global-window bottleneck, and fixed-size shard writing."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators import export


def _scrambled(spark, n=5000):
    return (
        spark.range(n)
        .select(
            F.xxhash64("id").alias("scramble"),
            F.col("id").alias("k"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
        )
        .repartition(7, "scramble")
        .drop("scramble")
    )


def test_assign_contiguous_ids_exact_range(spark):
    df = _scrambled(spark)
    out = export.assign_contiguous_ids(df)
    ids = [r["example_id"] for r in out.select("example_id").collect()]
    assert sorted(ids) == list(range(5000))  # contiguous, no gaps/dupes


def test_assign_contiguous_ids_follows_global_order(spark):
    df = _scrambled(spark)
    out = export.assign_contiguous_ids(df, order_by=["k"])
    rows = out.select("k", "example_id").collect()
    assert all(r["example_id"] == r["k"] for r in rows)  # id == rank by k


def test_assign_contiguous_ids_no_single_reducer(spark):
    """The plan must NOT contain a SinglePartition exchange — the
    whole point vs a global ROW_NUMBER window."""
    out = export.assign_contiguous_ids(_scrambled(spark), order_by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_write_training_shards_fixed_size(spark, tmp_path):
    path = str(tmp_path / "shards")
    n_shards = export.write_training_shards(
        _scrambled(spark, 1000), path, examples_per_shard=256, order_by=["k"]
    )
    assert n_shards == 4  # ceil(1000/256)
    dirs = sorted(glob.glob(os.path.join(path, "shard_id=*")))
    assert len(dirs) == 4
    # exactly one data file per shard — the loader's streaming unit
    for d in dirs:
        files = [f for f in glob.glob(os.path.join(d, "*.parquet")) if os.path.getsize(f)]
        assert len(files) == 1, d
    back = spark.read.parquet(path)
    sizes = {
        r["shard_id"]: r["c"]
        for r in back.groupBy("shard_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert sizes == {0: 256, 1: 256, 2: 256, 3: 232}
    # global order respected: shard 0 holds the 256 smallest keys
    s0_max = back.filter(F.col("shard_id") == 0).agg(F.max("k")).first()[0]
    assert s0_max == 255


def test_shard_files_internally_sorted(spark, tmp_path):
    """Rows INSIDE each shard file follow order_by (ADVICE r5) — a
    loader streaming one file sees the sort key ascending."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "shards_sorted")
    export.write_training_shards(
        _scrambled(spark, 1000), path, examples_per_shard=256, order_by=["k"]
    )
    for d in sorted(glob.glob(os.path.join(path, "shard_id=*"))):
        f = [x for x in glob.glob(os.path.join(d, "*.parquet")) if os.path.getsize(x)][0]
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks) and len(ks) > 0


def test_shuffle_for_training_reproducible_permutation(spark):
    """r8: deterministic global training shuffle — a reproducible
    permutation (same seed = same order under any partitioning, new
    seed = different order), ids still exactly 0..n-1."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.export import (
        shuffle_for_training,
    )

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["example_id"] for r in shuffle_for_training(df, seed=1).collect()}
    b = {
        r["doc_id"]: r["example_id"]
        for r in shuffle_for_training(df.repartition(13), seed=1).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(200))
    c = {r["doc_id"]: r["example_id"] for r in shuffle_for_training(df, seed=2).collect()}
    assert c != a and sorted(c.values()) == list(range(200))
    # it actually shuffles: order differs from the identity order
    assert [a[i] for i in range(200)] != list(range(200))
