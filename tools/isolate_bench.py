"""Isolated per-query timing with the bench.py adaptive-reps protocol.

Usage: python tools/isolate_bench.py <query> [query ...]

Runs each named corpus entry (or the special serving-path rows bench.py
installs) in ONE fresh session on local[$SPARK_GRAFT_CPUS] over
$SPARK_GRAFT_SF_DIR, with the same warmup, adaptive-reps and
cache-clear discipline as bench.py, and prints one JSON line per query
plus a summary. The noop sink (guide §1.4) is available via
SPARK_GRAFT_ISOLATE_NOOP=1 — it times every column of every row
instead of bench.py's count() action; keep the default count() when
producing numbers meant to be compared against bench.py/BENCH_r*.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_lakehouse_using_gcp_spark import corpus  # noqa: E402
from healthcare_data_lakehouse_using_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: isolate_bench.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    max_reps = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "7"))
    use_noop = os.environ.get("SPARK_GRAFT_ISOLATE_NOOP", "0") == "1"

    spark = get_spark(app_name="isolate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = corpus.queries()

    # same warmup as bench.py main()
    corpus.a1_global_count(spark, sf_dir).collect()
    from pyspark.sql import functions as F

    w = spark.range(1000).select(
        F.col("id"), F.explode(F.array(F.lit(1), F.lit(2))).alias("x")
    )
    wg = w.groupBy("id").agg(F.min("x").alias("m")).persist()
    wg.join(wg.withColumnRenamed("m", "m2"), "id").count()
    wg.unpersist()

    import bench as bench_mod  # noqa: E402  (repo-root module)

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"isolate: {name}")

        def run(n=name):
            df = qs[n](spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        runs = bench_mod._timed_runs(
            run, spark.catalog.clearCache, reps, max_reps
        )
        out[name] = min(runs)
        print(json.dumps({"query": name, "min": min(runs), "runs": runs}))
    print(json.dumps({"metric": "isolate_total", "sf_dir": sf_dir,
                      "action": "noop" if use_noop else "count",
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
