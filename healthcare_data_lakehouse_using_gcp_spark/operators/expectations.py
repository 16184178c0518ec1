"""Declarative data-quality expectations — the dbt-schema-test /
Great-Expectations layer the reference's dbt project implies but
never ships (its dbt models carry no .yml tests; quality lives in
fixed monitoring SQL). One call turns a check spec into a tidy
result frame: (check, n_violations, passed), suitable for gating a
load (plans/reports.gate_status consumes the same shape).

Checks:
- ``not_null``: column has no NULLs
- ``unique``: column has no duplicate non-null values
- ``accepted_values``: column ⊆ a literal allow-list
- ``in_range``: numeric column within [lo, hi]
- ``foreign_key``: every non-null key in ``df`` exists in a parent
  frame (referential integrity)

Scale design (100 TB):
- ALL columnar checks (not_null / accepted_values / in_range, plus
  the count side of unique) compile into ONE aggregation pass over
  the table — conditional-count aggregates with map-side partials;
  adding a check adds a column to the agg, not a scan.
- ``unique`` rides the same pass as ``count(c) - count(distinct c)``
  (exact; swap approx_count_distinct for a 100 TB advisory check).
- ``foreign_key`` is a left-anti join per parent — the only check
  that touches a second table; parent key frames are deduplicated
  and AQE broadcasts them when small.
- The result frame is |checks| rows — driver-trivial to gate on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    accepted_values: dict[str, Sequence] | None = None,
    in_range: dict[str, tuple[float, float]] | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Run every declared expectation; one result row per check."""
    aggs = []
    names = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).cast("bigint"))
    for c in unique:
        names.append(f"unique:{c}")
        aggs.append((F.count(F.col(c)) - F.countDistinct(F.col(c))).cast("bigint"))
    for c, allowed in (accepted_values or {}).items():
        names.append(f"accepted_values:{c}")
        aggs.append(
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).isin(list(allowed)), 1)
            ).cast("bigint")
        )
    for c, (lo, hi) in (in_range or {}).items():
        names.append(f"in_range:{c}")
        aggs.append(
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).between(lo, hi), 1)
            ).cast("bigint")
        )

    spark = df.sparkSession
    results: list[DataFrame] = []
    if aggs:
        row = df.agg(*[a.alias(f"__c{i}") for i, a in enumerate(aggs)])
        stack = ", ".join(f"'{n}', __c{i}" for i, n in enumerate(names))
        results.append(
            row.select(
                F.expr(f"stack({len(names)}, {stack}) AS (check, n_violations)")
            )
        )
    for child_col, parent, parent_col in foreign_keys:
        orphans = (
            df.select(F.col(child_col)).filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(f"foreign_key:{child_col}").alias("check"), "n_violations"
            )
        )
        results.append(orphans)
    if not results:
        return spark.createDataFrame([], "check string, n_violations bigint, passed boolean")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
