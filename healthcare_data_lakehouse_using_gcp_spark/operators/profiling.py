"""Table profiling: per-column quality summary in one pass.

The engine-side generalization of the reference's monitoring queries
(data_quality_monitoring.sql computes null-rate/range checks for a
fixed column list; a lakehouse needs the same for ANY table): row
count, null count, distinct count, min/max per column, emitted as one
tidy row per column.

Scale design (100 TB):
- Everything is ONE global aggregation pass over the table — null
  counts, min/max are plain mergeable aggregates (map-side partials,
  a single tiny shuffle of one partial row per partition).
- Exact COUNT(DISTINCT c) per column makes Catalyst EXPAND the input
  once per distinct column (N columns → N× the scan's rows through
  the first agg). Fine for profiling a sample or a partition;
  for full-table 100 TB profiles pass ``approx=True`` — HLL++
  sketches keep the plan a true single pass with fixed-size buffers.
- min/max are cast to string AFTER aggregation (per-column typed
  aggregation underneath, one string per column at the end).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column."""
    cols = list(columns) if columns is not None else list(df.columns)
    distinct_fn = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            distinct_fn(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )
