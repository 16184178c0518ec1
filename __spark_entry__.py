"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in
``healthcare_data_lakehouse_using_gcp_spark`` (corpus.py maps every
SURVEY.md §2 operator + the LLM-data-pipeline operators onto the
driver's TPC-H-ish tables; see corpus.OPERATOR_MAP for the
inventory-row → query-key mapping). Local replica of this gate:
``python tools/check_corpus.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from healthcare_data_lakehouse_using_gcp_spark import corpus  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the grouped wide
    aggregation (A2/A4, the fact-table GROUP BY shape) over lineitem."""
    return corpus.a2_wide_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-data-pipeline operators). Each callable takes (spark, sf_dir)
    and returns a DataFrame with oracle-matched column names."""
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key. Keys absent here
    (approximate/UDF-based ops: minhash-LSH, simhash, LSH top-k,
    stubbed multimodal) get the driver's weaker rows-only check."""
    return corpus.oracle_sql()
