"""Global physical-plan invariants swept over EVERY corpus entry.

Individual operators already pin their own plan shapes (span dedup,
incremental index, chunker, export, retrieval); this sweep enforces
the two engine-wide rules no future entry may silently break:

1. **No non-broadcast cartesian product.** A `CartesianProduct` node
   is the O(n²)-shuffle scale killer; every pairwise-shaped operator
   here must reach its pairs through an equi-key (bands, buckets,
   clusters) or a broadcast of a provably tiny side
   (BroadcastNestedLoopJoin against a centroid/query/stats frame is
   fine — its build side is bounded by construction).
2. **No row-at-a-time Python UDF.** `BatchEvalPython` (pickled
   per-row eval) must never appear; Python only enters plans through
   Arrow-vectorized nodes (ArrowEvalPython / MapInPandas /
   FlatMapGroupsInPandas) or stays out entirely.

The sweep plans (and, where an entry materializes scratch input,
partially executes) every queries() entry at sf0.001 — the same
frames the driver and the tail sweep check for value-correctness get
checked here for plan hygiene.
"""

from __future__ import annotations

import os

import pytest

from healthcare_data_lakehouse_using_gcp_spark import corpus

SF_DIR = "/root/testdata/sf0.001"

_ALL = list(corpus.queries())


@pytest.mark.parametrize("name", _ALL)
def test_no_cartesian_and_no_rowwise_python(spark, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    df = corpus.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
