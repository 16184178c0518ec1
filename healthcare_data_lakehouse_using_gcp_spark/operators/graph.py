"""Iterative graph algorithms over edge-list DataFrames.

Beyond-reference family alongside dedup.py's connected components:
PageRank, the canonical iterative-algorithm stress test for a
DataFrame engine (joins + aggregations in a loop, lineage growth,
checkpoint discipline). Used in data-pipeline work for importance
weighting (e.g. domain/site authority for crawl curation).

Scale design (100 TB of edges):
- Each iteration is ONE shuffle join (ranks ⋈ out-weighted edges on
  src) + ONE hash aggregation (sum of contributions by dst) + a left
  join back onto the node set — all keyed exchanges, no windows, no
  driver-side data movement (only the node COUNT comes back, one
  long).
- The out-degree weighting joins into the edge frame ONCE before the
  loop and the weighted frame is cached: iterations reuse it without
  re-scanning the raw edges.
- ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
  the logical plan (the same discipline as dedup.py's pointer-jumping
  CC) — without it, Catalyst re-analyzes a plan that doubles per
  iteration.
- Semantics are the classic simplified update
  ``r' = (1-d)/N + d · Σ_in r/out_deg`` (no dangling-mass
  redistribution). On graphs where every node has an out-edge —
  e.g. any bidirectional/undirected edge list — this equals the full
  formulation; with dangling nodes the total mass decays, which is
  fine for RANKING uses. Callers needing stochastic-matrix semantics
  should add the dangling term before trusting absolute values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bidirectional_edges(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Distinct undirected edge list (both directions emitted) from a
    relationship frame — e.g. (part, supplier) co-occurrence. Output
    columns (src, dst). Every node then has out-degree ≥ 1, so
    simplified PageRank is exact on the result."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.union(rev).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over an edge list; returns (node, rank).

    See the module docstring for per-iteration plan shape and the
    simplified-update semantics. ``iterations`` is fixed (not
    convergence-tested) so two runs — and a SQL oracle unrolling the
    same number of rounds — produce identical output.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .withColumnRenamed("src", "node")
    )
    n = nodes.count()  # one long to the driver; parameterizes the literals
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("out_deg"))
    weighted = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .persist()
    )
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        summed = (
            weighted.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("__in"))
        )
        ranks = (
            nodes.join(summed.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final frame so the cached edge frame can be
    # released before returning (cache lifetime stays inside this call)
    ranks = ranks.localCheckpoint(eager=True)
    weighted.unpersist()
    return ranks
