"""Similarity search over embedding columns (array<float>).

Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star): brute-force cosine top-k as the exact baseline, plus a
random-hyperplane-LSH bucketed variant as the 100 TB scale path.

Scale design:
- Query side is broadcast (queries ≪ corpus); the corpus never
  shuffles for brute force — each partition scores its local vectors
  and a single top-k reduction (window on query_id) finishes it.
- Dot products use built-in higher-order functions (zip_with +
  aggregate) → JVM-side, no Python in the hot loop.
- The LSH variant buckets both sides on sign-bit signatures so only
  same-bucket pairs are scored: shuffle linear in corpus size.
- embedding-cosine near-dup dedup reuses the same machinery
  corpus-vs-corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a, b):
    """Cosine similarity between two array<float|double> columns.

    Operands are cast to double element-wise (float32 accumulation
    would drift from any float64 oracle).
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × scan corpus.

    Returns (query_id, vec_id, cosine, rank). Ties break on vec_id
    for determinism.
    """
    from .dedup import ensure_parallelism

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = ensure_parallelism(corpus).join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine_similarity_col(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_signature_col(vec_col, planes: list[list[float]]):
    """Sign-bit signature: bit i = 1 if vec · plane_i > 0. Returns a
    bigint bucket id (num_planes ≤ 63)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(F.transform(vec_col, lambda x: x.cast("double")), lit_plane) > 0).cast(
            "long"
        )
        sig = sig + F.shiftleft(bit, i)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket
    with the query in at least one of ``num_tables`` hash tables.

    Recall/cost dial: more tables → higher recall, more candidates.
    """
    if dim is None:
        first = corpus.select(F.size(vec_col)).first()
        dim = first[0]
    tables = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]

    from .dedup import ensure_parallelism

    def with_buckets(df: DataFrame, keep_cols: list[str]) -> DataFrame:
        df = ensure_parallelism(df)
        return df.select(
            *keep_cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_id"),
                            lsh_signature_col(F.col(vec_col), tables[t]).alias("bucket"),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        ).select(*keep_cols, "tb.table_id", "tb.bucket")

    cb = with_buckets(corpus, [id_col, vec_col])
    qb = with_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")).withColumnRenamed(
            "__qvec", vec_col
        ),
        [query_id_col, vec_col],
    ).withColumnRenamed(vec_col, "__qvec")
    cands = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .select(query_id_col, id_col, vec_col, "__qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col,
        id_col,
        cosine_similarity_col(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    besides sign-LSH.

    Index build: sample n_centroids vectors, refine with a few Lloyd
    iterations (assignment via an Arrow-batched numpy matmul — the
    one place vectorized Python beats built-ins; centroid update is a
    plain groupBy/avg). Search: each query probes its n_probe nearest
    centroids and scores only those inverted lists.

    Scale: assignment is a narrow pass (no shuffle); the index adds
    one small-int column; search shuffles only the probed lists.
    Recall dial: n_probe/n_centroids.
    """
    import numpy as np
    import pandas as pd

    from .dedup import ensure_parallelism

    # --- sample initial centroids (deterministic: lowest ids) -------
    sample = (
        corpus.orderBy(F.col(id_col)).limit(n_centroids).select(vec_col).collect()
    )
    centroids = np.array([r[0] for r in sample], dtype=np.float64)

    def assign_udf(cents):
        c = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

        def _assign(vecs):
            m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

        return F.pandas_udf(_assign, T.IntegerType())

    par = ensure_parallelism(corpus.select(id_col, vec_col))
    # --- Lloyd refinement -------------------------------------------
    for _ in range(lloyd_iters):
        assigned = par.select(
            id_col, vec_col, assign_udf(centroids)(F.col(vec_col)).alias("cid")
        )
        means = (
            assigned.select(
                "cid", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .select("cid", F.transform("ms", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        for row in means:
            centroids[row["cid"]] = np.array(row["centroid"], dtype=np.float64)

    indexed = par.select(
        id_col, vec_col, assign_udf(centroids)(F.col(vec_col)).alias("cid")
    )

    # --- query probing ----------------------------------------------
    c_norm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def _probe_fn(vecs):
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c_norm.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    _probe = F.pandas_udf(_probe_fn, T.ArrayType(T.IntegerType()))

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(_probe(F.col(vec_col))).alias("cid"),
    )
    cands = indexed.join(F.broadcast(q), "cid").select(
        query_id_col,
        id_col,
        cosine_similarity_col(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (corpus vs itself) via
    shared LSH buckets; exact cosine verification above threshold."""
    from .dedup import ensure_parallelism

    first = df.select(F.size(vec_col)).first()
    dim = first[0]
    tables = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]
    b = ensure_parallelism(df).select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        lsh_signature_col(F.col(vec_col), tables[t]).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, vec_col, "tb.table_id", "tb.bucket")
    # persist: both sides of the self-join read this subtree
    b = b.persist()
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table_id") == F.col("r.table_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("va"),
            F.col(f"r.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cosine", cosine_similarity_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
