"""Similarity search over embedding columns (training-data pipeline ops).

`embeddings(vec_id bigint, embedding array<float>, label int)`:

  * cosine_topk        — exact brute-force top-k neighbors; the baseline.
    Distributed blocked matmul (cogrouped applyInPandas over corpus-block x
    query-chunk cells) — no driver-side corpus collect, task memory bounded.
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


def _unit_matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    M = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    return M


def _topk_cell(k: int, qvec_col: str = "_qvec", cvec_col: str = "_cvec"):
    """The shared per-cell exact-cosine top-k kernel (cosine_topk's block
    cells and ivf_topk's inverted-list cells): numpy matmul over the cell,
    self-pairs masked, per-query top-k under the global
    (cosine desc, neighbor_id asc) tie rule — ONE implementation so the
    determinism contract the oracles hash can never diverge between the
    two operators."""

    def cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        qids = np.asarray(left["_qid"], dtype=np.int64)
        cids = np.asarray(right["_cid"], dtype=np.int64)
        S = _unit_matrix(left, qvec_col) @ _unit_matrix(right, cvec_col).T
        S[qids[:, None] == cids[None, :]] = -np.inf
        rows = []
        kk = min(k, len(cids))
        for r in range(len(qids)):
            idx = np.lexsort((cids, -S[r]))[:kk]
            rows.extend(
                (int(qids[r]), int(cids[j]), float(S[r, j]))
                for j in idx
                if S[r, j] > -np.inf
            )
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    return cell


def _blocked_cross(
    embeddings: DataFrame,
    queries: DataFrame,
    kernel,
    schema: str,
    n_blocks: int,
    n_qchunks: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Fully-distributed blocked cross product: corpus split into `n_blocks`
    by pmod(id), queries into `n_qchunks`; each (block, qchunk) cell is one
    cogrouped-applyInPandas task running a numpy matmul over bounded slices.
    Nothing is collected to the driver; shuffle volume is
    n_qchunks x |corpus| + n_blocks x |queries| — the standard blocked-GEMM
    tradeoff.  At scale, size n_blocks ≈ |corpus| x dim x 8B / 256MB so one
    corpus slice fits an executor task."""
    spark = embeddings.sparkSession
    blk_ids = spark.range(n_blocks).select(F.col("id").alias("_blk"))
    qch_ids = spark.range(n_qchunks).select(F.col("id").alias("_qch"))
    corpus = (
        embeddings.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cvec"),
            F.pmod(F.col(id_col), F.lit(n_blocks)).cast("long").alias("_blk"),
        )
        .join(F.broadcast(qch_ids), how="cross")
    )
    qrep = (
        queries.select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            F.pmod(F.col(id_col), F.lit(n_qchunks)).cast("long").alias("_qch"),
        )
        .join(F.broadcast(blk_ids), how="cross")
    )
    return (
        qrep.groupBy("_blk", "_qch")
        .cogroup(corpus.groupBy("_blk", "_qch"))
        .applyInPandas(kernel, schema=schema)
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 4,
    n_qchunks: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact top-k by cosine; ties break on
    neighbor id for cross-engine determinism.

    Implementation: distributed blocked brute force.  Each (corpus-block,
    query-chunk) cell computes a numpy matmul and emits its per-block top-k
    candidates; one global window re-ranks by (-cosine, neighbor_id).  The
    per-block top-k is taken under the SAME ordering, so the union provably
    contains the global top-k.  No driver-side corpus materialization
    (the round-1 `toPandas()` broadcast is gone); task memory is bounded by
    |corpus|/n_blocks + |queries|/n_qchunks rows."""
    src = queries if queries is not None else embeddings
    partial = _blocked_cross(
        embeddings, src, _topk_cell(k),
        "query_id bigint, neighbor_id bigint, cosine double",
        n_blocks, n_qchunks, vec_col, id_col,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def cosine_threshold_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 4,
    n_qchunks: int = 4,
) -> DataFrame:
    """(id_a, id_b, cosine) with cosine >= threshold and id_a < id_b — the
    EXACT embedding near-dup operator (oracle-checkable; the LSH variant
    `embedding_near_dup` approximates it at scale).  Same distributed blocked
    kernel as cosine_topk; each unordered pair lands in exactly one
    (block, qchunk) cell (corpus blocks partition the id space), so no
    distinct() is needed and no driver materialization happens.

    Cosine values are reproducible only to ~1 ULP across different n_blocks
    choices (BLAS reduction order varies with matrix shape); consumers must
    round before comparing across runs with different blocking."""

    def cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        qids = np.asarray(left["_qid"], dtype=np.int64)
        cids = np.asarray(right["_cid"], dtype=np.int64)
        S = _unit_matrix(left, "_qvec") @ _unit_matrix(right, "_cvec").T
        keep = (S >= threshold) & (qids[:, None] < cids[None, :])
        r, c = np.nonzero(keep)
        return pd.DataFrame({"id_a": qids[r], "id_b": cids[c], "cosine": S[r, c]})

    return _blocked_cross(
        embeddings, embeddings, cell,
        "id_a bigint, id_b bigint, cosine double",
        n_blocks, n_qchunks, vec_col, id_col,
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


def hyperplane_signatures_multi(
    embeddings: DataFrame,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    base_seed: int = 7,
    seed_step: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, bucket) for ALL tables in ONE kernel pass: the per-table
    plane matrices (seed = base_seed + seed_step*t, identical to calling
    hyperplane_signatures per table) are concatenated into one
    (dim, n_tables*n_planes) matrix, so the corpus is scanned once and one
    matmul serves every table — vs n_tables separate mapInPandas scans +
    a union (at 100 TB of embeddings that is n_tables-1 redundant corpus
    reads).  Bucket = 't#sig' exactly as the per-table path produced."""
    planes_all = np.concatenate(
        [
            np.random.RandomState(base_seed + seed_step * t).standard_normal(
                (dim, n_planes)
            )
            for t in range(n_tables)
        ],
        axis=1,
    )
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            bits = (M @ planes_all) > 0
            ids = np.asarray(pdf[id_col], dtype=np.int64)
            frames = []
            for t in range(n_tables):
                sig = bits[:, t * n_planes : (t + 1) * n_planes] @ weights
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "bucket": [f"{t}#{s}" for s in sig],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id bigint, bucket string"
    )


def auto_n_planes(n_rows: int, target_bucket: int = 32) -> int:
    """Plane count so that expected bucket size n / 2^planes ≈ target:
    ceil(log2(n / target_bucket)), clamped to [1, 24] (2^24 buckets per
    table is plenty at any corpus size; beyond it recall loss dominates)."""
    import math

    if n_rows <= target_bucket:
        return 1
    return max(1, min(24, math.ceil(math.log2(n_rows / target_bucket))))


def lsh_bucket_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int | str = 4,
    n_tables: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int | None = None,
    target_bucket: int = 32,
) -> DataFrame:
    """Approximate top-k: union of n_tables independent hyperplane tables,
    candidates = bucket-mates, exact cosine re-rank.  Recall grows with
    n_tables; cost stays near-linear (no cross join).

    Sizing: expected bucket size = n / 2^n_planes, so pick
    n_planes ≈ log2(n / target_bucket) — or pass n_planes="auto" to have
    the operator size itself from a corpus count (one extra cheap job;
    parquet count is metadata-only).  The int defaults target the test
    corpus (n≈500, weak neighbors at cosine≈0.37 → shallow planes, many
    tables); at 10^9 rows auto picks ~25→24 planes and the same n_tables.

    max_bucket guards the DEGENERATE case sizing can't fix: a mass of
    identical/near-identical vectors (zero rows, templated embeddings)
    lands in one bucket in EVERY table regardless of plane count, turning
    the self-join quadratic — the same failure minhash_lsh_pairs and
    simhash_near_pairs cap with a row_number window, mirrored here
    (deterministic by vec_id; capped-out vectors still get candidates
    from tables where their bucket is cold)."""
    if n_planes == "auto":
        n_planes = auto_n_planes(embeddings.count(), target_bucket)
    base = with_unit_norm(embeddings.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("unit")
    )
    buckets = hyperplane_signatures_multi(
        embeddings, n_planes=n_planes, n_tables=n_tables, dim=dim,
        vec_col=vec_col, id_col=id_col,
    )
    if max_bucket is not None:
        wb = Window.partitionBy("bucket").orderBy("vec_id")
        buckets = (
            buckets.withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") <= max_bucket)
            .drop("rn")
        )
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


# ------------------------------------------------------------------ IVF ANN


def ivf_anchor_matrix(n_centroids: int, dim: int, seed: int = 11) -> np.ndarray:
    """Seeded random coarse-quantizer anchors (n_centroids, dim).

    Deliberately NOT normalized and NOT data-trained: argmax of dot(v, c)
    over centroids is what both the kernel and the DuckDB oracle compute
    (per-query scale-invariant, so no normalization is needed), and a
    data-free seeded quantizer lets the oracle embed the exact matrix as
    double literals — same trick as the LSH plane matrices.  For a trained
    quantizer use ivf_train_centroids and pass the result via
    `centroids=`."""
    return np.random.RandomState(seed).standard_normal((n_centroids, dim))


def ivf_probe_assignments(
    embeddings: DataFrame,
    centroids: np.ndarray,
    n_probe: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cid, probe_rank) for each vector's n_probe nearest coarse
    centroids, probe_rank 1-based in (dot desc, cid asc) order — one Arrow
    kernel pass over the corpus; the rank-1 row doubles as the vector's
    inverted-list assignment, so IVF needs exactly ONE corpus scan.

    np.argsort(-dots, kind="stable") reproduces the (dot desc, cid asc)
    tie rule of the SQL oracle's row_number window exactly."""
    C = centroids.astype(np.float64).T  # (dim, n_centroids)
    n_probe = min(n_probe, centroids.shape[0])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            dots = M @ C  # (n, n_centroids)
            order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), n_probe),
                    "cid": order.reshape(-1).astype(np.int32),
                    "probe_rank": np.tile(
                        np.arange(1, n_probe + 1, dtype=np.int32), n
                    ),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id long, cid int, probe_rank int"
    )


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    dim: int = 64,
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic driver-side SPHERICAL k-means over a BOUNDED sample —
    the IVF coarse-quantizer trainer (FAISS-style train-on-sample; the
    sample cap mirrors the reference's driver-side trainer precedent).

    Spherical, not plain Lloyd: search-time assignment is max inner
    product (ivf_probe_assignments), and with unequal-norm centroids
    max-dot and min-L2 disagree — plain Lloyd means shrink toward the
    origin for diffuse clusters, so large-norm centroids would steal
    search-time traffic from the lists the training optimized.  Training
    on unit vectors and re-normalizing centroids each iteration makes
    max-dot and min-angle identical at train and search time.  Sample =
    first `sample_n` rows by id (deterministic under any partitioning);
    init = seeded permutation of the sample; an emptied cluster keeps its
    previous centroid.  Returns (n_centroids, dim) float64, unit rows."""
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_n)
        .toPandas()
    )
    X = _unit_matrix(pdf, vec_col)
    rng = np.random.RandomState(seed)
    C = X[rng.permutation(len(X))[:n_centroids]].copy()
    for _ in range(iters):
        a = (X @ C.T).argmax(axis=1)
        for c in range(n_centroids):
            members = X[a == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-30)
    return C


def ivf_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = 11,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_qchunks: int = 4,
) -> DataFrame:
    """Approximate top-k via an INVERTED FILE index (IVF): coarse-quantize
    the corpus into n_centroids inverted lists (one scan), probe each
    query's n_probe nearest lists, exact cosine re-rank the candidates.

    The scale shape (the FAISS IVF-Flat search loop, distributed): each
    corpus vector lives in exactly ONE inverted list, so (query, neighbor)
    candidates are unique by construction — no dedup shuffle (the LSH
    sibling needs a distinct because a pair can collide in many tables) —
    and the re-rank is a cogrouped numpy MATMUL per (list, query-chunk)
    cell, never a per-candidate-pair join of the vector arrays: shuffle
    volume is |corpus| x n_probe + |corpus| x n_qchunks vectors instead of
    2 vectors per candidate (candidates ≈ |corpus| x n_probe x list_len).
    A/B at sf0.1 (5k vectors, warm JVM): per-pair join + JVM F.aggregate
    dot 12.8s vs this kernel 3.3s — and the gap widens with list length,
    since the join ships O(candidates) arrays where the kernel ships
    O(corpus).
    Each cell emits only its per-query top-k under the global
    (-cosine, neighbor_id) ordering, so the final window provably sees the
    true top-k; query chunking bounds hot-list cell width.  Expected list
    length is n / n_centroids: at 10^9 rows pick n_centroids ≈ n / 10^4
    and n_probe 8-32 for the recall/cost trade.  With a trained quantizer
    (ivf_train_centroids) lists follow the data distribution and recall
    rises at the same cost."""
    C = centroids if centroids is not None else ivf_anchor_matrix(n_centroids, dim, seed)
    # probes feeds two plan branches (query side + list side); without a
    # materialization point each branch re-runs the matmul+argsort corpus
    # pass (no exchange below it => no ReusedExchange), so "one corpus
    # scan" would silently become two.  Eager persist, same rationale as
    # the ER blocking cache.
    probes = ivf_probe_assignments(
        embeddings, C, n_probe, vec_col=vec_col, id_col=id_col
    ).persist()
    probes.count()
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec")
    )
    # probe side: query vector rides once per probed list
    qside = (
        probes.join(base, "vec_id")
        .select(
            F.col("vec_id").alias("_qid"), F.col("_vec").alias("_qvec"),
            "cid",
            F.pmod("vec_id", F.lit(n_qchunks)).cast("long").alias("_qch"),
        )
    )
    # list side: members (rank-1 probe row IS the assignment), replicated
    # per query chunk (n_qchunks copies of the corpus — cheap next to the
    # candidate count, and it keeps a hot list from being one giant task)
    qch_ids = embeddings.sparkSession.range(n_qchunks).select(
        F.col("id").alias("_qch")
    )
    # rename the list side's key: both sides descend from `probes`, and a
    # shared `cid` attribute makes the cogroup plan ambiguous to resolve
    lside = (
        probes.where(F.col("probe_rank") == 1)
        .join(base, "vec_id")
        .select(
            F.col("vec_id").alias("_cid"), F.col("_vec").alias("_cvec"),
            F.col("cid").alias("_lcid"),
        )
        .join(F.broadcast(qch_ids), how="cross")
    )

    partial = (
        qside.groupBy("cid", "_qch")
        .cogroup(lside.groupBy("_lcid", "_qch"))
        .applyInPandas(
            _topk_cell(k),
            schema="query_id bigint, neighbor_id bigint, cosine double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def semdedup(
    embeddings: DataFrame,
    eps: float = 0.95,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 11,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): semantic near-dup removal
    in embedding space — coarse-cluster the corpus, compute pairwise
    cosine WITHIN each cluster only, connect pairs >= eps into duplicate
    groups, and keep one representative per group.  The paper keeps the
    member with the LOWEST cosine to its cluster centroid (the least
    prototypical example preserves diversity); ties break on vec_id.

    100 TB shape (the paper's own): the quadratic pairwise work is
    confined to one cluster at a time — with n_centroids ~ n / 10^4 every
    cluster cell is a bounded numpy matmul, and clusters are
    embarrassingly parallel Arrow groups.  One corpus scan assigns
    clusters (ivf_probe_assignments rank-1, shared with IVF); one shuffle
    groups members by cluster; nothing global is quadratic.

    Same disclosed oracle risk class as q_ann_ivf: assignment, the eps
    threshold, and the min-cos representative compare raw float dots, so
    a near-tie below the engines' summation-order gap could diverge; no
    such near-tie exists in the gate corpora.

    Output: (vec_id, cid, cos_c, keep_id, kept) for EVERY vector —
    singletons keep themselves; cos_c is the cosine to the assigned
    centroid, rounded 4dp for display (decisions use the exact value)."""
    C = (
        centroids
        if centroids is not None
        else ivf_anchor_matrix(n_centroids, dim, seed)
    ).astype(np.float64)
    Cu = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    asg = ivf_probe_assignments(embeddings, C, 1, vec_col=vec_col, id_col=id_col)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec")
    )
    members = asg.join(base, "vec_id").select("vec_id", "cid", "_vec")

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        cid = int(pdf["cid"].iloc[0])
        X = np.stack(pdf["_vec"].map(np.asarray).to_list()).astype(np.float64)
        U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        cos_c = U @ Cu[cid]
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        S = U @ U.T
        ii, jj = np.where(np.triu(S >= eps, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n)])
        ids = pdf["vec_id"].to_numpy()
        keep = np.empty(n, dtype=np.int64)
        for r in np.unique(roots):
            m = np.where(roots == r)[0]
            # least-prototypical representative: min (cos_c, vec_id)
            best = m[np.lexsort((ids[m], cos_c[m]))[0]]
            keep[m] = ids[best]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cid": np.full(n, cid, dtype=np.int32),
                "cos_c": np.round(cos_c, 4),
                "keep_id": keep,
                "kept": keep == ids,
            }
        )

    return members.groupBy("cid").applyInPandas(
        cell, schema="vec_id long, cid int, cos_c double, keep_id long, kept boolean"
    )
