"""Blocking stage: mentions -> candidate pairs (SURVEY.md §2.3 J1-J3).

The reference generates every antecedent pair per document
(DocumentGraph.scala:21-24) and prunes by distance / coarse score
(DocumentGraph.scala:91-115, CorefPruner.scala:36-47).  At 10^12 web pages
the triangular join cannot be materialized, so pruning becomes *blocking*,
run over the **distinct normalized surfaces** rather than mention instances:

  1. mentions with an identical norm_name are linked a priori ("exact" pass —
     the reference's decisive exact-string-match feature,
     PairwiseIndexingFeaturizerJoint.scala:241-246). Distinct-surface count is
     orders of magnitude below mention count, so every downstream join is on
     the small deduped table — the single most important scale decision here.
  2. sorted-neighborhood pass over distinct surfaces: explode block keys
     (last token / first token / acronym — cf. AbbreviationHandler.scala:7-62),
     sort within key, pair within a row-offset band (the reference's distance
     window, DocumentGraph.scala:91-102).
  3. MinHash-LSH pass over character shingles of the surface: deterministic
     seeded minhash signatures, banded; pairs sharing a (band, bucket) are
     candidates (the reference's coarse-model cascade, CorefPruner.scala:36-47).

Hot blocks (head-domain skew / common surnames) are defused either by a
row_number cap (default) or, with cfg.salt_hot_blocks, by deterministic
salting of over-threshold keys into sorted sub-blocks (no rows dropped,
but cross-sub-block pairs within a hot key are not generated — a bounded
recall trade, see tests/test_blocking_salt.py);
AQE skew-join handles residual join-side imbalance.
Everything below is expressed as DataFrame ops (joins, windows, explode); the
minhash pass included — the whole stage runs JVM-side in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from berkeley_entity_spark.config import PipelineConfig

# ----------------------------------------------------------- distinct surfaces


def distinct_surfaces(mentions: DataFrame) -> DataFrame:
    """(norm_name, node_id, rep_url, rep_mention) — one row per distinct
    surface; node_id is a content hash (stable under partitioning), the
    representative mention is the min mention_id (reference convention:
    first mention represents the cluster, OrderedClustering.scala:70-77)."""
    return (
        mentions.groupBy("norm_name")
        .agg(
            F.min("mention_id").alias("rep_mention"),
            F.min_by("url", "mention_id").alias("rep_url"),
            F.count(F.lit(1)).alias("n_mentions"),
            F.max(F.coalesce("is_acr", F.lit(False))).alias("is_acr"),
        )
        .withColumn("node_id", F.xxhash64("norm_name"))
    )


# ----------------------------------------------------------------- block keys


def explode_block_keys(df: DataFrame, id_col: str, norm_col: str = "norm_name") -> DataFrame:
    """Explode each normalized surface into its blocking keys.

    key passes: last token (surname / suffix), first token (org stem /
    first name), acronym (initial letters — links "GDC" to
    "global data corporation", cf. sem/AbbreviationHandler.scala).
    Pure column expressions — stays inside whole-stage codegen.
    """
    toks = F.split(F.col(norm_col), " ")
    acr = F.array_join(F.transform(toks, lambda t: F.substring(t, 1, 1)), "")
    keyed = df.select(
        F.col(id_col),
        F.col(norm_col),
        F.array_distinct(
            F.array(
                F.concat(F.lit("L:"), F.element_at(toks, -1)),
                F.concat(F.lit("F:"), F.element_at(toks, 1)),
                F.concat(F.lit("A:"), acr),
                # single-token surfaces may *be* an acronym: index them under
                # the acronym key space too so "gdc" meets "global data corp"
                F.when(F.size(toks) == 1, F.concat(F.lit("A:"), F.element_at(toks, 1))),
            )
        ).alias("keys"),
    )
    return keyed.select(
        F.col(id_col), F.col(norm_col), F.explode("keys").alias("block_key")
    ).where(F.col("block_key").isNotNull() & (F.length("block_key") > 2))


def surface_block_keys(surfaces: DataFrame) -> DataFrame:
    return explode_block_keys(surfaces, "node_id", "norm_name")


# ------------------------------------------------------------------- minhash


def char_shingles_col(norm_col: str = "norm_name", k: int = 3):
    """Distinct char k-shingles of the space-padded surface as an array
    column.  Pure SQL expressions (substr over a sequence) — whole-stage
    codegen, and byte-identical to DuckDB's substr over the same string."""
    padded = F.concat(F.lit(" "), F.col(norm_col), F.lit(" "))
    return F.when(F.length(padded) <= k, F.array(padded)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - (k - 1)),
                lambda i: padded.substr(i, F.lit(k)),
            )
        )
    )


def minhash_signatures(surfaces: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(node_id, norm_name, block_key='MH:band:bucket') via seeded minhash
    over char shingles — the coarse-cascade analog (CorefPruner.scala:36-47).

    Engine-portable string-min trick (same family as dedup.minhash_lsh_pairs):
    minhash_i = min(md5(i || '|' || shingle)) — md5 is a uniform permutation
    of the shingle space per seed, and the lexicographic min over hex digests
    is a valid min-hash.  Bucket per band = concat of its `rows` mins.

    Two wins over the former blake2b Arrow kernel: (1) the whole signature
    runs inside whole-stage codegen (explode + hash-agg min; the dedup
    sibling measured ~4x faster than interpreted/Python paths), so the ER
    blocking stage now contains NO Python; (2) the signature is reproducible
    in ANY SQL engine, which lets the driver's DuckDB oracle re-derive the
    full blocking stage end-to-end (q_er_clusters)."""
    k, rows, bands = cfg.shingle_k, cfg.minhash_rows, cfg.minhash_bands
    n_hashes = rows * bands
    ex = surfaces.select(
        "node_id", "norm_name",
        F.explode(char_shingles_col("norm_name", k)).alias("sh"),
    )
    # Hash inline per occurrence.  A/B-measured against the "hash each
    # DISTINCT shingle once + broadcast-join the digests back" variant at
    # sf0.1 (21k surfaces, interleaved min-of-3): inline 0.26s vs vocab-join
    # 1.07s — codegen md5 is cheap enough that the extra distinct + join
    # stages cost 4x more than the redundant hashing saves, and the digest
    # table (|vocab| x n_hashes x 32-char hex) is a tens-of-MB broadcast at
    # web charsets.  Inline also keeps the stage a single codegen span.
    sig = ex.groupBy("node_id", "norm_name").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.concat_ws(
            ":", F.lit("MH"), F.lit(str(b)),
            *[F.col(f"mh{b * rows + r}") for r in range(rows)],
        ).alias("bk")
        for b in range(bands)
    ]
    return sig.select(
        "node_id", "norm_name",
        F.explode(F.array(*band_cols)).alias("block_key"),
    )



# ------------------------------------------------------------------ assembly


def candidate_pairs(
    mentions: DataFrame,
    cfg: PipelineConfig,
    surfaces: DataFrame | None = None,
    n_surfaces: int | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """Full blocking stage: distinct surfaces -> union of passes -> dedup.

    Both passes go through ONE ranked window + ONE band self-join: LSH bucket
    keys ("MH:band:bucket") are unioned into the block-key table with the
    sorted-neighborhood keys ("L:/F:/A:"), and the per-key pairing width is a
    column (full-width inside an LSH bucket — its members are already
    near-dups; `neighborhood` rows inside a sorted key).  One shuffle sort +
    one join instead of two of each — at web scale this halves the shuffle
    count of the dominant stage; at bench scale it halves its fixed job cost.

    prune=(weights, threshold): valid ONLY when the consumer keeps
    above-threshold edges (the q_er_clusters decode path).  Applies the
    admissible codegen score bound (scoring.prune_never_match) to the RAW
    self-join output, BEFORE the unordered-pair dedup groupBy — the pair
    stream shrinks by the prune rate (96% at sf0.1) before it ever hits the
    dedup exchange or the attribute joins, which are the largest
    intermediates of the ER spine at web scale.  Survivor pairs are
    identical to pruning after dedup: the bound is a pure function of the
    (norm, acr) pair, the same for every duplicate row of that pair.

    Output: (block_key, node_a, node_b, norm_a, norm_b, pass) at the distinct
    surface level, plus representative mention/url columns for the FIXTURES
    candidate_pairs contract.
    """
    if surfaces is None:
        surfaces = distinct_surfaces(mentions).persist()
    sn_keys = surface_block_keys(surfaces)
    mh_keys = minhash_signatures(surfaces, cfg)
    keys = sn_keys.unionByName(mh_keys)
    if prune is not None:
        # the bound's acronym term needs the exact is_acr flags to stay
        # admissible for negative weights; a broadcast lookup keeps the
        # join map-side (falls back to shuffle past the byte gate — the
        # same join the unpruned tail pays twice anyway)
        from berkeley_entity_spark.util import maybe_broadcast

        acr_lut = surfaces.select("node_id", "is_acr")
        if n_surfaces is not None:
            acr_lut = maybe_broadcast(acr_lut, n_surfaces)
        keys = keys.join(acr_lut, "node_id")

    if cfg.salt_hot_blocks:
        # head-domain skew: a hot key (mega-surname, boilerplate LSH bucket)
        # would otherwise sort in ONE window task.  Salt only keys above the
        # threshold (broadcast the hot-key list — it is tiny by definition)
        # into deterministic sorted sub-blocks.  No rows are dropped, but
        # pairs between rows landing in different sub-blocks of the same hot
        # key are not generated (the salt is a hash, so neighborhood locality
        # does not survive the split) — a bounded recall trade vs the cap.
        # `keys` (which embeds the minhash signature agg) feeds BOTH the
        # hot aggregate and the join below; persist so it computes once.
        keys = keys.persist()
        hot = (
            keys.groupBy("block_key")
            .agg(F.count(F.lit(1)).alias("_kn"))
            .where(F.col("_kn") > cfg.max_block_size)
            .select("block_key", F.lit(True).alias("_hot"))
        )
        keys = (
            keys.join(F.broadcast(hot), "block_key", "left")
            .withColumn(
                "salt",
                F.when(
                    F.col("_hot"),
                    F.pmod(F.xxhash64("node_id"), F.lit(cfg.salt_buckets)).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("_hot")
        )
    else:
        keys = keys.withColumn("salt", F.lit(0))

    w = Window.partitionBy("block_key", "salt").orderBy("norm_name", "node_id")
    ranked = keys.withColumn("rn", F.row_number().over(w))
    if not cfg.salt_hot_blocks:
        ranked = ranked.where(F.col("rn") <= cfg.max_block_size)
    # Materialize the cache BEFORE the self-join: with a lazy persist the
    # two join branches race — each scan task evaluates the window+minhash
    # DAG until the cache fills, so most of the keys stage computes twice.
    # One count (the rows are already in memory bytes) guarantees both
    # sides read the cache.  At web scale this is also the right call:
    # the ranked table is read exactly twice, and recomputing the minhash
    # agg is strictly more expensive than one in-memory materialization.
    ranked = ranked.persist()
    ranked.count()
    if cfg.salt_hot_blocks:
        # free the keys cache — the minhash signatures never recompute.
        keys.unpersist()
    if prune is not None:
        # Per-surface derived values for the prune bound, computed ON TOP of
        # the cached narrow table (so they never hit cache bytes — measured
        # ~1s slower to cache the wide rows than to re-derive them lazily):
        # each join side derives them in the same codegen span as its cache
        # scan, once per KEY ROW, not per candidate pair (evaluated per
        # pair, the bound re-ran the regex split + array builds ~8x per
        # side — measured 3x slower than not pruning at all).
        toks = F.split(F.col("norm_name"), " ")
        ranked = ranked.withColumns(
            {
                "_dt": F.array_distinct(toks),
                "_first": F.element_at(toks, 1),
                "_last": F.element_at(toks, -1),
                "_ntok": F.size(toks),
                "_acr_s": F.array_join(
                    F.transform(toks, lambda t: F.substring(t, 1, 1)), ""
                ),
                "_ln": F.length("norm_name"),
            }
        ).withColumn("_ndt", F.size("_dt"))
    width = F.when(
        F.col("a.block_key").startswith("MH:"), F.lit(cfg.max_block_size)
    ).otherwise(F.lit(cfg.neighborhood))
    a, b = ranked.alias("a"), ranked.alias("b")
    a_first = F.col("a.node_id") < F.col("b.node_id")
    pair_cols = [
        F.col("a.block_key").alias("block_key"),
        F.least("a.node_id", "b.node_id").alias("node_a"),
        F.greatest("a.node_id", "b.node_id").alias("node_b"),
        F.when(F.col("a.block_key").startswith("MH:"), F.lit("lsh"))
        .otherwise(F.lit("sortedneighborhood"))
        .alias("pass"),
    ]
    if prune is not None:
        # surface attributes oriented by node order, available pre-dedup
        pair_cols += [
            F.when(a_first, F.col("a.norm_name")).otherwise(F.col("b.norm_name")).alias("norm_a"),
            F.when(a_first, F.col("b.norm_name")).otherwise(F.col("a.norm_name")).alias("norm_b"),
            F.when(a_first, F.col("a.is_acr")).otherwise(F.col("b.is_acr")).alias("acr_a"),
            F.when(a_first, F.col("b.is_acr")).otherwise(F.col("a.is_acr")).alias("acr_b"),
        ]
    joined = a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.salt") == F.col("b.salt"))
        & (F.col("b.rn") > F.col("a.rn"))
        & (F.col("b.rn") <= F.col("a.rn") + width),
    ).where(F.col("a.node_id") != F.col("b.node_id"))
    if prune is not None:
        from berkeley_entity_spark.operators.scoring import prune_bound_prepped

        # The bound filter MUST stay a post-join Filter: OR-ing with an
        # always-false NON-DETERMINISTIC term (monotonically_increasing_id,
        # not rand — Spark 4 constant-folds rand's known [0,1) bounds) makes
        # the predicate unsplittable and non-pushable, else Catalyst folds
        # it into the join condition AHEAD of the cheap rn-range conjuncts
        # and every same-block candidate pays the levenshtein (measured 5x
        # slower).  The Or short-circuits, so the term never evaluates.
        w_arr, threshold = prune
        pred = prune_bound_prepped(w_arr, threshold)
        joined = joined.where(pred | (F.monotonically_increasing_id() < F.lit(-1)))
    pairs = joined.select(*pair_cols)
    # one candidate per unordered node pair; keep the first pass name
    # deterministically (min) so reruns are identical
    attr_aggs = [F.min("block_key").alias("block_key"), F.min("pass").alias("pass")]
    if prune is not None:
        # functionally dependent on (node_a, node_b); min = the single value
        attr_aggs += [
            F.min("norm_a").alias("norm_a"), F.min("norm_b").alias("norm_b"),
            F.min("acr_a").alias("acr_a"), F.min("acr_b").alias("acr_b"),
        ]
    pairs = pairs.groupBy("node_a", "node_b").agg(*attr_aggs)
    # the attribute lookups broadcast when the (already counted) surface
    # table is small — map-side joins instead of pair shuffles; gated on
    # rows AND estimated bytes (string columns can blow past the executor
    # budget long before the row ceiling); at 10^12 pages the table exceeds
    # both and we shuffle
    from berkeley_entity_spark.util import maybe_broadcast

    if prune is not None:
        # norm/acr already ride on the pair rows; only url/mention remain
        su = surfaces.select("node_id", "rep_url", "rep_mention")
        if n_surfaces is not None:
            su = maybe_broadcast(su, n_surfaces)
        return (
            pairs.join(su.toDF("node_a", "url_a", "mention_a"), "node_a")
            .join(su.toDF("node_b", "url_b", "mention_b"), "node_b")
            .select(
                "block_key", "node_a", "node_b", "norm_a", "norm_b", "acr_a",
                "acr_b", "url_a", "mention_a", "url_b", "mention_b", "pass",
            )
        )
    s = surfaces.select("node_id", "norm_name", "rep_url", "rep_mention", "is_acr")
    if n_surfaces is not None:
        s = maybe_broadcast(s, n_surfaces)
    return (
        pairs.join(
            s.toDF("node_a", "norm_a", "url_a", "mention_a", "acr_a"), "node_a"
        )
        .join(s.toDF("node_b", "norm_b", "url_b", "mention_b", "acr_b"), "node_b")
        .select(
            "block_key", "node_a", "node_b", "norm_a", "norm_b", "acr_a",
            "acr_b", "url_a", "mention_a", "url_b", "mention_b", "pass",
        )
    )



# ---------------------------------------------------------------- phonetic


def soundex_key_col(name_col="norm_name"):
    """American-Soundex-class phonetic key as a pure expression chain —
    the classic record-linkage blocking pass that catches spelling
    variants (smith/smyth, catherine/kathryn) the exact and
    sorted-neighborhood keys miss.

    Deliberately implemented as the SAME translate + quantifier-only
    regexp pipeline both engines run (RE2 has no backreferences or
    lookahead, so the usual '(\\d)\\1+' collapse is written as one
    'd{2,}' replace per digit): code letters (h/w -> 9, vowels+y -> 0),
    strip the 9s (implements the h/w merge rule), collapse runs per
    digit, drop the leading code (it belongs to the retained first
    letter), drop the vowel separators, pad to 3.  Keyed on the FIRST
    token of the normalized surface; NULL when it does not start a-z.

    Standard test vectors (Robert->R163, Tymczak->T522, Pfister->P236,
    Ashcraft->A261 with the h/w rule) are pinned in tests."""
    first = F.element_at(F.split(F.col(name_col), " "), 1)
    code = F.translate(
        first,
        "abcdefghijklmnopqrstuvwxyz",
        "01230129022455012623019202",
    )
    code = F.regexp_replace(code, "9", "")  # h/w merge rule
    for d in "0123456":  # run collapse, one quantifier pattern per digit
        code = F.regexp_replace(code, d + "{2,}", d)
    # drop the leading code (the retained first letter's own), then the
    # vowel separators
    tail = F.regexp_replace(code.substr(F.lit(2), F.length(code)), "0", "")
    key = F.concat(
        F.upper(F.substring(first, 1, 1)),
        F.rpad(F.substring(tail, 1, 3), 3, "0"),
    )
    return F.when(F.substring(first, 1, 1).rlike("^[a-z]$"), key)


def phonetic_pairs(
    surfaces: DataFrame,
    id_col: str = "node_id",
    name_col: str = "norm_name",
    max_block: int = 64,
) -> DataFrame:
    """Candidate pairs from the phonetic key: one groupBy-free keying
    projection, the standard row_number hot-block cap (soundex buckets
    are famously skewed — S530 holds every smith/smyth/schmidt), and a
    band self-join.  Output (id_a, id_b, block_key) distinct pairs."""
    from pyspark.sql import Window

    keyed = surfaces.select(
        F.col(id_col), soundex_key_col(name_col).alias("block_key")
    ).where(F.col("block_key").isNotNull())
    w = Window.partitionBy("block_key").orderBy(id_col)
    capped = (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_block)
        .drop("rn")
    )
    a = capped.toDF("id_a", "block_key")
    b = capped.toDF("id_b", "block_key")
    return (
        a.join(b, "block_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "block_key")
        .distinct()
    )
