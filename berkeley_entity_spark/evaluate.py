"""Evaluation: pairwise P/R/F1 and stage recall audits (SURVEY.md A6-A8, §5).

Pairwise F1 follows the reference exactly (CorefEvaluator.scala:364-396):
precision = |pairs predicted same-cluster ∧ gold same| / |predicted same|,
recall over gold pairs; computed two ways:

  * `pairwise_f1_on_labeled` — over an explicit labeled-pair table
    (gold_pairs), the BASELINE.json metric: join cluster assignments to both
    endpoints, compare cluster equality with the label.
  * `pairwise_f1_combinatorial` — over full clusterings without materializing
    pairs: sum n·(n−1)/2 per cluster for pred, gold, and the pred⋈gold
    intersection (A7 note in SURVEY.md) — the scalable form.

Blocking recall (§5.3, the reference's pruning-oracle analysis,
CorefEvaluator.scala:82-143): fraction of gold-positive pairs whose surfaces
survive into the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _f1(tp: float, pred: float, gold: float) -> dict[str, float]:
    p = tp / pred if pred else 0.0
    r = tp / gold if gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "pred": pred, "gold": gold}


def pairwise_f1_on_labeled(
    gold_pairs: DataFrame, clusters: DataFrame
) -> dict[str, float]:
    """gold_pairs(mention_a, mention_b, label) x clusters(mention_id,
    cluster_id) -> P/R/F1 of 'same cluster' vs label."""
    ca = clusters.toDF("mention_a", "cluster_a")
    cb = clusters.toDF("mention_b", "cluster_b")
    joined = gold_pairs.join(ca, "mention_a").join(cb, "mention_b")
    agg = joined.agg(
        F.sum(
            ((F.col("cluster_a") == F.col("cluster_b")) & F.col("label")).cast("long")
        ).alias("tp"),
        F.sum((F.col("cluster_a") == F.col("cluster_b")).cast("long")).alias("pred"),
        F.sum(F.col("label").cast("long")).alias("gold"),
    ).collect()[0]
    return _f1(float(agg["tp"] or 0), float(agg["pred"] or 0), float(agg["gold"] or 0))


def pairwise_f1_combinatorial(
    pred: DataFrame, gold: DataFrame, key: str = "mention_id"
) -> dict[str, float]:
    """pred(key, cluster_id) x gold(key, entity_id) — exact pairwise F1 via
    per-cluster combinatorics; no pair table is ever materialized."""
    npairs = lambda c: F.sum(c * (c - 1) / 2)  # noqa: E731
    pred_n = (
        pred.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("c")).agg(npairs(F.col("c"))).collect()[0][0]
    )
    gold_n = (
        gold.groupBy("entity_id").agg(F.count(F.lit(1)).alias("c")).agg(npairs(F.col("c"))).collect()[0][0]
    )
    both = pred.join(gold, key)
    tp = (
        both.groupBy("cluster_id", "entity_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(npairs(F.col("c")))
        .collect()[0][0]
    )
    return _f1(float(tp or 0), float(pred_n or 0), float(gold_n or 0))


def mention_detection_prf(pred_mentions: DataFrame, gold_mentions: DataFrame) -> dict[str, float]:
    """A6: span-exact mention detection P/R/F1 (CorefDoc.scala:104-108);
    alignment is the J4 equi-join on (url, sent_idx, start, end)."""
    keys = ["url", "sent_idx", "start", "end"]
    p = pred_mentions.select(*keys).distinct()
    g = gold_mentions.select(*keys).distinct()
    tp = p.join(g, keys).count()
    return _f1(float(tp), float(p.count()), float(g.count()))


def blocking_recall(
    gold_pairs: DataFrame,
    mentions: DataFrame,
    candidate_pairs: DataFrame,
) -> float:
    """Share of gold-positive pairs whose two surfaces are either identical
    (exact pass links them) or connected by a candidate pair."""
    m = mentions.select("mention_id", "norm_name")
    gp = (
        gold_pairs.where("label")
        .join(m.toDF("mention_a", "norm_a"), "mention_a")
        .join(m.toDF("mention_b", "norm_b"), "mention_b")
        .withColumn("na", F.xxhash64("norm_a"))
        .withColumn("nb", F.xxhash64("norm_b"))
        .select(
            F.least("na", "nb").alias("node_a"), F.greatest("na", "nb").alias("node_b")
        )
    )
    total = gp.count()
    if total == 0:
        return 1.0
    same = gp.where(F.col("node_a") == F.col("node_b")).count()
    covered = (
        gp.where(F.col("node_a") != F.col("node_b"))
        .join(candidate_pairs.select("node_a", "node_b").distinct(), ["node_a", "node_b"])
        .count()
    )
    return (same + covered) / total


def coref_cluster_metrics(
    pred: DataFrame,
    gold: DataFrame,
    key: str = "mention_id",
    conll: bool = False,
    doc_col: str | None = None,
) -> DataFrame:
    """B-cubed and MUC as pure DataFrame aggregations — one row:
    (b3_precision, b3_recall, b3_f1, muc_precision, muc_recall, muc_f1).

    Replaces the reference's external CoNLL scorer v7 invocation
    (coref/CorefConllScorer.scala:28-62) with the scorer's own definitions:

      * B-cubed (Bagga & Baldwin 1998): per-mention precision
        |C_m ∩ G_m|/|C_m| and recall |C_m ∩ G_m|/|G_m|, averaged — computed
        without per-mention rows as sum(n_ce^2/n_c)/N and sum(n_ce^2/n_e)/N
        over the cluster x entity intersection cells.
      * MUC (Vilain et al. 1995): link-based — precision
        sum_c(|c| - p(c)) / sum_c(|c| - 1) where p(c) = number of gold
        partitions intersecting cluster c; recall symmetric.

    Mentions present in only one side are ignored (the caller aligns first —
    J4); everything stays in three small aggregations over the cells table.
    With conll=True, delegates to conll_metrics and ALSO returns
    ceafe_precision/recall/f1 + conll_f1 (the CoNLL scorer average) —
    pass doc_col for per-document alignment."""
    if conll:
        return conll_metrics(pred, gold, key, doc_col=doc_col)
    j = pred.select(key, "cluster_id").join(gold.select(key, "entity_id"), key)
    cells = j.groupBy("cluster_id", "entity_id").agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    return _b3_muc_from_cells(cells)


def _b3_muc_from_cells(cells: DataFrame) -> DataFrame:
    """B3 + MUC from a (cluster_id, entity_id, n_ce) intersection-cells
    table — the shared tail of coref_cluster_metrics and conll_metrics
    (which computes cells ONCE and feeds both this and the CEAFe
    alignment)."""
    nc = cells.groupBy("cluster_id").agg(
        F.sum("n_ce").alias("n_c"), F.count(F.lit(1)).alias("p_c")
    )
    ne = cells.groupBy("entity_id").agg(
        F.sum("n_ce").alias("n_e"), F.count(F.lit(1)).alias("p_e")
    )
    b3 = (
        cells.join(nc, "cluster_id")
        .join(ne, "entity_id")
        .agg(
            F.sum("n_ce").alias("n"),
            F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_c")).alias("sp"),
            F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_e")).alias("sr"),
        )
    )
    mp = nc.agg(
        F.sum(F.col("n_c") - F.col("p_c")).alias("muc_tp_p"),
        F.sum(F.col("n_c") - 1).alias("muc_den_p"),
    )
    mr = ne.agg(
        F.sum(F.col("n_e") - F.col("p_e")).alias("muc_tp_r"),
        F.sum(F.col("n_e") - 1).alias("muc_den_r"),
    )
    f1 = lambda p, r: F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))  # noqa: E731
    safe = lambda a, b: F.when(b > 0, a / b).otherwise(F.lit(0.0))  # noqa: E731
    out = (
        b3.crossJoin(mp)
        .crossJoin(mr)
        .withColumn("b3_precision", safe(F.col("sp"), F.col("n")))
        .withColumn("b3_recall", safe(F.col("sr"), F.col("n")))
        .withColumn("muc_precision", safe(F.col("muc_tp_p"), F.col("muc_den_p")))
        .withColumn("muc_recall", safe(F.col("muc_tp_r"), F.col("muc_den_r")))
    )
    return out.select(
        "b3_precision",
        "b3_recall",
        f1(F.col("b3_precision"), F.col("b3_recall")).alias("b3_f1"),
        "muc_precision",
        "muc_recall",
        f1(F.col("muc_precision"), F.col("muc_recall")).alias("muc_f1"),
    )


def bcubed_muc(pred: DataFrame, gold: DataFrame, key: str = "mention_id") -> dict[str, float]:
    """Dict form of coref_cluster_metrics for tests/reports."""
    row = coref_cluster_metrics(pred, gold, key).collect()[0]
    return {k: float(row[k]) for k in row.asDict()}


def ceafe_metrics(
    pred: DataFrame,
    gold: DataFrame,
    key: str = "mention_id",
    doc_col: str | None = None,
) -> DataFrame:
    """CEAFe (Luo 2005, phi4) — the third leg of the reference's headline
    CoNLL score (coref/CorefConllScorer.scala:72-88 parses MUC + B3 + CEAFe
    from the scorer v7, whose CEAFe runs Algorithm::Munkres per document).

    phi4(C, E) = 2|C ∩ E| / (|C| + |E|); per document, an optimal 1:1
    alignment between pred clusters and gold entities maximizes sum(phi4);
    precision = sum(phi) / #pred clusters, recall = sum(phi) / #gold
    entities (phi4(C, C) = 1), aggregated over documents by summing
    numerators and denominators exactly like the scorer.

    Spark shape: the (doc, cluster, entity) intersection cells are three
    DataFrame aggs; the Hungarian runs per doc in an Arrow kernel over
    those CELLS (tens of rows per doc — never the mentions), so the only
    data that reaches Python is one row per non-empty cluster x entity
    cell.  doc_col=None treats the whole input as one document (fine for
    corpus-level clusterings; per-doc coref should pass the doc column).
    Mentions present in only one side are ignored (caller aligns first —
    same convention as coref_cluster_metrics)."""
    cells = _doc_cells(pred, gold, key, doc_col)
    return _ceafe_from_cells(cells)


def ceafm_metrics(
    pred: DataFrame,
    gold: DataFrame,
    key: str = "mention_id",
    doc_col: str | None = None,
) -> DataFrame:
    """CEAF-m (Luo 2005 phi3 — mention-based CEAF): the optimal 1:1
    cluster alignment maximizes the TOTAL number of commonly-clustered
    mentions; precision divides by the pred-side mention count, recall by
    the gold side (the scorer-v7 'ceafm' matcher that ships beside the
    'ceafe' one CorefConllScorer.scala parses).  Under this repo's
    aligned-mention convention (inner join on key — ceafe_metrics'
    convention) both denominators equal the aligned mention count, so
    P = R = F1 whenever both sides cluster the same mention set.  Same
    intersection-cells + per-doc Arrow Hungarian shape as CEAFe: only one
    row per non-empty cluster x entity cell ever reaches Python."""
    import pandas as pd

    from berkeley_entity_spark.ml.assignment import hungarian_max

    cells = _doc_cells(pred, gold, key, doc_col)

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cl = {c: i for i, c in enumerate(sorted(pdf["cluster_id"].unique()))}
        en = {e: i for i, e in enumerate(sorted(pdf["entity_id"].unique()))}
        mat = np.zeros((len(cl), len(en)))
        for r in pdf.itertuples():
            mat[cl[r.cluster_id], en[r.entity_id]] = float(r.n_ce)
        phi, _ = hungarian_max(mat)
        return pd.DataFrame({"phi": [phi], "n_m": [int(pdf["n_ce"].sum())]})

    per_doc = cells.groupBy("_doc").applyInPandas(
        align, schema="phi double, n_m long"
    )
    safe = lambda a, b: F.when(b > 0, a / b).otherwise(F.lit(0.0))  # noqa: E731
    f1 = lambda p, r: F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))  # noqa: E731
    agg = per_doc.agg(F.sum("phi").alias("sphi"), F.sum("n_m").alias("snm"))
    out = agg.select(
        safe(F.col("sphi"), F.col("snm")).alias("ceafm_precision"),
        safe(F.col("sphi"), F.col("snm")).alias("ceafm_recall"),
    )
    return out.select(
        "ceafm_precision",
        "ceafm_recall",
        f1(F.col("ceafm_precision"), F.col("ceafm_recall")).alias("ceafm_f1"),
    )


def clustering_agreement(
    pred: DataFrame, gold: DataFrame, key: str = "mention_id"
) -> DataFrame:
    """Partition-agreement metrics beside the coref-specific scorers: ARI
    (Hubert & Arabie 1985, pair-counting adjusted Rand) and V-measure with
    its homogeneity/completeness components (Rosenberg & Hirschberg 2007)
    — the external-validation numbers a clustering pipeline publishes when
    the gold side is a labeling rather than a coref key file.

    Everything reduces over the (cluster x entity) intersection-cells
    table (|C|*|E| rows, never mentions): the pair counts sum n*(n-1)
    per cell/row/column in exact BIGINT and halve only in the final
    double-precision formula; the conditional entropies are one weighted
    ln-ratio sum over the same cells.  Edge conventions follow sklearn:
    ARI = 1 when the adjustment denominator is 0 (both partitions trivial
    in the same way), homogeneity/completeness = 1 when the respective
    reference entropy is 0, V = 0 when h + c = 0.

    One row: (ari, homogeneity, completeness, v_measure)."""
    j = pred.select(key, "cluster_id").join(gold.select(key, "entity_id"), key)
    cells = j.groupBy("cluster_id", "entity_id").agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    nc = cells.groupBy("cluster_id").agg(F.sum("n_ce").alias("n_c"))
    ne = cells.groupBy("entity_id").agg(F.sum("n_ce").alias("n_e"))
    cj = cells.join(nc, "cluster_id").join(ne, "entity_id")
    base = cj.agg(
        F.sum("n_ce").alias("n"),
        F.sum(F.col("n_ce") * (F.col("n_ce") - 1)).alias("t_cells"),
        F.sum(
            F.col("n_ce") * F.log(F.col("n_c") / F.col("n_ce"))
        ).alias("s_e_given_c"),
        F.sum(
            F.col("n_ce") * F.log(F.col("n_e") / F.col("n_ce"))
        ).alias("s_c_given_e"),
    )
    rows = nc.agg(
        F.sum(F.col("n_c") * (F.col("n_c") - 1)).alias("t_rows"),
        F.sum(F.col("n_c") * F.log("n_c")).alias("s_rows"),
    )
    cols = ne.agg(
        F.sum(F.col("n_e") * (F.col("n_e") - 1)).alias("t_cols"),
        F.sum(F.col("n_e") * F.log("n_e")).alias("s_cols"),
    )
    m = (
        base.crossJoin(rows)
        .crossJoin(cols)
        .select(
            (F.col("t_cells") / 2.0).alias("a"),
            (F.col("t_rows") / 2.0).alias("r2"),
            (F.col("t_cols") / 2.0).alias("c2"),
            (F.col("n") * (F.col("n") - 1) / 2.0).alias("npairs"),
            # H(E|C) = sum (n_ce/n) ln(n_c/n_ce); H(E) = ln n - sum (n_e/n) ln n_e
            (F.col("s_e_given_c") / F.col("n")).alias("h_e_c"),
            (F.col("s_c_given_e") / F.col("n")).alias("h_c_e"),
            (F.log("n") - F.col("s_cols") / F.col("n")).alias("h_e"),
            (F.log("n") - F.col("s_rows") / F.col("n")).alias("h_c"),
        )
        .select(
            F.when(
                (F.col("r2") + F.col("c2")) / 2.0
                - F.col("r2") * F.col("c2") / F.col("npairs")
                == 0,
                F.lit(1.0),
            )
            .otherwise(
                (F.col("a") - F.col("r2") * F.col("c2") / F.col("npairs"))
                / (
                    (F.col("r2") + F.col("c2")) / 2.0
                    - F.col("r2") * F.col("c2") / F.col("npairs")
                )
            )
            .alias("ari"),
            F.when(F.col("h_e") == 0, F.lit(1.0))
            .otherwise(1.0 - F.col("h_e_c") / F.col("h_e"))
            .alias("homogeneity"),
            F.when(F.col("h_c") == 0, F.lit(1.0))
            .otherwise(1.0 - F.col("h_c_e") / F.col("h_c"))
            .alias("completeness"),
        )
    )
    return m.select(
        "ari",
        "homogeneity",
        "completeness",
        F.when(
            F.col("homogeneity") + F.col("completeness") > 0,
            2.0
            * F.col("homogeneity")
            * F.col("completeness")
            / (F.col("homogeneity") + F.col("completeness")),
        )
        .otherwise(F.lit(0.0))
        .alias("v_measure"),
    )


def _doc_cells(
    pred: DataFrame, gold: DataFrame, key: str, doc_col: str | None
) -> DataFrame:
    """(_doc, cluster_id, entity_id, n_ce) intersection cells — computed
    ONCE per evaluation and shared by B3/MUC and CEAFe."""
    dc = doc_col
    pcols = [key, "cluster_id"] + ([dc] if dc else [])
    gcols = [key, "entity_id"] + ([dc] if dc else [])
    j = pred.select(*pcols).join(gold.select(*[c for c in gcols if c != dc]), key)
    doc = F.col(dc) if dc else F.lit("_all")
    return j.groupBy(doc.alias("_doc"), "cluster_id", "entity_id").agg(
        F.count(F.lit(1)).alias("n_ce")
    )


def _ceafe_from_cells(cells: DataFrame) -> DataFrame:
    import pandas as pd

    from berkeley_entity_spark.ml.assignment import hungarian_max

    nc = cells.groupBy("_doc", "cluster_id").agg(F.sum("n_ce").alias("n_c"))
    ne = cells.groupBy("_doc", "entity_id").agg(F.sum("n_ce").alias("n_e"))
    full = cells.join(nc, ["_doc", "cluster_id"]).join(ne, ["_doc", "entity_id"])

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        cl = {c: i for i, c in enumerate(sorted(pdf["cluster_id"].unique()))}
        en = {e: i for i, e in enumerate(sorted(pdf["entity_id"].unique()))}
        import numpy as np

        mat = np.zeros((len(cl), len(en)))
        for r in pdf.itertuples():
            mat[cl[r.cluster_id], en[r.entity_id]] = (
                2.0 * r.n_ce / (r.n_c + r.n_e)
            )
        phi, _ = hungarian_max(mat)
        return pd.DataFrame(
            {"phi": [phi], "n_pred": [len(cl)], "n_gold": [len(en)]}
        )

    per_doc = full.groupBy("_doc").applyInPandas(
        align, schema="phi double, n_pred long, n_gold long"
    )
    safe = lambda a, b: F.when(b > 0, a / b).otherwise(F.lit(0.0))  # noqa: E731
    f1 = lambda p, r: F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))  # noqa: E731
    agg = per_doc.agg(
        F.sum("phi").alias("sphi"),
        F.sum("n_pred").alias("snp"),
        F.sum("n_gold").alias("sng"),
    )
    out = agg.select(
        safe(F.col("sphi"), F.col("snp")).alias("ceafe_precision"),
        safe(F.col("sphi"), F.col("sng")).alias("ceafe_recall"),
    )
    return out.select(
        "ceafe_precision",
        "ceafe_recall",
        f1(F.col("ceafe_precision"), F.col("ceafe_recall")).alias("ceafe_f1"),
    )


def conll_metrics(
    pred: DataFrame,
    gold: DataFrame,
    key: str = "mention_id",
    doc_col: str | None = None,
) -> DataFrame:
    """The CoNLL scorer's headline number: one row with muc_f1, b3_f1,
    ceafe_precision/recall/f1, and conll_f1 = (MUC + B3 + CEAFe)/3
    (CorefConllScorer.scala:72-88 semantics).  When doc_col is given,
    cluster/entity ids are doc-scoped before the global B3/MUC aggs —
    clusters never span documents in the scorer, so the global cell sums
    equal the scorer's per-document accumulation exactly.

    The pred-x-gold mention join and the intersection-cells aggregation
    run ONCE (eager-checkpointed) and feed both the B3/MUC aggs and the
    per-doc CEAFe alignment — the mention-scale shuffle is not repeated."""
    if doc_col:
        pred = pred.withColumn(
            "cluster_id", F.concat_ws("␟", doc_col, "cluster_id")
        )
        gold = gold.withColumn(
            "entity_id", F.concat_ws("␟", doc_col, "entity_id")
        )
    cells = _doc_cells(pred, gold, key, doc_col).localCheckpoint(eager=True)
    # doc-scoped ids make (cluster_id, entity_id) globally unique, so the
    # global cells are the per-doc cells re-keyed (n_ce passes through)
    base = _b3_muc_from_cells(
        cells.groupBy("cluster_id", "entity_id").agg(F.sum("n_ce").alias("n_ce"))
    )
    ceafe = _ceafe_from_cells(cells)
    return (
        base.crossJoin(ceafe)
        .withColumn(
            "conll_f1",
            (F.col("muc_f1") + F.col("b3_f1") + F.col("ceafe_f1")) / 3.0,
        )
        .select(
            "muc_f1", "b3_f1",
            "ceafe_precision", "ceafe_recall", "ceafe_f1", "conll_f1",
        )
    )


def per_doc_pairwise_stats(
    assign: DataFrame, doc_col: str = "url"
) -> DataFrame:
    """(doc, tp, pred, gold) pairwise sufficient statistics restricted to
    in-document pairs — the per-document stat lines the reference's
    bootstrap consumes (sig/BootstrapDriver.scala:12-17 reads them from
    logs; sig/MetricComputer.isSigDifference re-aggregates them).

    assign: (doc_col, mention_id, cluster_id, entity_id)."""
    np2 = lambda c: F.sum(c * (c - 1) / 2).cast("double")  # noqa: E731
    cnt = F.count(F.lit(1)).alias("c")
    pred = (
        assign.groupBy(doc_col, "cluster_id").agg(cnt)
        .groupBy(doc_col).agg(np2(F.col("c")).alias("pred"))
    )
    gold = (
        assign.groupBy(doc_col, "entity_id").agg(cnt)
        .groupBy(doc_col).agg(np2(F.col("c")).alias("gold"))
    )
    tp = (
        assign.groupBy(doc_col, "cluster_id", "entity_id").agg(cnt)
        .groupBy(doc_col).agg(np2(F.col("c")).alias("tp"))
    )
    # the three aggregations share `assign`'s doc key set exactly, so plain
    # inner joins state the invariant (and keep broadcast planning open)
    return pred.join(gold, doc_col).join(tp, doc_col)


# Poisson(1) CDF thresholds for the poissonized bootstrap draw (k = 0..8
# covers all but ~1e-6 of the mass; the tail clamps to 8)
_POIS1_CDF = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340,
              0.999406, 0.999917, 0.999990, 0.999999]


def _poisson1(u):
    expr = F.lit(len(_POIS1_CDF) - 1)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = F.when(u < _POIS1_CDF[k], F.lit(k)).otherwise(expr)
    return expr


def bootstrap_significance(
    stats_a: DataFrame,
    stats_b: DataFrame,
    n_trials: int = 1000,
    seed: int = 0,
    doc_col: str = "url",
) -> DataFrame:
    """M12: paired bootstrap test over documents
    (sig/BootstrapDriver.scala:104-141: 1000 trials, resample docs with
    replacement, count trials where system B's aggregated F1 beats A's;
    the reported value is that fraction = 1-p).

    Distributed poissonized form: the multinomial resample count of each
    doc in a trial is approximated by Poisson(1) drawn from a deterministic
    hash of (doc, trial, seed) — no driver-side loop, no RNG state; the
    whole test is one explode + two aggregations, identical at any
    parallelism.  Returns one row: (f1_a, f1_b, delta, frac_sig, n_trials).
    """
    a = stats_a.select(doc_col, F.col("tp").alias("tp_a"),
                       F.col("pred").alias("pred_a"), F.col("gold").alias("gold_a"))
    b = stats_b.select(doc_col, F.col("tp").alias("tp_b"),
                       F.col("pred").alias("pred_b"), F.col("gold").alias("gold_b"))
    j = a.join(b, doc_col, "full").na.fill(0.0)
    rep = j.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_trials - 1))).alias("_trial")
    )
    u = (
        F.pmod(F.xxhash64(doc_col, "_trial", F.lit(seed)), F.lit(1 << 40))
        / float(1 << 40)
    )
    w = _poisson1(u).cast("double")
    f1 = lambda tp, pred, gold: F.when(  # noqa: E731
        (pred > 0) & (gold > 0) & (tp > 0),
        2.0 / (pred / tp + gold / tp),
    ).otherwise(F.lit(0.0))
    per_trial = (
        rep.groupBy("_trial")
        .agg(
            F.sum(w * F.col("tp_a")).alias("ta"),
            F.sum(w * F.col("pred_a")).alias("pa"),
            F.sum(w * F.col("gold_a")).alias("ga"),
            F.sum(w * F.col("tp_b")).alias("tb"),
            F.sum(w * F.col("pred_b")).alias("pb"),
            F.sum(w * F.col("gold_b")).alias("gb"),
        )
        .select(
            (f1(F.col("tb"), F.col("pb"), F.col("gb"))
             > f1(F.col("ta"), F.col("pa"), F.col("ga"))).cast("double").alias("sig")
        )
    )
    totals = j.agg(
        F.sum("tp_a").alias("ta"), F.sum("pred_a").alias("pa"), F.sum("gold_a").alias("ga"),
        F.sum("tp_b").alias("tb"), F.sum("pred_b").alias("pb"), F.sum("gold_b").alias("gb"),
    ).select(
        f1(F.col("ta"), F.col("pa"), F.col("ga")).alias("f1_a"),
        f1(F.col("tb"), F.col("pb"), F.col("gb")).alias("f1_b"),
    )
    return totals.crossJoin(per_trial.agg(F.avg("sig").alias("frac_sig"))).select(
        "f1_a", "f1_b", (F.col("f1_b") - F.col("f1_a")).alias("delta"),
        "frac_sig", F.lit(n_trials).alias("n_trials"),
    )


def grouped_accuracy(
    pred: DataFrame,
    gold: DataFrame,
    attrs: DataFrame,
    group_col: str,
    key: str = "mention_id",
) -> DataFrame:
    """A8: grouped accuracy counters — per attribute group (e.g. mtype,
    number, gender), the fraction of mentions sitting in a cluster whose
    MAJORITY gold entity matches their own (the reference's per-category
    right/wrong counters in its evaluator output).

    attrs(key, group_col).  Majority entity per cluster = argmax of
    (cluster, entity) cell counts, ties to the smaller entity id.  Returns
    (group, n, correct, accuracy)."""
    j = pred.select(key, "cluster_id").join(gold.select(key, "entity_id"), key)
    cells = j.groupBy("cluster_id", "entity_id").agg(F.count(F.lit(1)).alias("n_ce"))
    # min_by over (-count, entity_id) keeps the "ties to the smaller
    # entity id" rule for ANY orderable id type (a unary minus on a string
    # id would cast to null and make the tie-break arbitrary)
    majority = cells.groupBy("cluster_id").agg(
        F.min_by(
            "entity_id", F.struct((-F.col("n_ce")).alias("_negn"), F.col("entity_id"))
        ).alias("_maj")
    )
    scored = (
        j.join(majority, "cluster_id")
        .withColumn("_ok", (F.col("entity_id") == F.col("_maj")).cast("long"))
        .join(attrs.select(key, group_col), key)
    )
    return (
        scored.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_ok").alias("correct"))
        .withColumn("accuracy", F.round(F.col("correct") / F.col("n"), 6))
    )


def wikification_prf1(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Entity-linking chunk evaluation — evaluateWikiChunksBySent
    (wiki/WikificationEvaluator.scala:19-57) as one DataFrame aggregation.

    pred(url, sent_idx, start, end, title STRING): the system's chosen
    title per mention chunk; gold(url, sent_idx, start, end,
    titles ARRAY<STRING>): the acceptable-title sets.  Semantics ported
    exactly: -EXCLUDE- preds dropped (removeExcludes), empty-label golds
    dropped, then two buckets — non-NIL chunks scored with
    isCorrect(gold, guess) = lower(gold) contains
    lower(guess).replace(' ','_') (wiki/package.scala:36-39), NIL chunks
    scored by position match alone.  Gold spans are assumed unique per
    (url, sent_idx, start, end) — the format writes one annotation per
    span — and deduped defensively so a malformed double-annotation can't
    double-count a pred.

    Returns ONE row: correct/total_pred/total_gold (+ _nil variants) and
    the derived precision/recall/f1 per bucket — the counters the
    reference logs via renderPRF1.  Shape: two tiny grouped counts and one
    equi-join on span position; no per-doc loop, so it runs at any corpus
    size."""
    p = pred.where(F.col("title") != F.lit("-EXCLUDE-")).withColumn(
        "_pnil", F.col("title") == F.lit("-NIL-")
    )
    g = (
        gold.where(F.size("titles") >= 1)
        .dropDuplicates(["url", "sent_idx", "start", "end"])
        .withColumn("_gnil", F.element_at("titles", 1) == F.lit("-NIL-"))
    )
    keys = ["url", "sent_idx", "start", "end"]
    j = p.join(g, keys, "left").withColumn(
        "_ok",
        F.when(
            F.col("_gnil").isNotNull() & (F.col("_pnil") == F.col("_gnil")),
            F.when(F.col("_pnil"), F.lit(True)).otherwise(
                F.array_contains(
                    F.transform("titles", F.lower),
                    F.replace(F.lower("title"), F.lit(" "), F.lit("_")),
                )
            ),
        ).otherwise(F.lit(False)),
    )
    zsum = lambda c: F.coalesce(F.sum(c.cast("long")), F.lit(0))  # noqa: E731
    pa = j.agg(
        zsum(~F.col("_pnil")).alias("total_pred"),
        zsum(F.col("_ok") & ~F.col("_pnil")).alias("correct"),
        zsum(F.col("_pnil")).alias("total_pred_nil"),
        zsum(F.col("_ok") & F.col("_pnil")).alias("correct_nil"),
    )
    ga = g.agg(
        zsum(~F.col("_gnil")).alias("total_gold"),
        zsum(F.col("_gnil")).alias("total_gold_nil"),
    )
    prf = lambda tp, pr, gl: [  # noqa: E731
        F.round(F.when(pr > 0, tp / pr).otherwise(0.0), 6),
        F.round(F.when(gl > 0, tp / gl).otherwise(0.0), 6),
        F.round(
            F.when(
                (F.when(pr > 0, tp / pr).otherwise(0.0)
                 + F.when(gl > 0, tp / gl).otherwise(0.0)) > 0,
                2 * F.when(pr > 0, tp / pr).otherwise(0.0)
                * F.when(gl > 0, tp / gl).otherwise(0.0)
                / (F.when(pr > 0, tp / pr).otherwise(0.0)
                   + F.when(gl > 0, tp / gl).otherwise(0.0)),
            ).otherwise(0.0),
            6,
        ),
    ]
    kb = prf(F.col("correct"), F.col("total_pred"), F.col("total_gold"))
    nil = prf(
        F.col("correct_nil"), F.col("total_pred_nil"), F.col("total_gold_nil")
    )
    return pa.crossJoin(ga).select(
        "correct", "total_pred", "total_gold",
        kb[0].alias("precision"), kb[1].alias("recall"), kb[2].alias("f1"),
        "correct_nil", "total_pred_nil", "total_gold_nil",
        nil[0].alias("precision_nil"), nil[1].alias("recall_nil"),
        nil[2].alias("f1_nil"),
    )


def cluster_diff(
    pred: DataFrame, gold: DataFrame, key: str = "mention_id"
) -> DataFrame:
    """Per-cluster error decomposition — WHERE the clustering disagrees
    with gold, not just how much (the drill-down behind the B3/MUC/CEAF
    aggregates): for every predicted cluster,

      (cluster_id, n_members, n_entities, majority_entity, purity,
       entity_n_clusters, status)

    majority_entity = the gold entity owning most members (ties to the
    smallest entity id); purity = its share; entity_n_clusters = how many
    predicted clusters that entity is scattered across.  status is the
    audit label: 'pure' (one entity, entity in one cluster), 'merged'
    (cluster holds >1 entity), 'split' (single-entity cluster but the
    entity continues elsewhere), 'merged+split' (both).

    Same intersection-cells reduction as B3/CEAF (never per-mention
    rows); three small aggregations + two joins."""
    j = pred.select(key, "cluster_id").join(gold.select(key, "entity_id"), key)
    cells = j.groupBy("cluster_id", "entity_id").agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    nc = cells.groupBy("cluster_id").agg(
        F.sum("n_ce").alias("n_members"),
        F.count(F.lit(1)).alias("n_entities"),
        F.min_by(
            "entity_id", F.struct((-F.col("n_ce")).alias("_n"), F.col("entity_id"))
        ).alias("majority_entity"),
        F.max("n_ce").alias("_maj_n"),
    )
    se = cells.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_n_clusters")
    )
    out = nc.join(
        se.withColumnRenamed("entity_id", "majority_entity"), "majority_entity"
    )
    merged = F.col("n_entities") > 1
    split = F.col("entity_n_clusters") > 1
    return out.select(
        "cluster_id",
        "n_members",
        "n_entities",
        "majority_entity",
        F.round(F.col("_maj_n") / F.col("n_members"), 6).alias("purity"),
        "entity_n_clusters",
        F.when(merged & split, F.lit("merged+split"))
        .when(merged, F.lit("merged"))
        .when(split, F.lit("split"))
        .otherwise(F.lit("pure"))
        .alias("status"),
    )
