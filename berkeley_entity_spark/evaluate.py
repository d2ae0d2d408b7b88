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
