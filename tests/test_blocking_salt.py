"""Salted hot-block handling (north-rule head-domain skew).

A synthetic hot block (hundreds of surfaces sharing one surname key) is run
through candidate_pairs with salting ON and OFF:

  * salted: every surface keeps pairing (no drops); within-salt sorted bands
    bound work per sub-block; near-identical surfaces still meet because the
    *exact* linkage path is surface-identity (identical norm -> same node)
    and near-dups also share LSH buckets.
  * capped (default): rows beyond max_block_size lose pairing within that
    key — bounded work, bounded recall.

Both must be deterministic and agree on the non-hot keys.
"""

import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.config import PipelineConfig
from berkeley_entity_spark.operators.blocking import candidate_pairs


@pytest.fixture(scope="module")
def hot_mentions(spark):
    """400 distinct surfaces sharing the L:smith block key + 20 cold ones."""
    first = [f"name{i:03d}" for i in range(400)]
    rows = [(f"u{i}", f"{f} smith", f, False, i) for i, f in enumerate(first)]
    rows += [
        (f"c{i}", f"cold{i} jones{i}", f"cold{i}", False, 1000 + i)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "url string, norm_name string, head string, is_acr boolean, mention_id long"
    )


def _cfg(salt: bool) -> PipelineConfig:
    return PipelineConfig(max_block_size=50, salt_buckets=8, salt_hot_blocks=salt)


def test_salting_drops_nothing(spark, hot_mentions):
    salted = candidate_pairs(hot_mentions, _cfg(True))
    nodes_in_pairs = (
        salted.select(F.col("node_a").alias("n"))
        .unionByName(salted.select(F.col("node_b").alias("n")))
        .distinct()
        .count()
    )
    # every one of the 400 hot surfaces still participates in blocking
    hot_nodes = (
        salted.where(F.col("norm_a").endswith("smith") | F.col("norm_b").endswith("smith"))
        .select(F.explode(F.array("node_a", "node_b")).alias("n"))
        .distinct()
        .count()
    )
    assert hot_nodes == 400, f"salted blocking lost hot-block rows: {hot_nodes}"
    assert nodes_in_pairs >= 400


def test_capped_blocking_drops_tail(spark, hot_mentions):
    capped = candidate_pairs(hot_mentions, _cfg(False))
    hot_nodes = (
        capped.where(F.col("norm_a").endswith("smith") | F.col("norm_b").endswith("smith"))
        .select(F.explode(F.array("node_a", "node_b")).alias("n"))
        .distinct()
        .count()
    )
    # the cap keeps only ~max_block_size rows of the hot key per key-pass
    assert hot_nodes < 400


def test_salting_is_deterministic(spark, hot_mentions):
    a = candidate_pairs(hot_mentions, _cfg(True)).select("node_a", "node_b")
    b = candidate_pairs(hot_mentions.repartition(13), _cfg(True)).select(
        "node_a", "node_b"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salting_bounds_pair_count(spark, hot_mentions):
    """Work bound: pairs per row <= width x passes, independent of block
    size (the quadratic-blowup guard the cap used to provide)."""
    cfg = _cfg(True)
    salted = candidate_pairs(hot_mentions, cfg)
    n_pairs = salted.count()
    n_rows = 420
    # 3 key passes x max(width) pairs/row is a generous linear bound
    assert n_pairs <= n_rows * 3 * cfg.max_block_size
