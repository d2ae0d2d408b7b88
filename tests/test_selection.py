from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.selection import (
    dsir_logratio_table,
    dsir_select,
    dsir_weights,
    hashed_gram_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_buckets_match_duckdb_hash(spark):
    """The Spark conv(md5-hex) bucket must equal DuckDB's ('0x'||hex)::BIGINT
    bucket for the same gram — the whole oracle rests on this."""
    df = _docs(spark, [(1, "alpha beta gamma")])
    got = sorted(
        r.bucket for r in hashed_gram_buckets(df, n_buckets=97).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            """SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 97
               FROM (VALUES ('alpha'), ('beta'), ('gamma'),
                            ('alpha beta'), ('beta gamma')) t(g)"""
        ).fetchall()
    )
    assert got == want


def test_gram_inventory_unigrams_plus_bigrams(spark):
    df = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "")])
    n = hashed_gram_buckets(df, 1024).groupBy("doc_id").count().collect()
    cnt = {r.doc_id: r["count"] for r in n}
    assert cnt == {1: 5, 2: 1}  # 3 unigrams + 2 bigrams; empty doc emits none


def test_dsir_weights_hand_computed(spark):
    """2-bucket-free hand check: one doc exactly matching the target
    distribution scores higher than one matching raw-only mass."""
    raw = _docs(
        spark,
        [(1, "good good"), (2, "spam spam"), (3, "good spam")],
    )
    target = _docs(spark, [(10, "good good good")])
    B, a = 64, 1.0
    lr = {
        r.bucket: r.logratio
        for r in dsir_logratio_table(raw, target, B, a).collect()
    }
    gb = {
        (r.doc_id, r.bucket)
        for r in hashed_gram_buckets(raw, B).collect()
    }
    # raw grams: doc1 {good x2, 'good good'}, doc2 {spam x2, 'spam spam'},
    # doc3 {good, spam, 'good spam'} -> N_raw = 9
    # target grams: good x3, 'good good' x2 -> N_tgt = 5
    b_good = next(b for (d, b) in gb if d == 3)  # can't know which; recompute
    w = {r.doc_id: r.logw for r in dsir_weights(raw, target, B, a).collect()}
    n_raw, n_tgt = 9, 5

    def p(c, n):
        return (c + a) / (n + a * B)

    # bucket counts (md5 collisions at B=64 for these 5 distinct grams are
    # possible in principle; assert distinct buckets first)
    bucks = {}
    for doc, b in gb:
        bucks.setdefault(doc, []).append(b)
    all_b = sorted(b for bs in bucks.values() for b in bs)
    grams = duckdb.sql(
        """SELECT g, ('0x' || substr(md5(g), 1, 15))::BIGINT % 64
           FROM (VALUES ('good'), ('spam'), ('good good'), ('spam spam'),
                        ('good spam')) t(g)"""
    ).fetchall()
    gmap = dict(grams)
    assert len(set(gmap.values())) == 5, "hash collision — widen B"
    tgt_c = {gmap["good"]: 3, gmap["good good"]: 2}
    raw_c = {
        gmap["good"]: 3,
        gmap["spam"]: 3,
        gmap["good good"]: 1,
        gmap["spam spam"]: 1,
        gmap["good spam"]: 1,
    }

    def lw(doc_grams):
        return round(
            sum(
                math.log(p(tgt_c.get(gmap[g], 0), n_tgt))
                - math.log(p(raw_c[gmap[g]], n_raw))
                for g in doc_grams
            ),
            6,
        )

    assert w[1] == pytest.approx(lw(["good", "good", "good good"]), abs=2e-6)
    assert w[2] == pytest.approx(lw(["spam", "spam", "spam spam"]), abs=2e-6)
    assert w[1] > w[3] > w[2]


def test_dsir_select_topk_deterministic(spark):
    raw = _docs(
        spark,
        [(i, "target text" if i % 2 == 0 else "other words") for i in range(20)],
    )
    target = _docs(spark, [(100, "target text")])
    sel = dsir_select(raw, target, k=5).collect()
    assert [r.doc_id for r in sel] == [0, 2, 4, 6, 8]  # weight tie -> id order


def test_dsir_partitioning_invariance(spark):
    raw = _docs(
        spark,
        [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(50)],
    )
    target = _docs(spark, [(999, "tok1 shared tok2")])
    a = sorted(map(tuple, dsir_weights(raw, target).collect()))
    b = sorted(
        map(tuple, dsir_weights(raw.repartition(13), target.coalesce(1)).collect())
    )
    assert a == b
