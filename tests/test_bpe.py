"""BPE merge-pair training: hand-checked merges, greedy-merge semantics,
partitioning invariance, bounded driver traffic (one row per iteration)."""

import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.bpe import (
    bpe_merges_df,
    bpe_train,
    bpe_word_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_first_merges_hand_checked(spark):
    # Sennrich-style toy corpus: word counts low:5 lower:2 newest:6 widest:3
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = _docs(spark, [" ".join(corpus)])
    merges = bpe_train(docs, n_merges=4)
    # pair counts round 1: es=9 (newest 6 + widest 3), st=9, lo=7, we=8? ->
    # e-s 9, s-t 9, t? ... ties broken (cnt desc, l asc, r asc): e-s before s-t.
    assert merges[0]["left_sym"] == "e" and merges[0]["right_sym"] == "s"
    assert merges[0]["pair_cnt"] == 9
    # round 2: es-t is now 9 and wins the 9-tie alphabetically vs s? (s gone)
    assert (merges[1]["left_sym"], merges[1]["right_sym"]) == ("es", "t")
    assert merges[1]["pair_cnt"] == 9
    # round 3: l-o 7, o-w 7, n-e 6, w-est 3+? ... l-o wins tie vs o-w.
    assert (merges[2]["left_sym"], merges[2]["right_sym"]) == ("l", "o")
    assert merges[2]["pair_cnt"] == 7
    assert (merges[3]["left_sym"], merges[3]["right_sym"]) == ("lo", "w")
    assert merges[3]["pair_cnt"] == 7


def test_greedy_nonoverlapping_merge(spark):
    # "aaaa" x3: pairs (a,a)=9 -> merge. Greedy left-to-right: aa aa (not a aa a),
    # so round 2 sees (aa,aa)=3 — the signature of correct non-overlap semantics.
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges = bpe_train(docs, n_merges=2)
    assert (merges[0]["left_sym"], merges[0]["right_sym"], merges[0]["pair_cnt"]) == ("a", "a", 9)
    assert (merges[1]["left_sym"], merges[1]["right_sym"], merges[1]["pair_cnt"]) == ("aa", "aa", 3)


def test_word_counts_cutoff_and_charset(spark):
    docs = _docs(spark, ["the the the The TH3 cat cat dog!"])
    wc = {r["word"]: r["cnt"] for r in bpe_word_counts(docs, top_words=2).collect()}
    # top-2 by (cnt desc, word asc); non-[a-z]+ tokens excluded entirely
    assert wc == {"the": 3, "cat": 2}


def test_partitioning_invariance(spark):
    corpus = ["low lower lowest newest widest banana bandana"] * 7
    docs = _docs(spark, corpus)
    a = bpe_train(docs, n_merges=5)
    b = bpe_train(docs.repartition(13), n_merges=5)
    assert a == b


def test_merges_df_schema(spark):
    docs = _docs(spark, ["abab abab"])
    df = bpe_merges_df(spark, docs, n_merges=2)
    assert df.columns == ["step", "left_sym", "right_sym", "pair_cnt"]
    rows = df.orderBy("step").collect()
    assert rows[0]["step"] == 1 and rows[0]["pair_cnt"] > 0


def test_exhausted_pairs_stop_early(spark):
    # single distinct 2-char word -> one merge possible, then no pairs left
    docs = _docs(spark, ["ab ab ab"])
    merges = bpe_train(docs, n_merges=10)
    assert len(merges) == 1
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "b")


def test_encode_stats_hand_checked(spark):
    # corpus: "low low lower" -> merges learned then applied
    docs = _docs(spark, ["low low lower", "Zz9 low"])
    from berkeley_entity_spark.operators.bpe import bpe_encode_stats

    merges = bpe_train(docs, n_merges=2)
    # round 1 pairs: l-o 4, o-w 4, w-e 1, e-r 1 -> (l,o) by tie-break; then (lo,w)
    assert [(m["left_sym"], m["right_sym"]) for m in merges] == [("l", "o"), ("lo", "w")]
    out = {r["doc_id"]: r for r in bpe_encode_stats(docs, merges).collect()}
    # doc 0: low->1 symbol ("low"), low->1, lower->"low e r"=3 -> 5 symbols
    assert out[0]["n_words"] == 3 and out[0]["n_chars"] == 11
    assert out[0]["n_symbols"] == 5
    # doc 1: "Zz9" out-of-charset counts 1; "low" -> 1 symbol
    assert out[1]["n_words"] == 2 and out[1]["n_symbols"] == 2


def test_encode_empty_and_no_merges(spark):
    from berkeley_entity_spark.operators.bpe import bpe_encode_stats

    docs = _docs(spark, ["", "ab"])
    out = {r["doc_id"]: r for r in bpe_encode_stats(docs, []).collect()}
    assert out[0]["n_words"] == 0 and out[0]["n_symbols"] == 0
    # no merges: "ab" stays 2 char symbols
    assert out[1]["n_symbols"] == 2
