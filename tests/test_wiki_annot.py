"""Wiki standoff-annotation writer/reader (WikiAnnotReaderWriter.scala
analog): bit fidelity vs hand-derived reference outputs, escaping, the
stack-parse round trip on nested chunks, and the WikificationEvaluator
counter semantics (including the branches the driver oracle's always-
position-matched join cannot reach: unmatched preds, NIL-vs-KB
cross-bucket pairs)."""

import pandas as pd
from pyspark.sql import functions as F

from berkeley_entity_spark.evaluate import wikification_prf1
from berkeley_entity_spark.sinks.wiki_annot import (
    parse_wiki_annots,
    render_wiki_annots,
    render_wiki_doc,
    string_to_wiki_title_seq,
    wiki_bits,
    wiki_title_seq_to_string,
)


def test_title_seq_string_roundtrip():
    """wikiTitleSeqToString / stringToWikiTitleSeq (scala:64-78): escaping
    of ( ) * and the -EXCLUDE- empty case."""
    assert wiki_title_seq_to_string([]) == "-EXCLUDE-"
    assert wiki_title_seq_to_string(["Foo_(bar)"]) == "Foo_-LRB-bar-RRB-"
    assert wiki_title_seq_to_string(["A*B", "C"]) == "A-STAR-B|C"
    for titles in ([], ["X"], ["Foo_(bar)", "B*z", "Plain"]):
        assert string_to_wiki_title_seq(wiki_title_seq_to_string(titles)) == titles


def test_wiki_bits_reference_cases():
    """getWikiBits (scala:80-96): '(' + titles per start (longest first),
    '*', one ')' per end; nested spans close LIFO."""
    # outer [0,3) titled T, inner [2,3) titled U: both end at token 2
    bits = wiki_bits(4, [(0, 3, ["T"]), (2, 3, ["U"])])
    assert bits == ["(T*", "*", "(U*))", "*"]
    # multi-title + exclude + star escaping on one grid
    bits = wiki_bits(3, [(0, 1, ["A", "B_(c)"]), (1, 3, [])])
    assert bits == ["(A|B_-LRB-c-RRB-*)", "(-EXCLUDE-*", "*)"]
    assert wiki_bits(2, []) == ["*", "*"]


def test_render_parse_roundtrip_distributed(spark):
    pages = spark.createDataFrame(
        [("u1", "alpha beta gamma delta"), ("u2", "one two")],
        ["url", "text"],
    )
    chunks = spark.createDataFrame(
        [
            ("u1", 0, 0, 3, ["Alpha_(x)", "Al*pha"]),
            ("u1", 0, 2, 3, ["Gamma"]),  # nested inside the first
            ("u2", 0, 1, 2, []),  # -EXCLUDE-
        ],
        "url string, sent_idx int, start int, end int, titles array<string>",
    )
    parsed = parse_wiki_annots(render_wiki_annots(pages, chunks))
    got = sorted(
        (r.url, r.sent_idx, r.start, r.end, list(r.titles))
        for r in parsed.collect()
    )
    assert got == [
        ("u1", 0, 0, 3, ["Alpha_(x)", "Al*pha"]),
        ("u1", 0, 2, 3, ["Gamma"]),
        ("u2", 0, 1, 2, []),
    ]


def test_render_doc_framing():
    doc = render_wiki_doc("d9", "alpha beta", [(0, 0, 1, ["T"])], part_no=2)
    lines = doc.split("\n")
    assert lines[0] == "#begin document (d9); part 002"
    assert lines[1] == "(T*)"
    assert lines[2] == "*"
    assert lines[3] == ""
    assert lines[-1] == "#end document"


def _prf_row(spark, pred_rows, gold_rows):
    pred = spark.createDataFrame(
        pred_rows, "url string, sent_idx int, start int, end int, title string"
    )
    gold = spark.createDataFrame(
        gold_rows,
        "url string, sent_idx int, start int, end int, titles array<string>",
    )
    return wikification_prf1(pred, gold).collect()[0]


def test_wikification_prf1_reference_semantics(spark):
    """evaluateWikiChunksBySent (WikificationEvaluator.scala:19-57):
    EXCLUDE preds dropped, isCorrect lower/underscore matching, NIL bucket
    by position only, cross-bucket pairs and unmatched preds incorrect."""
    row = _prf_row(
        spark,
        [
            ("d", 0, 0, 1, "My Title"),     # correct via ' '->'_' + lower
            ("d", 0, 1, 2, "wrong"),        # position match, wrong title
            ("d", 0, 2, 3, "-NIL-"),        # correct NIL
            ("d", 0, 3, 4, "-NIL-"),        # NIL pred vs KB gold: incorrect
            ("d", 0, 4, 5, "Other"),        # KB pred vs NIL gold: incorrect
            ("d", 0, 7, 8, "NoGoldHere"),   # unmatched: counts in pred only
            ("d", 0, 8, 9, "-EXCLUDE-"),    # dropped entirely
        ],
        [
            ("d", 0, 0, 1, ["my_title", "alt"]),
            ("d", 0, 1, 2, ["real_title"]),
            ("d", 0, 2, 3, ["-NIL-"]),
            ("d", 0, 3, 4, ["kb_title"]),
            ("d", 0, 4, 5, ["-NIL-"]),
            ("d", 0, 5, 6, ["unfound"]),    # gold with no pred: recall only
        ],
    )
    assert row.correct == 1
    # non-NIL preds after the EXCLUDE drop: MyTitle, wrong, Other, NoGoldHere
    assert row.total_pred == 4
    assert row.total_gold == 4  # my_title, real_title, kb_title, unfound
    assert row.correct_nil == 1
    assert row.total_pred_nil == 2
    assert row.total_gold_nil == 2
    assert abs(row.precision - 0.25) < 1e-9
    assert abs(row.recall - 0.25) < 1e-9
    assert abs(row.f1 - 0.25) < 1e-9
    assert abs(row.precision_nil - 0.5) < 1e-9


def test_wikification_prf1_zero_denominators(spark):
    row = _prf_row(spark, [("d", 0, 0, 1, "-EXCLUDE-")], [("d", 0, 0, 1, [])])
    assert row.total_pred == 0 and row.total_gold == 0
    assert row.precision == 0.0 and row.f1 == 0.0 and row.f1_nil == 0.0
