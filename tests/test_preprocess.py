"""Preprocess unit tests — byte-identity semantics of P1-P3.

The sentence-split candidate cases mirror the reference's own assertions
(SentenceSplitter.scala:325-337 main())."""

from berkeley_entity_spark.preprocess.normalize import (
    canonicalize_line,
    extract_text,
    form_canonicalized_paragraphs,
)
from berkeley_entity_spark.preprocess.sentence import (
    SENT_END_PATTERN,
    split_sentences,
)
from berkeley_entity_spark.preprocess.tokenizer import ptb_tokenize
from berkeley_entity_spark.synth import SynthConfig, make_page


def test_canonicalize_line():
    assert canonicalize_line('He said "hi" there') == "He said ''hi'' there"
    assert canonicalize_line("“quoted”") == "``quoted''"
    assert canonicalize_line("it’s") == "it's"
    assert canonicalize_line("a  \t b\n c") == "a b c"


def test_paragraphs_two_line_breaks():
    lines = ["first line", "continues", "", "second para"]
    paras = form_canonicalized_paragraphs(lines)
    assert paras == ["first line continues", "second para"]


def test_sent_end_pattern_reference_cases():
    # exact cases from SentenceSplitter.scala:325-337
    assert SENT_END_PATTERN.search("stuff. A")
    assert SENT_END_PATTERN.search("stuff! A")
    assert SENT_END_PATTERN.search("stuff? A")
    assert not SENT_END_PATTERN.search("stuff; a")
    assert SENT_END_PATTERN.search('stuff." A')
    assert SENT_END_PATTERN.search("stuff.'' A")
    assert not SENT_END_PATTERN.search("stuff;\" a")


def test_split_sentences_abbrev_guard():
    text = "Today J. Smith met the team overall. Meanwhile plans shifted broadly."
    sents = split_sentences([text])
    assert len(sents) == 2
    assert sents[0].endswith("overall.")
    # single-initial period must not split
    assert "J. Smith" in sents[0]


def test_ptb_tokenize_cases():
    assert ptb_tokenize("I can't go.") == ["I", "ca", "n't", "go", "."]
    assert ptb_tokenize('He said "yes" loudly') == [
        "He", "said", "``", "yes", "''", "loudly",
    ]
    assert ptb_tokenize("cost is 1,234 dollars") == ["cost", "is", "1,234", "dollars"]
    assert ptb_tokenize("(see page 5)") == ["-LRB-", "see", "page", "5", "-RRB-"]
    assert ptb_tokenize("wait -- stop") == ["wait", "--", "stop"]
    assert ptb_tokenize("Bob's dog") == ["Bob", "'s", "dog"]
    # reference quirk, reproduced faithfully: the suffix split at
    # Tokenizer.scala:56 produces " 'll " which the apostrophe regex at
    # Tokenizer.scala:64 then re-splits into " ' ll "
    assert ptb_tokenize("they'll come") == ["they", "'", "ll", "come"]


def test_byte_identity_html_roundtrip():
    cfg = SynthConfig(n_pages=50, n_entities=20)
    for i in range(50):
        page, _ = make_page(i, cfg)
        assert extract_text(page["html"].decode("utf-8")) == page["text"]


def test_appositive_like_predicate():
    """P9 (CorefDocAssembler.scala:181): comma or CC right after the span."""
    from berkeley_entity_spark.operators.extract import _mentions_from_text

    got = {
        m[3]: m[4]
        for m in _mentions_from_text(
            "Today Alice Smith and Bruno Lopez met Apex Data , while Clara Wilson left."
        )
    }
    assert got["Alice Smith"] is True        # followed by "and" (CC)
    assert got["Bruno Lopez"] is False       # followed by "met"
    assert got["Apex Data"] is True          # followed by standalone ","
    assert got["Clara Wilson"] is False      # followed by "left."
