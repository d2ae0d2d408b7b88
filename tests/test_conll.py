"""CoNLL render writer (ConllDocWriter.scala analog): bit-string fidelity
vs hand-derived reference outputs, and the render -> parse round trip."""

from pyspark.sql import functions as F

from berkeley_entity_spark.sinks.conll import (
    coref_bits,
    ner_bits,
    parse_conll,
    render_conll,
    render_doc,
)


def test_coref_bits_reference_cases():
    """getCorefBits semantics: single-token '(n)', multi-token '(n|'/'n)',
    pipe-joined in start/start-end/end order, '-' when empty."""
    # tokens 0..5; chunk A=[0,3) label 7, B=[2,3) label 9 (nested, single),
    # C=[4,5) label 7 (single)
    bits = coref_bits(6, [(0, 3, 7), (2, 3, 9), (4, 5, 7)])
    assert bits == ["(7", "-", "(9)|7)", "-", "(7)", "-"]
    # two chunks starting at the same token
    bits = coref_bits(3, [(0, 2, 1), (0, 3, 2)])
    assert bits == ["(1|(2", "1)", "2)"]
    assert coref_bits(2, []) == ["-", "-"]


def test_ner_bits_reference_cases():
    """getNerBitsPossiblyNestedChunks: '(LABEL' per start (longest first),
    then '*', then one ')' per end."""
    bits = ner_bits(4, [(0, 3, "ORG"), (0, 1, "PER"), (2, 3, "LOC")])
    assert bits == ["(ORG(PER*)", "*", "(LOC*))", "*"]
    assert ner_bits(2, []) == ["*", "*"]


def test_render_doc_layout():
    doc = render_doc("d1", "Alice Smith runs Apex.", [(0, 1, 3, 5)])
    lines = doc.split("\n")
    assert lines[0] == "#begin document (d1); part 000"
    assert lines[-1] == "#end document"
    row = lines[2].split("\t")  # token 1 = "Smith"
    assert row[0] == "d1" and row[2] == "1" and row[3] == "Smith"
    assert row[-1] == "(5" and lines[3].split("\t")[-1] == "5)"


def test_conll_round_trip_distributed(spark):
    """render_conll -> parse_conll reproduces the chunk set exactly,
    including nested and multi-sentence chunks."""
    pages = spark.createDataFrame(
        [
            ("u1", "Alice Smith met Bob Jones. She runs Apex Corp now."),
            ("u2", "GDC opened today."),
            ("u3", "no mentions here at all."),
        ],
        "url string, text string",
    )
    chunks = spark.createDataFrame(
        [
            ("u1", 0, 0, 2, 11),   # Alice Smith
            ("u1", 0, 1, 2, 12),   # Smith (nested, same end)
            ("u1", 0, 3, 5, 13),   # Bob Jones
            ("u1", 1, 2, 4, 14),   # Apex Corp (second sentence)
            ("u2", 0, 0, 1, 11),   # GDC (single token)
        ],
        "url string, sent_idx int, start int, end int, cluster_id long",
    )
    rendered = render_conll(pages, chunks)
    assert rendered.count() == 3  # every page renders, chunkless ones too
    back = parse_conll(rendered)
    want = {tuple(r) for r in chunks.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_render_matches_extractor_offsets(spark):
    """Chunks produced by the real extract kernel line up with the rendered
    token grid: every chunk's rendered words equal its span."""
    from berkeley_entity_spark.operators.extract import extract_mentions

    pages = spark.createDataFrame(
        [("u1", "The firm Apex Corp hired Alice Smith, Apex CEO .", "en")],
        "url string, text string, lang string",
    )
    m = extract_mentions(pages, appositive_subspans=True)
    chunks = m.select(
        "url", "sent_idx", "start", "end",
        F.abs(F.hash("norm_name")).alias("cluster_id"),
    )
    rendered = render_conll(pages, chunks)
    back = parse_conll(rendered)
    j = (
        back.alias("b")
        .join(
            m.alias("m"),
            (F.col("b.url") == F.col("m.url"))
            & (F.col("b.sent_idx") == F.col("m.sent_idx"))
            & (F.col("b.start") == F.col("m.start"))
            & (F.col("b.end") == F.col("m.end")),
        )
    )
    assert j.count() == m.count() == back.count()
