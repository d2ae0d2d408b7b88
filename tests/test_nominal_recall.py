"""P4 nominal-chunker quality audit (VERDICT r3 item 6).

The reference extracts NOMINAL mentions from constituency-parse NP spans
and its assembler audits specific error classes — coordination, PP
attachment, appositives, relative clauses (CorefDocAssembler.scala:
506-556).  The parser is out of scope (external model), so the DT-led
chunker analog gets a MEASURED quality bar here: a labeled synthetic set
covering that taxonomy, with head-recall (does some chunk in the sentence
carry the gold head? — what head-match coreference resolution needs) and
exact-span recall floors.

Known, deliberate gaps (parser-requiring, asserted as such below so a
regression OR an accidental fix both surface): the bare second conjunct of
an NP-internal coordination ("the cats and DOGS") has no determiner, and a
possessive's outer head ("a customer 's ORDER") needs the clitic treated
as NP-internal.
"""

from __future__ import annotations

from berkeley_entity_spark.operators.extract import _nominals_from_text

# (category, pre-tokenized sentence, gold NP mentions (start, end, head))
CASES = [
    ("simple", "the company reported strong growth", [(0, 2, "company")]),
    ("simple", "an engineer joined the project",
     [(0, 2, "engineer"), (3, 5, "project")]),
    ("adjective", "the large firm expanded quickly", [(0, 3, "firm")]),
    ("pp_attach", "the chief of the division resigned", [(0, 5, "chief")]),
    ("pp_attach", "a report on the merger appeared", [(0, 5, "report")]),
    ("coord_np", "the cats and dogs ran away",
     [(0, 2, "cats"), (3, 4, "dogs")]),
    ("coord_two_np", "the board and the panel agreed",
     [(0, 2, "board"), (3, 5, "panel")]),
    ("relative", "the man who spoke has left", [(0, 2, "man")]),
    ("possessive", "a customer 's order arrived today", [(0, 4, "order")]),
    ("appositive", "the ceo , a founder , spoke",
     [(0, 2, "ceo"), (3, 5, "founder")]),
    ("long_np", "the very large regional sales team met", [(0, 6, "team")]),
]


def _recalls():
    tot = head = span = 0
    by_cat: dict[str, list[int]] = {}
    for cat, text, gold in CASES:
        got = _nominals_from_text(text)
        heads = {(s, sp.rsplit(" ", 1)[-1]) for s, a, b, sp in got}
        spans = {(s, a, b) for s, a, b, sp in got}
        for (ga, gb, gh) in gold:
            tot += 1
            h = (0, gh) in heads
            sp = (0, ga, gb) in spans
            head += h
            span += sp
            by_cat.setdefault(cat, [0, 0, 0])
            by_cat[cat][0] += 1
            by_cat[cat][1] += h
            by_cat[cat][2] += sp
    return head / tot, span / tot, by_cat


def test_head_and_span_recall_floors():
    head_r, span_r, _ = _recalls()
    # measured 0.867 / 0.733 at pin time; floors leave one-case headroom
    assert head_r >= 0.85, head_r
    assert span_r >= 0.70, span_r


def test_known_parser_gaps_are_exactly_the_misses():
    """The ONLY head misses are the two declared parser-requiring classes.
    If a rule change accidentally fixes or breaks others, this fails and
    the docstring/COVERAGE note must be updated."""
    _, _, by_cat = _recalls()
    missed = {c for c, (n, h, _) in by_cat.items() if h < n}
    assert missed == {"coord_np", "possessive"}, missed


def test_simple_classes_are_perfect():
    _, _, by_cat = _recalls()
    for cat in ("simple", "adjective", "relative", "appositive",
                "coord_two_np", "pp_attach", "long_np"):
        n, h, _ = by_cat[cat]
        assert h == n, (cat, by_cat[cat])
