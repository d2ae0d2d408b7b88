"""Sentence splitting (P2).

Reference: preprocess/SentenceSplitter.scala:57-96.  The reference scores
each regex-generated candidate boundary with a trained logistic model
(Gillick 2009 features).  We keep its exact candidate generator
(SentEndPattern ``[.?!]("|''|``|'|\\))? `` and the same substring bookkeeping,
SentenceSplitter.scala:63-86) and provide BOTH accept policies:

* the deterministic rule (rounds 1-4 default): reject known abbreviations
  and single-initial periods, accept when the following word is
  capitalized / a quote / a digit;
* a TRAINED logistic model (round 5) over the reference's exact 11
  feature templates (SplitExample.featurize, SentenceSplitter.scala:98-130)
  — sparse string features -> indexed weights, trained with the repo's
  AdaGrad-L1 trainer (ml/train.py) on synthetic labeled boundaries
  (tools/train_sentence_model.py), frozen to ml/sentence_model.json.
  Scoring is a pure sum of weight lookups, so the accept decision is a
  codegen map-lookup expression in Spark and SQL-replayable in DuckDB
  (q_sent_split).

``split_sentences`` keeps the rule as its default: the frozen q_er_*
oracles/pins were derived under the rule, and the model is exposed as an
opt-in (``split_sentences(paragraphs, model=load_sentence_model())``).
The byte-identity invariant (BASELINE.md) is carried by normalize.py;
sentence boundaries only influence mention windows and are covered by
their own unit tests.
"""

from __future__ import annotations

import json
import re

# Exact candidate pattern from SentenceSplitter.scala:96.
SENT_END_PATTERN = re.compile(r"[.?!](\"|''|``|'|\))? ")

# Common abbreviations whose trailing period rarely ends a sentence —
# stands in for the learned weights on Prev=/LastChar= features.
ABBREVIATIONS = frozenset(
    {
        "mr.", "mrs.", "ms.", "dr.", "prof.", "sr.", "jr.", "st.", "rep.",
        "sen.", "gov.", "gen.", "col.", "lt.", "sgt.", "capt.", "cpl.",
        "corp.", "inc.", "ltd.", "co.", "vs.", "etc.", "e.g.", "i.e.",
        "jan.", "feb.", "mar.", "apr.", "jun.", "jul.", "aug.", "sep.",
        "sept.", "oct.", "nov.", "dec.", "u.s.", "u.k.", "u.n.", "d.c.",
        "a.m.", "p.m.", "no.", "dept.", "univ.", "assn.", "bros.", "ph.d.",
    }
)

_SINGLE_INITIAL = re.compile(r"(^|[ .])[A-Za-z]\.$")


def find_possible_splits(paragraph: str) -> list[int]:
    """Reference findPossibleSentenceSplits:182-191 — returns match *end*
    offsets (index of the first char after the boundary space)."""
    out = []
    idx = 0
    while True:
        m = SENT_END_PATTERN.search(paragraph, idx)
        if m is None:
            return out
        idx = m.end()
        out.append(idx)


def _accept_split(prev_word: str, following_word: str) -> bool:
    """Deterministic stand-in for the logistic score>0 decision
    (SentenceSplitter.scala:73-77)."""
    pw = prev_word if prev_word else " "
    fw = following_word if following_word else " "
    core = pw.rstrip(".\"')`'").lower() + "." if pw.endswith(".") else pw.lower()
    if pw.endswith(".") and (core in ABBREVIATIONS or pw.lower() in ABBREVIATIONS):
        return False
    if pw.endswith(".") and _SINGLE_INITIAL.search(pw):
        return False
    c = fw[0]
    return c.isupper() or c.isdigit() or c in "`'\"("


def featurize_split(prev_word: str, following_word: str) -> list[str]:
    """The reference's exact 11 feature templates, in its emission order
    (SplitExample.featurize, SentenceSplitter.scala:98-130).  Quirk kept:
    when prev_word is shorter than 2 chars the Scala `if (pw.size >= 2)
    pw(pw.size-2)` expression evaluates to Unit and string-concats as
    "()" — we emit the same literal so feature strings stay stable."""
    pw = prev_word if prev_word else " "
    fw = following_word if following_word else " "
    c = fw[0]
    if c.isupper():
        cls = "UC"
    elif c.islower():
        cls = "LC"
    elif not (c.isalpha() or c.isdigit()):
        cls = "PU"
    else:
        cls = "OTHER"
    lc, fc = pw[-1], fw[0]
    s2 = pw[-2] if len(pw) >= 2 else "()"
    return [
        "Bias=1",
        f"LastChar={lc}",
        f"FirstChar={fc}",
        f"LastCharFirstChar={lc}-{fc}",
        f"Prev={pw}",
        f"Next={fw}",
        f"PrevLen={len(pw)}",
        f"NextCls={cls}",
        f"LastCharNextCls={lc}-{cls}",
        f"SecondToLastCharNextCls={s2}-{cls}",
        f"PrevWordNextCls={pw}-{cls}",
    ]


def score_split(prev_word: str, following_word: str, model: dict[str, float]) -> float:
    """Linear score = sum of weights of PRESENT features (reference
    `feats.map(weights(_)).reduce(_+_)`, SentenceSplitter.scala:73-76);
    unseen features contribute 0 exactly like the reference's
    `indexOf == -1` drop (SentenceSplitter.scala:125-128)."""
    return sum(model.get(f, 0.0) for f in featurize_split(prev_word, following_word))


def load_sentence_model() -> dict[str, float]:
    """Frozen trained weights (tools/train_sentence_model.py).  Loaded via
    importlib.resources so spark-submit --py-files zipimport works (same
    pattern as ml/default_weights.npy)."""
    from importlib import resources

    data = resources.files("berkeley_entity_spark.ml").joinpath(
        "sentence_model.json"
    ).read_text()
    return {k: float(v) for k, v in json.loads(data).items()}


def split_sentences(
    paragraphs: list[str], model: dict[str, float] | None = None
) -> list[str]:
    """Reference splitSentences:57-88 — identical substring bookkeeping:
    candidates with no previous or next space are dropped; the emitted
    sentence ends one char before the split (the boundary space).

    model=None keeps the deterministic rule (the policy the frozen q_er_*
    oracles were derived under); pass ``load_sentence_model()`` for the
    trained logistic accept (score > 0, SentenceSplitter.scala:76-77)."""
    output: list[str] = []
    for paragraph in paragraphs:
        kept = []
        for split in find_possible_splits(paragraph):
            prev_start = paragraph[: split - 1].rfind(" ")
            next_end = paragraph.find(" ", split)
            if prev_start == -1 or next_end == -1:
                continue
            prev_word = paragraph[prev_start + 1 : split - 1]
            following = paragraph[split:next_end]
            accept = (
                score_split(prev_word, following, model) > 0.0
                if model is not None
                else _accept_split(prev_word, following)
            )
            if accept:
                kept.append(split)
        curr = 0
        for split in kept:
            output.append(paragraph[curr : split - 1])
            curr = split
        output.append(paragraph[curr:])
    return output
