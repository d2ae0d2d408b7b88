"""Sentence splitting (P2).

Reference: preprocess/SentenceSplitter.scala:57-96.  The reference scores
each regex-generated candidate boundary with a trained logistic model
(Gillick 2009 features).  We keep its exact candidate generator
(SentEndPattern ``[.?!]("|''|``|'|\\))? `` and the same substring bookkeeping,
SentenceSplitter.scala:63-86) and replace the learned accept/reject with a
deterministic rule tuned to the same feature signals: reject known
abbreviations and single-initial periods, accept when the following word is
capitalized / a quote / a digit.  The byte-identity invariant (BASELINE.md)
is carried by normalize.py; sentence boundaries only influence mention
windows and are covered by their own unit tests.
"""

from __future__ import annotations

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


def split_sentences(paragraphs: list[str]) -> list[str]:
    """Reference splitSentences:57-88 — identical substring bookkeeping:
    candidates with no previous or next space are dropped; the emitted
    sentence ends one char before the split (the boundary space)."""
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
            if _accept_split(prev_word, following):
                kept.append(split)
        curr = 0
        for split in kept:
            output.append(paragraph[curr : split - 1])
            curr = split
        output.append(paragraph[curr:])
    return output
