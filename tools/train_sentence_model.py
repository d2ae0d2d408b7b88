#!/usr/bin/env python3
"""Train the sentence-boundary logistic model (SURVEY.md P2, round-5 task).

Reference: preprocess/SentenceSplitter.scala:57-130 — a logistic model over
Gillick-2009 string features decides accept/reject per candidate boundary.
This tool closes the repo's last "replaced-learned-with-rule" seam: it
generates a deterministic synthetic labeled corpus, featurizes candidates
with the reference's exact 11 templates (preprocess/sentence.featurize_split)
and trains with the same AdaGrad-L1 semantics as ml/train.adagrad_l1_train
(eta=1.0, lambda=0.001, 20 epochs, per-example updates, fixed-seed shuffle)
— re-implemented sparsely here because each example has exactly 11 active
binary features, so a dense (n x d) matrix would be pure waste.

Corpus design (why the model can BEAT the deterministic rule):
  * conventional sentences: end [.?!], next starts uppercase/digit — both
    policies get these right;
  * mid-sentence abbreviation traps ("Dr. Smith", "U.S. policy",
    "J. Smith") — both reject;
  * corporate-suffix abbreviations at TRUE sentence ends ("... Acme Inc.
    Next quarter ...") — the rule always rejects (Inc. is in the
    abbreviation lexicon); the model learns Prev=Inc.-UC is usually a
    boundary while Prev=Dr.-UC usually is not;
  * lowercase continuation after ?/! ("really? yes it was.") — a true
    boundary the rule rejects (lowercase next); the model learns
    LastChar=?-LC is positive.

Output: berkeley_entity_spark/ml/sentence_model.json (feature -> weight,
zero weights pruned, keys sorted) + a held-out accuracy report comparing
model vs rule.  Run: python tools/train_sentence_model.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from berkeley_entity_spark.preprocess.sentence import (  # noqa: E402
    _accept_split,
    featurize_split,
    find_possible_splits,
)

# vocab overlaps the synthetic documents tables (TESTDATA.md) so the frozen
# Prev=/Next= weights also fire on q_sent_split's sentence-ified corpus
WORDS = (
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window spark order data column join small customer query big group "
    "filter vector stream the a"
).split()
NAMES = ["Smith", "Jones", "Parker", "Chen", "Garcia", "Acme", "Baker", "Davis"]
TITLES = ["Dr.", "Mr.", "Mrs.", "Prof.", "Gen.", "Sen."]  # mid-sentence traps
CORP = ["Inc.", "Ltd.", "Corp.", "Co."]  # sentence-final abbreviations
GEO = ["U.S.", "U.K.", "D.C."]


def make_sentence(rng: np.random.RandomState) -> str:
    """One sentence with known-internal non-boundaries (traps)."""
    n = rng.randint(4, 10)
    toks = [WORDS[rng.randint(len(WORDS))] for _ in range(n)]
    r = rng.rand()
    if r < 0.22:  # "Dr. Smith" style trap
        i = rng.randint(n - 1)
        toks[i] = TITLES[rng.randint(len(TITLES))]
        toks[i + 1] = NAMES[rng.randint(len(NAMES))]
    elif r < 0.34:  # "U.S. policy" trap — abbrev + lowercase continuation
        toks[rng.randint(n - 1)] = GEO[rng.randint(len(GEO))]
    elif r < 0.44:  # single-initial trap "J. Smith"
        i = rng.randint(n - 1)
        toks[i] = chr(ord("A") + rng.randint(26)) + "."
        toks[i + 1] = NAMES[rng.randint(len(NAMES))]
    elif r < 0.54:  # corporate suffix at sentence END ("... Acme Inc.")
        toks[-1] = NAMES[rng.randint(len(NAMES))]
        toks.append(CORP[rng.randint(len(CORP))])
    # sentence-initial casing: mostly uppercase, sometimes digit
    if rng.rand() < 0.12:
        toks[0] = str(rng.randint(2, 99))
    else:
        toks[0] = toks[0][0].upper() + toks[0][1:]
    end = toks[-1]
    if not end.endswith("."):
        r = rng.rand()
        punct = "." if r < 0.7 else ("?" if r < 0.85 else "!")
        if rng.rand() < 0.12:
            punct += '"'
        toks[-1] = end + punct
    return " ".join(toks)


def make_paragraph(rng: np.random.RandomState) -> tuple[str, set[int]]:
    """A paragraph + the set of TRUE boundary offsets (find_possible_splits
    convention: index of the first char after the boundary space)."""
    n_sent = rng.randint(2, 6)
    sents = [make_sentence(rng) for _ in range(n_sent)]
    # lowercase continuation after ?/! — a true boundary the rule rejects
    for i in range(1, n_sent):
        if sents[i - 1][-1] in "?!" and rng.rand() < 0.5:
            s = sents[i]
            if s[0].isupper() and not s.split(" ", 1)[0].endswith("."):
                sents[i] = s[0].lower() + s[1:]
    para = " ".join(sents)
    bounds, off = set(), 0
    for s in sents[:-1]:
        off += len(s) + 1
        bounds.add(off)
    return para, bounds


def labeled_examples(rng: np.random.RandomState, n_paragraphs: int):
    """(prev_word, following_word, label) per candidate, the exact
    substring bookkeeping of splitSentences (SentenceSplitter.scala:63-86)."""
    out = []
    for _ in range(n_paragraphs):
        para, bounds = make_paragraph(rng)
        for split in find_possible_splits(para):
            prev_start = para[: split - 1].rfind(" ")
            next_end = para.find(" ", split)
            if prev_start == -1 or next_end == -1:
                continue
            pw = para[prev_start + 1 : split - 1]
            fw = para[split:next_end]
            out.append((pw, fw, split in bounds))
    return out


def sparse_adagrad_l1(
    examples, feat_index: dict[str, int],
    eta: float = 1.0, lam: float = 0.001, epochs: int = 20, seed: int = 0,
) -> np.ndarray:
    """ml/train.adagrad_l1_train semantics on 11-hot sparse rows: per-example
    AdaGrad with lazy L1 soft-threshold, fixed-seed permutation order."""
    d = len(feat_index)
    w = np.zeros(d)
    g2 = np.full(d, 1e-8)
    rows = [
        (
            [feat_index[f] for f in featurize_split(pw, fw) if f in feat_index],
            1.0 if y else 0.0,
        )
        for pw, fw, y in examples
    ]
    order = np.random.RandomState(seed).permutation(len(rows))
    for _ in range(epochs):
        for i in order:
            idx, yi = rows[i]
            s = max(-30.0, min(30.0, float(w[idx].sum())))
            g = (1.0 / (1.0 + math.exp(-s))) - yi  # active features all 1.0
            g2[idx] += g * g
            rate = eta / np.sqrt(g2[idx])
            z = w[idx] - rate * g
            w[idx] = np.sign(z) * np.maximum(0.0, np.abs(z) - rate * lam)
    return w


def accuracy(examples, decide) -> float:
    ok = sum(1 for pw, fw, y in examples if decide(pw, fw) == y)
    return ok / max(len(examples), 1)


def main() -> None:
    rng = np.random.RandomState(42)
    train = labeled_examples(rng, 4000)
    held = labeled_examples(np.random.RandomState(7), 800)
    # min-count cutoff (the reference's lexical-cutoff move, SURVEY A1):
    # rare Prev=/Next= tail features barely affect accuracy but triple the
    # weight map — and Spark's map-literal element_at is a LINEAR scan per
    # lookup, so model size is directly q_sent_split's per-row cost
    # (measured 7.2s -> ~2s at sf0.1 shrinking 1334 -> ~300 entries)
    from collections import Counter

    freq = Counter(
        f for pw, fw, _ in train for f in featurize_split(pw, fw)
    )
    feats = sorted(f for f, c in freq.items() if c >= 5)
    feat_index = {f: i for i, f in enumerate(feats)}
    w = sparse_adagrad_l1(train, feat_index)
    # 6-decimal weights: every 11-term score is then ~1e-10 away from a
    # multiple of 1e-6, so round(score, 6) can never land on a half-point
    # knife-edge where Spark and DuckDB round differently (a 9-decimal
    # artifact actually hit one at sf0.01: score 6.9041785 exactly)
    model = {f: round(float(w[i]), 6) for f, i in feat_index.items() if w[i] != 0.0}

    def model_decide(pw, fw):
        return sum(model.get(f, 0.0) for f in featurize_split(pw, fw)) > 0.0

    acc_model = accuracy(held, model_decide)
    acc_rule = accuracy(held, _accept_split)
    pos = sum(1 for _, _, y in held if y)
    print(
        f"train={len(train)} held={len(held)} (pos={pos}) features={len(feats)} "
        f"nonzero={len(model)}\nheld-out accuracy: model={acc_model:.4f} "
        f"rule={acc_rule:.4f}"
    )
    if acc_model < acc_rule:
        raise SystemExit("trained model does not beat the deterministic rule")
    out = os.path.join(REPO, "berkeley_entity_spark", "ml", "sentence_model.json")
    with open(out, "w") as f:
        json.dump(dict(sorted(model.items())), f, indent=0, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
