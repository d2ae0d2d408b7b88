#!/usr/bin/env python3
"""Train the query-denotation chooser (SURVEY.md §2.6, round-5 task).

Reference: wiki/JointQueryDenotationChooser.scala — a log-linear model
over (query variant, denotation) features, trained by maximizing the
likelihood of the correct denotation while MARGINALIZING over which query
variant produced it (the latent-query objective of
JointQueryDenotationComputer.accumulateGradientAndComputeObjective).
This tool reproduces that objective exactly on a synthetic labeled set:

  L = log Σ_{(q,d): d = gold} exp s(q,d)  −  log Σ_{(q,d)} exp s(q,d)
  ∇ = E_{p restricted to gold}[f] − E_p[f]

with AdaGrad + lazy-L1 per-example updates (the repo's standard trainer
semantics, ml/train.adagrad_l1_train: eta=1.0, lambda=0.001, 20 epochs,
fixed-seed order), sparse because every (q,d) option activates ≤7 binary
features (operators/query_chooser featurizers — the reference templates).

Synthetic example generator: a title vocabulary with multi-word titles
that contain/extend each other, a vote DB whose counts sometimes
contradict the surface-match signal, and a gold policy the features can
express (exact surface match beats votes; otherwise the first nonempty
variant's top candidate) + 10% label noise so weights stay finite.
Baseline to beat: vote-argmax of the first nonempty variant — the exact
pre-round-5 behavior (operators/wiki.best_title_per_surface).

Output: berkeley_entity_spark/ml/query_chooser.json (6-decimal weights —
same knife-edge-free rounding contract as sentence_model.json).
Run: python tools/train_query_chooser.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from berkeley_entity_spark.operators.query_chooser import (  # noqa: E402
    QUERY_TYPES,
    featurize_query,
    featurize_query_denotation,
)

BASES = [
    "Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Kappa", "Sigma",
    "Omega", "Lambda", "Theta", "Micro", "Nano", "Hyper", "Ultra", "Meta",
]
SUFFIXES = ["", " Systems", " Group", " Labs", " Beta", " Corporation"]


def make_example(rng: np.random.RandomState):
    """One labeled example: surface, per-variant ranked candidates, gold."""
    base = BASES[rng.randint(len(BASES))]
    second = BASES[rng.randint(len(BASES))]
    surface = base if rng.rand() < 0.4 else f"{base} {second}"
    stoks = surface.split(" ")
    # variants FULL/FIRST/LAST, dedup keeping first (stable q_idx)
    raw = [surface, stoks[0], stoks[-1]]
    variants, seen = [], set()
    for q_idx, v in enumerate(raw):
        if v not in seen:
            seen.add(v)
            variants.append((q_idx, v))
    # candidate lists per variant: titles derived from the variant string
    # (so Contains/StartsWith fire) + distractors; votes shuffled so rank
    # sometimes contradicts the match signal
    cands: dict[str, list[str]] = {}
    for _, v in variants:
        if rng.rand() < 0.15:  # empty variant — nonempty=false path
            continue
        pool = [v + SUFFIXES[rng.randint(len(SUFFIXES))] for _ in range(2)]
        pool.append(BASES[rng.randint(len(BASES))])
        if rng.rand() < 0.6:
            pool.append(v)  # the exact-match denotation
        ranked = []
        for t in dict.fromkeys(pool):  # dedup keep order
            ranked.append((t, int(rng.randint(1, 200))))
        ranked.sort(key=lambda x: (-x[1], x[0]))
        cands[v] = [t for t, _ in ranked[:3]]
    if not cands:
        return None
    # gold policy (expressible in the reference features): exact surface
    # match anywhere wins; else top candidate of first nonempty variant
    gold = None
    for _, v in variants:
        for t in cands.get(v, []):
            if t.lower() == surface.lower():
                gold = t
                break
        if gold:
            break
    if gold is None:
        first_v = next(v for _, v in variants if v in cands)
        gold = cands[first_v][0]
    if rng.rand() < 0.1:  # label noise
        all_d = sorted({t for ts in cands.values() for t in ts})
        gold = all_d[rng.randint(len(all_d))]
    # option list: (q_idx, variant, den, rank-or-None, nonempty, first_ne)
    first_ne = min((q for q, v in variants if v in cands), default=None)
    dens = sorted({t for ts in cands.values() for t in ts})
    options = []
    for q_idx, v in variants:
        ne = v in cands
        for d in dens:
            rank = cands[v].index(d) + 1 if ne and d in cands[v] else None
            options.append((q_idx, v, d, rank, ne, q_idx == first_ne))
    return surface, options, gold


def feats_of(opt) -> list[str]:
    q_idx, v, d, rank, ne, fne = opt
    qt = QUERY_TYPES[q_idx]
    return featurize_query(qt, ne, fne) + featurize_query_denotation(qt, v, d, rank)


def train(examples, feat_index, eta=1.0, lam=0.001, epochs=20, seed=0):
    d = len(feat_index)
    w = np.zeros(d)
    g2 = np.full(d, 1e-8)
    exs = []
    for _, options, gold in examples:
        rows = [([feat_index[f] for f in feats_of(o)], o[2] == gold) for o in options]
        if any(g for _, g in rows):
            exs.append(rows)
    order = np.random.RandomState(seed).permutation(len(exs))
    for _ in range(epochs):
        for i in order:
            rows = exs[i]
            scores = np.array([w[idx].sum() for idx, _ in rows])
            scores -= scores.max()
            p = np.exp(scores)
            p /= p.sum()
            pg = np.where([g for _, g in rows], p, 0.0)
            pg /= pg.sum()
            grad: dict[int, float] = {}
            for (idx, _), pa, pb in zip(rows, p, pg):
                for j in idx:
                    grad[j] = grad.get(j, 0.0) + (pa - pb)
            jj = np.fromiter(grad.keys(), dtype=int)
            gv = np.fromiter(grad.values(), dtype=float)
            g2[jj] += gv * gv
            rate = eta / np.sqrt(g2[jj])
            z = w[jj] - rate * gv
            w[jj] = np.sign(z) * np.maximum(0.0, np.abs(z) - rate * lam)
    return w


def decode(options, weights: dict[str, float]) -> str:
    best = None
    for o in options:
        s = sum(weights.get(f, 0.0) for f in feats_of(o))
        key = (-s, o[0], o[2])
        if best is None or key < best[0]:
            best = (key, o[2])
    return best[1]


def baseline(options) -> str:
    """Vote-argmax of the first nonempty variant (pre-round-5 behavior)."""
    for o in sorted(options, key=lambda o: (o[0], o[2])):
        if o[4] and o[5] and o[3] == 1:
            return o[2]
    return sorted(o[2] for o in options)[0]


def main() -> None:
    rng = np.random.RandomState(11)
    examples = [e for e in (make_example(rng) for _ in range(6000)) if e]
    held_rng = np.random.RandomState(23)
    held = [e for e in (make_example(held_rng) for _ in range(1200)) if e]
    feats = sorted({f for _, options, _ in examples for o in options for f in feats_of(o)})
    feat_index = {f: i for i, f in enumerate(feats)}
    w = train(examples, feat_index)
    model = {f: round(float(w[i]), 6) for f, i in feat_index.items() if w[i] != 0.0}
    acc_m = sum(decode(o, model) == g for _, o, g in held) / len(held)
    acc_b = sum(baseline(o) == g for _, o, g in held) / len(held)
    print(
        f"train={len(examples)} held={len(held)} features={len(feats)} "
        f"nonzero={len(model)}\nheld-out accuracy: model={acc_m:.4f} "
        f"vote-argmax baseline={acc_b:.4f}"
    )
    if acc_m < acc_b:
        raise SystemExit("trained chooser does not beat the vote-argmax baseline")
    out = os.path.join(REPO, "berkeley_entity_spark", "ml", "query_chooser.json")
    with open(out, "w") as f:
        json.dump(dict(sorted(model.items())), f, indent=0, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
