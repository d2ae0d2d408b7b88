"""NER operators: reference-ported shape/class functions, exact Viterbi."""

import itertools

import numpy as np

from berkeley_entity_spark.operators.ner import (
    LABELS,
    class_for,
    emission_scores,
    ner_tag_pages,
    prefix_for,
    shape_for,
    suffix_for,
    transition_matrix,
    viterbi_bio,
)


def test_shape_for_reference_cases():
    # hand-traced through NerFeaturizer.scala:171-187 semantics
    assert shape_for("Obama") == "Xxxe"
    assert shape_for("IBM") == "XXe"
    assert shape_for("ab") == "xx"
    assert shape_for("aaa") == "xxe"
    assert shape_for("aaaa") == "xxe"  # further repeats dropped
    assert shape_for("1234") == "dde"
    assert shape_for("A1-B2") == "Xd-Xd"
    assert shape_for("") == ""


def test_class_for_reference_cases():
    assert class_for("Obama") == "-INITC"
    assert class_for("DOW") == "-CAPS"
    assert class_for("cats") == "-LC-s"
    assert class_for("running") == "-LC-ing"
    assert class_for("80s") == "-LC-NUM-s"
    assert class_for("X-ray") == "-INITC-DASH"
    assert class_for("bus") == "-LC"  # -us guard
    assert class_for("mess") == "-LC"  # -ss guard


def test_affixes():
    assert prefix_for("corporation") == "corp"
    assert suffix_for("corporation") == "tion"
    assert prefix_for("ab") == "ab" and suffix_for("ab") == "ab"


def _brute_force(E, T):
    n, k = E.shape
    best, best_score = None, -np.inf
    illegal_start = {j for j, lb in enumerate(LABELS) if lb.startswith("I-")}
    for path in itertools.product(range(k), repeat=n):
        if path[0] in illegal_start:
            continue
        s = E[0, path[0]]
        ok = True
        for i in range(1, n):
            t = T[path[i - 1], path[i]]
            if t <= -1e8:
                ok = False
                break
            s += t + E[i, path[i]]
        if ok and s > best_score + 1e-12:
            best, best_score = path, s
    return [LABELS[j] for j in best]


def test_viterbi_exact_vs_brute_force():
    rng = np.random.RandomState(3)
    T = transition_matrix()
    for _ in range(25):
        n = rng.randint(1, 5)
        E = rng.standard_normal((n, len(LABELS))) * 2
        got = viterbi_bio(E, T)
        want = _brute_force(E, T)
        gs = _score(got, E, T)
        ws = _score(want, E, T)
        assert abs(gs - ws) < 1e-9, (got, want)


def _score(labels, E, T):
    idx = [LABELS.index(lb) for lb in labels]
    s = E[0, idx[0]]
    for i in range(1, len(idx)):
        s += T[idx[i - 1], idx[i]] + E[i, idx[i]]
    return s


def test_emissions_use_dictionaries():
    E = emission_scores(["said", "Alice", "Smith"], frozenset({"alice", "smith"}), frozenset())
    labels = viterbi_bio(E, transition_matrix())
    assert labels[0] == "O"
    assert labels[1] == "B-PER" and labels[2] == "I-PER"


def test_ner_tag_pages_bio_legality(spark):
    from berkeley_entity_spark.config import SynthConfig
    from berkeley_entity_spark.synth import generate_webpages

    pages, _ = generate_webpages(spark, SynthConfig(n_pages=40, n_entities=20))
    tags = ner_tag_pages(pages.where("lang = 'en'")).collect()
    assert any(r["label"] == "B-PER" for r in tags)
    assert any(r["label"] == "B-ORG" for r in tags)
    # BIO legality over the emitted sequence
    by_sent = {}
    for r in tags:
        by_sent.setdefault((r["url"], r["sent_idx"]), []).append(
            (r["tok_idx"], r["label"])
        )
    for seq in by_sent.values():
        seq.sort()
        prev = "O"
        for _, lab in seq:
            if lab.startswith("I-"):
                t = lab[2:]
                assert prev in (f"B-{t}", f"I-{t}"), (prev, lab)
            prev = lab
