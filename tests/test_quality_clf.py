"""Hashed-gram quality classifier: scorer vs numpy reference, NB-init
separability, a distributed-vs-numpy full-batch gradient check, empty-doc
handling, partitioning invariance, and the shipped artifact's gate."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.selection import (
    classifier_features,
    classifier_score,
    load_default_quality_weights,
    train_text_classifier,
)

N_BUCKETS = 16


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _grams(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_scorer_matches_numpy(spark):
    rng = np.random.RandomState(7)
    w = [round(float(x), 6) for x in rng.randn(N_BUCKETS)]
    b = 0.25
    texts = ["the cat sat", "dog dog dog runs", "a b c d e"]
    out = {
        r["doc_id"]: r
        for r in classifier_score(_docs(spark, texts), w, b).collect()
    }
    for i, t in enumerate(texts):
        gs = _grams(t)
        logit = round(b + sum(w[_bucket(g)] for g in gs) / len(gs), 6)
        prob = round(1.0 / (1.0 + math.exp(-logit)), 6)
        assert out[i]["n_grams"] == len(gs)
        assert out[i]["logit"] == pytest.approx(logit, abs=1e-9)
        assert out[i]["prob"] == pytest.approx(prob, abs=1e-9)
        assert out[i]["kept"] == (prob >= 0.5)


def test_empty_doc_scores_sigmoid_bias(spark):
    out = classifier_score(_docs(spark, [""]), [1.0] * N_BUCKETS, -2.0).collect()[0]
    assert out["n_grams"] == 0
    assert out["logit"] == -2.0
    assert out["prob"] == pytest.approx(round(1 / (1 + math.exp(2.0)), 6))
    assert not out["kept"]


def test_nb_init_separates(spark):
    pos = _docs(spark, ["good great fine nice"] * 4)
    neg = _docs(spark, ["spam junk scam fraud"] * 4)
    w, b = train_text_classifier(pos, neg, n_buckets=N_BUCKETS, epochs=0)
    sp = classifier_score(pos, list(w), b).agg(F.min("prob")).collect()[0][0]
    sn = classifier_score(neg, list(w), b).agg(F.max("prob")).collect()[0][0]
    assert sp > 0.5 > sn


def test_distributed_gradient_matches_numpy(spark):
    """One GD epoch after NB init must equal the numpy full-batch update
    computed from the collected sparse features (M13-style check)."""
    pos = _docs(spark, ["aa bb cc", "aa cc", "bb bb aa"])
    neg = _docs(spark, ["xx yy", "yy zz xx", "zz zz"])
    w0, b0 = train_text_classifier(pos, neg, n_buckets=N_BUCKETS, epochs=0)
    w1, b1 = train_text_classifier(pos, neg, n_buckets=N_BUCKETS, epochs=1, lr=0.7)

    # numpy replay: features from the same labeled remapping (pos 2i, neg 2i+1)
    lab = pos.select((F.col("doc_id") * 2).alias("doc_id"), "text", F.lit(1.0).alias("y")).unionByName(
        neg.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text", F.lit(0.0).alias("y"))
    )
    feats = classifier_features(lab, N_BUCKETS).collect()
    ys = {r["doc_id"]: r["y"] for r in lab.select("doc_id", "y").collect()}
    docs = sorted({r["doc_id"] for r in feats})
    X = np.zeros((len(docs), N_BUCKETS))
    idx = {d: i for i, d in enumerate(docs)}
    for r in feats:
        X[idx[r["doc_id"]], int(r["bucket"])] += r["x"]
    y = np.array([ys[d] for d in docs])
    p = 1.0 / (1.0 + np.exp(-(X @ w0 + b0)))
    n = len(docs)
    w_exp = w0 - 0.7 * (X.T @ (p - y)) / n
    b_exp = b0 - 0.7 * float(np.sum(p - y)) / n
    assert np.allclose(w1, w_exp, atol=1e-9)
    assert b1 == pytest.approx(b_exp, abs=1e-9)


def test_partitioning_invariance(spark):
    docs = _docs(spark, [f"tok{i} tok{i+1} common word" for i in range(40)])
    w = [round(float(x), 6) for x in np.random.RandomState(3).randn(N_BUCKETS)]
    a = sorted(map(tuple, classifier_score(docs, w, 0.1).collect()))
    b = sorted(map(tuple, classifier_score(docs.repartition(11), w, 0.1).collect()))
    assert a == b


def test_default_artifact_present_and_gated(spark):
    loaded = load_default_quality_weights()
    assert loaded is not None
    w, b, n_buckets = loaded
    assert n_buckets == 256 and len(w) == 256
    # the training tool gates the artifact at held-out accuracy >= 0.95
    import json
    import os

    import berkeley_entity_spark

    path = os.path.join(
        os.path.dirname(berkeley_entity_spark.__file__), "ml", "quality_clf.json"
    )
    with open(path) as f:
        assert json.load(f)["held_out_accuracy"] >= 0.95
