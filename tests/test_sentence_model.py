"""Trained sentence-boundary classifier (SURVEY.md P2, round-5 closure of
the last replaced-learned-with-rule seam).  Reference semantics:
preprocess/SentenceSplitter.scala:57-130."""

import importlib.util
import os

import numpy as np

from berkeley_entity_spark.preprocess.sentence import (
    _accept_split,
    featurize_split,
    load_sentence_model,
    score_split,
    split_sentences,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "train_sentence_model", os.path.join(REPO, "tools", "train_sentence_model.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_featurize_templates_and_unit_quirk():
    feats = featurize_split("Inc.", "Next")
    assert feats[0] == "Bias=1"
    assert "LastChar=." in feats and "FirstChar=N" in feats
    assert "PrevLen=4" in feats and "NextCls=UC" in feats
    assert "SecondToLastCharNextCls=c-UC" in feats
    # Scala `if (pw.size >= 2) pw(pw.size-2)` yields Unit -> "()" for
    # 1-char prev words; the port emits the same literal
    assert "SecondToLastCharNextCls=()-UC" in featurize_split("a", "Next")


def test_model_loads_and_scores():
    m = load_sentence_model()
    assert len(m) > 100
    # conventional boundary: period then capitalized word -> accept
    assert score_split("table.", "Next", m) > 0
    # "Dr. Smith" trap -> reject
    assert score_split("Dr.", "Smith", m) < 0


def test_model_beats_rule_on_held_out():
    tool = _tool()
    held = tool.labeled_examples(np.random.RandomState(123), 400)
    m = load_sentence_model()
    acc_model = tool.accuracy(held, lambda pw, fw: score_split(pw, fw, m) > 0)
    acc_rule = tool.accuracy(held, _accept_split)
    assert acc_model >= acc_rule
    assert acc_model >= 0.97


def test_split_sentences_model_path():
    m = load_sentence_model()
    para = ["The table was fast. Dr. Smith ran the query. It worked."]
    out = split_sentences(para, model=m)
    assert out == [
        "The table was fast.",
        "Dr. Smith ran the query.",
        "It worked.",
    ]
    # rule default unchanged (frozen q_er_* oracles were derived under it)
    assert split_sentences(para) == out
