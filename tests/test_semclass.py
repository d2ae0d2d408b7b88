"""SO5 WordNet-style semclass: bounded closure + priority cascade."""

import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.semclass import (
    bounded_hypernym_closure,
    semclass_for_words,
)
from berkeley_entity_spark.synth import generate_wordnet


@pytest.fixture(scope="module")
def wn(spark):
    lemmas, hyper, anchors = generate_wordnet(spark)
    closure = bounded_hypernym_closure(hyper, max_levels=10).cache()
    return lemmas, closure, anchors


def classify(spark, wn, words):
    lemmas, closure, anchors = wn
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = semclass_for_words(df, lemmas, closure, anchors)
    return {r["word"]: r["semclass"] for r in out.collect()}


def test_semclass_basic(spark, wn):
    got = classify(spark, wn, ["analyst", "city", "corporation", "market", "unknownword"])
    assert got == {
        "analyst": "Person", "city": "Location", "corporation": "Organization",
        "market": "Other", "unknownword": "Other",
    }


def test_priority_person_location_organization(spark, wn):
    # bank reaches BOTH Organization (bank.n.01) and Location (bank.n.02);
    # Location wins over Organization (SemClass.scala:63-71 order)
    got = classify(spark, wn, ["bank"])
    assert got["bank"] == "Location"


def test_bounded_depth_cap(spark, wn):
    # deepword's anchor is 13 hops up — beyond the 10-level recursion cap
    got = classify(spark, wn, ["deepword"])
    assert got["deepword"] == "Other"
    # sanity: with a deeper cap it WOULD classify
    lemmas, _, anchors = wn
    _, hyper, _ = generate_wordnet(spark)
    deep_closure = bounded_hypernym_closure(hyper, max_levels=14)
    df = spark.createDataFrame([("deepword",)], "word string")
    out = semclass_for_words(df, lemmas, deep_closure, anchors)
    assert out.collect()[0]["semclass"] == "Organization"


def test_anchor_word_itself(spark, wn):
    # a word whose synset IS one hop from the anchor still classifies
    got = classify(spark, wn, ["partnership", "officials"])
    assert got["partnership"] == "Organization"
    assert got["officials"] == "Person"
