"""Similarity-kernel unit tests (known values + alignment semantics)."""

import numpy as np
import pytest

from berkeley_entity_spark.operators.features import (
    FEATURE_NAMES,
    featurize_pair,
    jaro_winkler,
    levenshtein_ratio,
    token_align,
    token_jaccard,
)


def test_jaro_winkler_known_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("dwayne", "duane") == pytest.approx(0.84, abs=1e-2)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_levenshtein_ratio():
    assert levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert levenshtein_ratio("abc", "abc") == 1.0
    assert levenshtein_ratio("", "abc") == 0.0


def test_token_jaccard():
    assert token_jaccard({"a", "b"}, {"b", "c"}) == pytest.approx(1 / 3)
    assert token_jaccard(set(), {"x"}) == 0.0


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (["a", "anderson"], ["c", "anderson"], 0.0),
        (["a", "smith"], ["alice", "lee", "smith"], 1.0),
        (["alice", "j", "smith"], ["alice", "joy", "smith"], 1.0),
        (["global", "data", "corp"], ["global", "data", "corporation"], 1.0),
        (["quantum", "energy", "corporation"], ["quantum", "freight", "corporation"], 0.0),
        (["alice", "jean", "harbis"], ["alice", "jean", "harris"], 1.0),
        (["martin"], ["martinez"], 0.0),
        (["a", "steinwood"], ["xenia", "a", "steinwood"], 0.0),
    ],
)
def test_token_align(a, b, expected):
    assert token_align(a, b) == expected


def test_featurize_shape_and_acronym_gate():
    v = featurize_pair("gdc", "global data corporation", {}, True, True)
    assert len(v) == len(FEATURE_NAMES)
    assert v[FEATURE_NAMES.index("acronym_match")] == 1.0
    # without the ALL-CAPS flag the acronym feature must not fire
    v2 = featurize_pair("aav", "alice ann vanceman", {}, False, False)
    assert v2[FEATURE_NAMES.index("acronym_match")] == 0.0
    assert np.isfinite(v).all() and np.isfinite(v2).all()


def test_feature_report(spark):
    """A11: per-template nonzero counts + means + active weights."""
    from berkeley_entity_spark.operators.features import FEATURE_NAMES
    from berkeley_entity_spark.operators.scoring import (
        feature_report,
        load_default_weights,
        score_pairs,
    )

    pairs = spark.createDataFrame(
        [("alice smith", "alice smith", False, False),
         ("alice smith", "bruno lopez", False, False)],
        "norm_a string, norm_b string, acr_a boolean, acr_b boolean",
    )
    scored = score_pairs(pairs, {})
    rep = {r["feature"]: r for r in feature_report(scored).collect()}
    assert set(rep) == {c for c in FEATURE_NAMES if c != "bias"}
    assert rep["exact_eq"]["nonzero_count"] == 1       # one identical pair
    assert rep["exact_eq"]["mean_value"] == 0.5
    assert rep["jaro_winkler"]["nonzero_count"] == 2   # sims always nonzero
    w = load_default_weights()
    assert rep["levenshtein"]["weight"] == w[FEATURE_NAMES.index("levenshtein")]


def test_hearst_features_reference_math(spark):
    """J8 bins (PairwiseIndexingFeaturizerJoint.scala:313-333): log10 bins
    with Scala toInt truncation-toward-zero (NOT floor) and the
    max(count, pairCount) zero guard."""
    from berkeley_entity_spark.operators.hearst import with_hearst_features

    pairs = spark.createDataFrame(
        [("city", "town"), ("city", "city"), ("city", "zebra"), ("a", "b")],
        "head_a string, head_b string",
    )
    wc = spark.createDataFrame(
        [("city", 1000.0), ("town", 2000.0), ("b", 0.0)], "head string, cnt double"
    )
    pc = spark.createDataFrame(
        # reversed orientation on purpose: the op symmetrizes
        [("town", "city", 523.0), ("b", "a", 2.0)],
        "head_x string, head_y string, cnt double",
    )
    got = {(r["head_a"], r["head_b"]): r for r in with_hearst_features(pairs, wc, pc).collect()}
    r = got[("city", "town")]
    assert r["hearst_present"]
    # log10(523)=2.7185 -> +0.5=3.2185 -> 3 ; *4+0.5=11.374 -> 11
    assert r["hearst_unnorm_bin"] == 3
    assert r["hearst_unnorm_fine_bin"] == 11
    # norm: 523/(1000*2000)=2.615e-4; log10=-3.5825; +0.5=-3.0825 -> toInt -3
    # (floor would give -4 — truncation toward zero is the reference rule)
    assert r["hearst_norm_bin"] == -3
    assert r["hearst_norm_fine_bin"] == -13  # -3.5825*4+0.5 = -13.83 -> -13
    assert not got[("city", "city")]["hearst_present"]   # same-head gate
    assert not got[("city", "zebra")]["hearst_present"]  # no pair count
    rb = got[("a", "b")]
    # zero guard: cnt_b = max(0, 2) = 2; norm = 2/(2*2) = 0.5
    assert rb["hearst_present"]
    assert rb["hearst_norm_bin"] == 0  # log10(.5)+.5=0.199 -> 0
