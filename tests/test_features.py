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
