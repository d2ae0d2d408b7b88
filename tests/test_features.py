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


def test_token_align_pathological_headline_fast():
    """Adversarial Title-Case headline pair: near-identical long token lists
    with every token cross-compatible used to blow up the un-memoized
    backtracking search; memoized it is O(n·m²) and must return instantly."""
    import time

    # 24 tokens, all mutually prefix/typo-compatible in many positions
    a = [f"corp{i:02d}" for i in range(24)]
    b = a[:12] + ["corpxx"] + a[12:]
    t0 = time.perf_counter()
    token_align(a, b)
    token_align(b, a)
    # worst case: all-same token lists (maximal branching)
    token_align(["corp"] * 24, ["corp"] * 25)
    assert time.perf_counter() - t0 < 2.0


def test_extraction_caps_headline_runs():
    """A >MAX_MENTION_TOKENS capitalized run (Title-Case headline) must not
    become a mention; a run at the cap must."""
    from berkeley_entity_spark.operators.extract import (
        MAX_MENTION_TOKENS,
        _mentions_from_text,
    )

    head = " ".join(f"Word{i}" for i in range(MAX_MENTION_TOKENS + 5))
    got = _mentions_from_text(f"and then {head} happened.")
    assert got == []
    ok = " ".join(f"Word{i}" for i in range(MAX_MENTION_TOKENS))
    got2 = _mentions_from_text(f"and then {ok} happened.")
    assert len(got2) == 1 and got2[0][3] == ok


def test_appositive_subspan_retention():
    """P9 (CorefDocAssembler.scala:157-189): an appositive-like multi-token
    run additionally yields its head-token nested span — flag-gated, default
    off."""
    from berkeley_entity_spark.operators.extract import _mentions_from_text

    # PTB-style comma placement — the reference retains sub-spans over
    # tokenized text where ',' is its own token
    text = "and then Alice Smith , Apex CEO announced results ."
    base = _mentions_from_text(text)
    spans = {m[3] for m in base}
    assert "Alice Smith" in spans
    with_sub = _mentions_from_text(text, appositive_subspans=True)
    extra = set(with_sub) - set(base)
    # exactly one retained nested candidate: the head token of the
    # appositive run, ending at the same position, flagged appositive
    assert len(extra) == 1
    (s_idx, a, b, span, appos) = next(iter(extra))
    assert b - a == 1 and appos
    # the nested span is the run's last token
    parent = [m for m in base if m[4] and m[2] == b and m[1] < a]
    assert parent and parent[0][3].split(" ")[-1] == span
    # a single-token appositive run must NOT duplicate itself
    one = _mentions_from_text("and then Apex , a firm .", appositive_subspans=True)
    assert len(one) == len(_mentions_from_text("and then Apex , a firm ."))


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


def test_prune_threshold_edge_set_identical(spark):
    """The codegen coarse bound (CorefPruner.scala:36-47 cascade analog) must
    drop ONLY sub-threshold pairs: above-threshold (node_a, node_b, score)
    rows are bit-identical with and without pruning, across a pair mix that
    exercises every bound term (exact-ish, acronym, subset, typo, junk)."""
    from berkeley_entity_spark.operators.scoring import score_pairs, weights_vector

    import __spark_entry__ as entry

    rows = [
        ("alice smith", "alice smith jones", False, False),
        ("alice smith", "alicia smith", False, False),
        ("gdc", "global data corporation", True, False),
        ("gdc", "gdc", True, True),
        ("alpha beta", "zeta omega", False, False),
        ("the quick brown", "over lazy dogs", False, False),
        ("acme corp", "acme corporation", False, False),
        ("j r smith", "john ronald smith", False, False),
    ]
    pairs = spark.createDataFrame(
        [(i, 1000 + i, a, b, fa, fb) for i, (a, b, fa, fb) in enumerate(rows)],
        "node_a long, node_b long, norm_a string, norm_b string, "
        "acr_a boolean, acr_b boolean",
    )
    w = weights_vector(entry.ORACLE_ER_WEIGHTS)
    thr = entry.ORACLE_ER_THRESHOLD
    full = score_pairs(pairs, {}, weights=w)
    pruned = score_pairs(pairs, {}, weights=w, features_out=False, prune_threshold=thr)

    def above(df):
        return {
            (r["node_a"], r["node_b"], r["score"])
            for r in df.where(f"score > {thr}").collect()
        }

    assert above(pruned) == above(full)
    assert len(above(full)) >= 2  # the mix actually produces matches
    # and the prune really filters: junk pairs never reach the kernel
    assert pruned.count() < len(rows)


def test_features_out_false_scores_identical(spark):
    """features_out=False skips zero-weight Python features but the score
    column must be bit-identical to the full-featured path (0-weight => 0
    dot-product term), and the output schema shrinks to input + score."""
    from berkeley_entity_spark.operators.scoring import score_pairs, weights_vector

    import __spark_entry__ as entry

    pairs = spark.createDataFrame(
        [("alice smith", "alicia smith", False, False),
         ("acme corp", "acme corporation", False, False),
         ("alpha beta", "zeta omega", False, False)],
        "norm_a string, norm_b string, acr_a boolean, acr_b boolean",
    )
    w = weights_vector(entry.ORACLE_ER_WEIGHTS)
    full = {(r["norm_a"], r["norm_b"]): r["score"]
            for r in score_pairs(pairs, {}, weights=w).collect()}
    slim_df = score_pairs(pairs, {}, weights=w, features_out=False)
    assert slim_df.columns == ["norm_a", "norm_b", "acr_a", "acr_b", "score"]
    slim = {(r["norm_a"], r["norm_b"]): r["score"] for r in slim_df.collect()}
    assert slim == full


def test_contract_local_preserves_components(spark):
    """_contract_local (per-partition union-find) must leave global
    components unchanged for any partitioning — chain spanning partitions,
    star, isolated pair, dupes and self-loops in the input."""
    from berkeley_entity_spark.operators.clustering import (
        _contract_local,
        connected_components,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
             (10, 11), (10, 12), (10, 13),        # star
             (20, 21), (21, 20), (21, 21),        # dupes + self-loop
             (30, 31)]
    for n_parts in (1, 3, 7):
        df = spark.createDataFrame(edges, "u long, v long").repartition(n_parts)
        comp = {r["node_id"]: r["component"]
                for r in connected_components(df).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                        10: 10, 11: 10, 12: 10, 13: 10,
                        20: 20, 21: 20, 30: 30, 31: 30}
        contracted = _contract_local(df)
        # contraction alone: stars to per-partition minima, no self-loops,
        # u > v orientation
        rows = contracted.collect()
        assert all(r["u"] > r["v"] for r in rows)


def test_candidate_pairs_prune_same_edges(spark, tiny_corpus):
    """candidate_pairs(prune=...) must yield the exact same above-threshold
    edge set (node_a, node_b, score) as the unpruned path — the pre-dedup
    prune only removes pairs that can never decode as matches."""
    from berkeley_entity_spark.config import PipelineConfig
    from berkeley_entity_spark.operators.blocking import candidate_pairs, distinct_surfaces
    from berkeley_entity_spark.operators.extract import extract_mentions
    from berkeley_entity_spark.operators.scoring import score_pairs, weights_vector

    import __spark_entry__ as entry

    _, pages, _ = tiny_corpus
    cfg = PipelineConfig()
    mentions = extract_mentions(pages).localCheckpoint(eager=True)
    surfaces = distinct_surfaces(mentions).persist()
    n = surfaces.count()
    w = weights_vector(entry.ORACLE_ER_WEIGHTS)
    thr = entry.ORACLE_ER_THRESHOLD

    def edges(prune):
        pairs = candidate_pairs(
            mentions, cfg, surfaces=surfaces, n_surfaces=n, prune=prune
        )
        scored = score_pairs(pairs, {}, weights=w, features_out=False)
        return {
            (r["node_a"], r["node_b"], r["score"])
            for r in scored.where(f"score > {thr}").collect()
        }

    full = edges(None)
    pruned = edges((w, thr))
    assert pruned == full
    assert len(full) > 0
    # schema contract identical on both paths
    cols = candidate_pairs(mentions, cfg, surfaces=surfaces, n_surfaces=n).columns
    cols_p = candidate_pairs(
        mentions, cfg, surfaces=surfaces, n_surfaces=n, prune=(w, thr)
    ).columns
    assert cols == cols_p
