"""Google-ngrams raw loader + copula pair counting vs a line-by-line
replication of the reference semantics (sem/GoogleNgramUtils.scala field
access, sem/QueryCountCollector.scala:94-131 patterns)."""

from __future__ import annotations

import pytest

from berkeley_entity_spark.sources.ngrams import (
    collect_query_counts,
    read_google_ngrams,
)

HEADS = ["company", "firm", "group", "city", "dog"]

ONEGMS = [
    "company 120",
    "firm 45",
    "nothead 999",
    "city\t33",          # tab-separated (Character.isWhitespace semantics)
    "group   7",         # multi-space run
]
THREEGMS = [
    "company is firm 10",
    "company was group 4",
    "firm IS company 6",       # copula match is case-insensitive (toLowerCase)
    "company likes firm 50",   # not a copula -> dropped
    "company is nothead 8",    # last word not a head -> dropped
    "nothead is firm 8",       # first word not a head -> dropped
    "dog is dog 5",            # identical ends -> dropped (first != second)
    "malformed line",          # wrong field count -> dropped
]
FOURGMS = [
    "company is a firm 3",
    "city was the group 2",
    "company is big firm 9",   # third word not an article -> dropped
    "company on a firm 9",     # second word not a copula -> dropped
]


def _reference_counts():
    """Pure-python replication of QueryCountCollector.count/countUnigram."""
    heads = set(HEADS)
    uni: dict[str, float] = {}
    for line in ONEGMS:
        f = line.split()
        if len(f) == 2 and f[0] in heads:
            uni[f[0]] = uni.get(f[0], 0.0) + float(f[1])
    pairs: dict[tuple[str, str], float] = {}
    for line in THREEGMS:
        f = line.split()
        if len(f) != 4 or f[0] not in heads or f[2] not in heads:
            continue
        if f[0] == f[2] or f[1].lower() not in ("is", "are", "was", "were"):
            continue
        c = float(f[3])
        for p in ((f[0], f[2]), (f[2], f[0])):
            pairs[p] = pairs.get(p, 0.0) + c
    for line in FOURGMS:
        f = line.split()
        if len(f) != 5 or f[0] not in heads or f[3] not in heads:
            continue
        if f[0] == f[3]:
            continue
        if f[1].lower() not in ("is", "are", "was", "were"):
            continue
        if f[2].lower() not in ("a", "an", "the"):
            continue
        c = float(f[4])
        for p in ((f[0], f[3]), (f[3], f[0])):
            pairs[p] = pairs.get(p, 0.0) + c
    return uni, pairs


@pytest.fixture(scope="module")
def counts_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gngrams")
    for d, lines in (("1gms", ONEGMS), ("3gms", THREEGMS), ("4gms", FOURGMS)):
        (root / d).mkdir()
        # two shards per dir: the loader must union shard files
        (root / d / "shard-00").write_text("\n".join(lines[::2]) + "\n")
        (root / d / "shard-01").write_text("\n".join(lines[1::2]) + "\n")
    return str(root)


def test_raw_loader_field_semantics(spark, counts_root):
    n1 = read_google_ngrams(spark, f"{counts_root}/1gms", 1)
    got = {(tuple(r["tokens"]), r["count"]) for r in n1.collect()}
    assert (("company",), 120.0) in got
    assert (("city",), 33.0) in got      # tab handled
    assert (("group",), 7.0) in got      # multi-space handled
    assert (("nothead",), 999.0) in got  # loader does not filter; joins do


def test_collect_query_counts_matches_reference(spark, counts_root):
    heads = spark.createDataFrame([(h,) for h in HEADS], "head string")
    uni_df, pair_df = collect_query_counts(spark, counts_root, heads)
    want_uni, want_pairs = _reference_counts()
    got_uni = {r["head"]: r["count"] for r in uni_df.collect()}
    got_pairs = {
        (r["head_a"], r["head_b"]): r["count"] for r in pair_df.collect()
    }
    assert got_uni == want_uni
    assert got_pairs == want_pairs
    # symmetry is structural
    for (a, b), c in got_pairs.items():
        assert got_pairs[(b, a)] == c
