from __future__ import annotations

import random

from berkeley_entity_spark.operators.dedup import containment_pairs


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(rows, n=3, threshold=0.5, max_df=10**9):
    sh = {i: _shingles(t, n) for i, t in rows}
    df: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    cold = {i: {g for g in s if df[g] <= max_df} for i, s in sh.items()}
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(cold[a] & cold[b])
            if inter == 0:
                continue
            ca, cb = inter / len(sh[a]), inter / len(sh[b])
            if max(ca, cb) >= threshold:
                out[(a, b)] = (inter, ca, cb)
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["id_a"], r["id_b"]): (r["inter"], r["cont_a_in_b"], r["cont_b_in_a"])
        for r in containment_pairs(df, **kw).collect()
    }


def test_quote_detected_where_jaccard_fails(spark):
    big = " ".join(f"w{i}" for i in range(200))
    quote = " ".join(f"w{i}" for i in range(12))  # first 12 tokens
    got = _run(spark, [(1, big), (2, quote)], n=3, threshold=0.9)
    inter, c12, c21 = got[(1, 2)]
    assert c21 == 1.0  # quote fully contained in big
    assert inter == 10  # 12 tokens -> 10 trigrams
    jaccard = inter / (198 + 10 - inter)
    assert jaccard < 0.06  # the pair Jaccard-based dedup would miss


def test_matches_brute_force_random_corpus(spark):
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(60):
        k = rng.randint(3, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    # add explicit substring quotes
    for j, (i, t) in enumerate(rows[:10]):
        toks = t.split(" ")
        rows.append((1000 + j, " ".join(toks[: max(3, len(toks) // 2)])))
    for threshold in (0.4, 0.7, 0.95):
        got = _run(spark, rows, n=3, threshold=threshold, max_ngram_df=10**6)
        want = _brute(rows, n=3, threshold=threshold)
        assert set(got) == set(want), f"threshold={threshold}"
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-9
            assert abs(got[k][2] - want[k][2]) < 1e-9


def test_hot_shingle_cap_semantics(spark):
    # one shingle shared by ALL docs is hot under max_df=3 and must not
    # count toward intersections, while sizes still count the full set
    common = "x y z"
    rows = [(i, f"{common} u{i} v{i} w{i}") for i in range(5)]
    got = _run(spark, rows, n=3, threshold=0.1, max_ngram_df=3)
    want = _brute(rows, n=3, threshold=0.1, max_df=3)
    assert set(got) == set(want)


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"s{(i + j) % 9}" for j in range(8))) for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    df7 = df1.repartition(7)
    a = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df1, threshold=0.5).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df7, threshold=0.5).collect()
    }
    assert a == b
