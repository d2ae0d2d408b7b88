"""Soundex-class phonetic key (blocking.soundex_key_col): standard vectors
including the h/w merge rule, plus phonetic_pairs cap/shape."""

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.blocking import (
    phonetic_pairs,
    soundex_key_col,
)

# canonical American-Soundex test vectors (US Census / Knuth TAOCP v3):
# Tymczak and Pfister exercise the vowel-separator rule, Ashcraft the
# h/w merge rule, Honeyman the vowel-double-code rule.
VECTORS = {
    "robert": "R163",
    "rupert": "R163",
    "ashcraft": "A261",
    "ashcroft": "A261",
    "tymczak": "T522",
    "pfister": "P236",
    "honeyman": "H555",
    "smith": "S530",
    "smyth": "S530",
    "schmidt": "S530",
    "washington": "W252",
    "lee": "L000",
    "gutierrez": "G362",
    "jackson": "J250",
    "lukasiewicz": "L222",
    "wachs": "W200",
}


def test_soundex_standard_vectors(spark):
    df = spark.createDataFrame(
        [(n,) for n in VECTORS], "norm_name string"
    )
    got = {
        r["norm_name"]: r["k"]
        for r in df.select("norm_name", soundex_key_col().alias("k")).collect()
    }
    assert got == VECTORS


def test_soundex_keys_first_token_and_non_alpha(spark):
    df = spark.createDataFrame(
        [("smith john",), ("3m corp",), ("",)], "norm_name string"
    )
    got = [
        r["k"] for r in df.select(soundex_key_col().alias("k")).collect()
    ]
    assert got[0] == "S530"  # first token only
    assert got[1] is None  # non-alpha start -> no phonetic pass
    assert got[2] is None


def test_phonetic_pairs_cap_and_symmetry(spark):
    # 100 distinct names, all keying S530 (trailing vowels drop out of the
    # code): cap=8 keeps C(8,2)=28 pairs
    names = [("smith" + "a" * i,) for i in range(100)]
    df = spark.createDataFrame(names, "norm_name string")
    p = phonetic_pairs(df, id_col="norm_name", max_block=8)
    rows = p.collect()
    assert len(rows) == 28
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # deterministic under repartitioning
    p2 = phonetic_pairs(df.repartition(13), id_col="norm_name", max_block=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, p2.collect()))


def test_phonetic_pairs_links_spelling_variants(spark):
    df = spark.createDataFrame(
        [("smith",), ("smyth",), ("schmidt",), ("jones",)],
        "norm_name string",
    )
    p = phonetic_pairs(df, id_col="norm_name").collect()
    linked = {frozenset((r["id_a"], r["id_b"])) for r in p}
    assert frozenset(("smith", "smyth")) in linked
    assert frozenset(("schmidt", "smith")) in linked
    assert not any("jones" in s for s in linked)
