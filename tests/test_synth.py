"""Generator invariants: determinism, injectivity, gold/extraction agreement."""

from berkeley_entity_spark.config import SynthConfig
from berkeley_entity_spark.operators.extract import _mentions_from_text
from berkeley_entity_spark.synth import (
    FIRST,
    LAST,
    ORG_CAPACITY,
    PERSON_CAPACITY,
    _lev,
    entity_canonical,
    entity_surface,
    make_page,
)


def test_determinism():
    cfg = SynthConfig(n_pages=10, n_entities=30)
    assert make_page(3, cfg) == make_page(3, cfg)
    assert entity_surface(4, 2, 30) == entity_surface(4, 2, 30)


def test_canonical_injective():
    from berkeley_entity_spark.synth import ENTITY_CAPACITY

    n = ENTITY_CAPACITY
    names = set()
    for e in range(n):
        name, _ = entity_canonical(e, n)
        assert name not in names, f"duplicate canonical at eid {e}: {name}"
        names.add(name)


def test_pool_edit_distances():
    for pool in (LAST, FIRST):
        for i, a in enumerate(pool):
            for b in pool[i + 1 :]:
                assert _lev(a.lower(), b.lower()) >= 3, (a, b)


def test_initials_unique_within_surname():
    # within one surname, all first names have distinct initials
    assert len({f[0] for f in FIRST}) == len(FIRST)


def test_gold_matches_extractor():
    cfg = SynthConfig(n_pages=120, n_entities=40)
    for i in range(120):
        page, gold = make_page(i, cfg)
        pred = {(s, a, b) for s, a, b, *_ in _mentions_from_text(page["text"])}
        expect = {(m["sent_idx"], m["start"], m["end"]) for m in gold}
        assert pred == expect, f"page {i}"


def test_surface_variants_cover_phenomena():
    # person: canonical, caps, initials, drop-middle, typo, middle-initial
    surfs = {entity_surface(0, v, 40) for v in range(6)}
    assert len(surfs) == 6
    canon, kind = entity_canonical(0, 40)
    assert kind == "person"
    assert canon in surfs and canon.upper() in surfs
    # org acronym exists
    canon_o, kind_o = entity_canonical(1, 40)
    assert kind_o == "org"
    acr = entity_surface(1, 2, 40)
    assert acr.isupper() and len(acr) == 3


def test_nominal_chunker_cases():
    """P4 analog: DT-led nominal chunks — determiner kept in the span,
    runs stop at function words / verb morphology / nested determiners,
    truncate at MAX_NOMINAL_TOKENS=5."""
    from berkeley_entity_spark.operators.extract import _nominals_from_text

    # determiner + up to 5 word tokens, longer runs truncated
    assert _nominals_from_text("the company said hello there now") == [
        (0, 0, 6, "the company said hello there now")
    ]
    assert _nominals_from_text(
        "the big formal company reported hello there"
    ) == [(0, 0, 4, "the big formal company")]  # '-ed' verb stop
    # a nested determiner ends candidacy for the outer run; determiners
    # followed immediately by another determiner emit nothing
    assert _nominals_from_text("a a the line sort table window more") == [
        (0, 2, 8, "the line sort table window more")
    ]
    # stop word ends the run; determiner with no following word emits nothing
    assert _nominals_from_text("the big and small") == [(0, 0, 2, "the big")]
    assert _nominals_from_text("table the") == []


def test_nominal_mentions_distributed(spark):
    from berkeley_entity_spark.operators.extract import nominal_mentions

    df = spark.createDataFrame(
        [("u1", "the quick brown fox jumps"), ("u2", "no determiners here")],
        "url string, text string",
    )
    rows = {(r["url"], r["start"], r["end"]): r for r in nominal_mentions(df).collect()}
    assert set(rows) == {("u1", 0, 5)}
    r = rows[("u1", 0, 5)]
    assert r["span"] == "the quick brown fox jumps" and r["head"] == "jumps"
    assert r["norm_name"] == "the quick brown fox jumps" and r["mtype"] == "nominal"


def test_er_pipeline_fixture_matches_generator(spark):
    """The committed q_er_pipeline oracle fixture IS the generator output:
    fixtures/synth_pages_300_40_en.parquet must byte-match the en-filtered
    synthetic corpus the Spark query builds (tools/freeze_er_pipeline_oracle
    wrote it).  If this fails after a DELIBERATE synth/extract change,
    re-run the freeze tool (it re-audits the knife-edge margin and gold F1
    before rewriting the fixture)."""
    import os

    import pandas as pd

    from berkeley_entity_spark.config import SynthConfig
    from berkeley_entity_spark.synth import generate_webpages

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "synth_pages_300_40_en.parquet",
    )
    pages, _ = generate_webpages(spark, SynthConfig(n_pages=300, n_entities=40))
    gen = (
        pages.where("lang = 'en'")
        .select("url", "text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    fix = pd.read_parquet(fixture).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(gen, fix)
