"""Wiki-DB-shaped operators: counts, redirect chains, argmax ties."""

from berkeley_entity_spark.operators.wiki import (
    best_title_per_surface,
    resolve_redirects,
    title_given_surface,
)


def test_redirect_chain_bounded_hops(spark):
    links = spark.createDataFrame(
        [("jobs", "steve_jobs_(apple)"), ("jobs", "employment")],
        "surface string, title string",
    )
    redirects = spark.createDataFrame(
        [
            ("steve_jobs_(apple)", "steve_jobs_redirect"),
            ("steve_jobs_redirect", "steve_jobs"),
            ("steve_jobs", "LOOP"),  # third hop must NOT be taken at hops=2
        ],
        "src string, dst string",
    )
    got = {
        (r["surface"], r["title"])
        for r in resolve_redirects(links, redirects, hops=2).collect()
    }
    assert ("jobs", "steve_jobs") in got  # two hops followed
    assert ("jobs", "employment") in got  # non-redirected untouched
    assert all(t != "LOOP" for _, t in got)


def test_vote_argmax_deterministic_ties(spark):
    links = spark.createDataFrame(
        [("x", "b"), ("x", "b"), ("x", "a"), ("x", "a"), ("x", "c")],
        "surface string, title string",
    )
    counts = title_given_surface(links)
    best = best_title_per_surface(counts).collect()
    assert len(best) == 1
    # tie between a(2) and b(2): lexicographically smallest wins
    assert best[0]["best_title"] == "a" and best[0]["votes"] == 2


def test_counts_shape(spark):
    links = spark.createDataFrame(
        [("s1", "t1"), ("s1", "t1"), ("s1", "t2"), ("s2", "t3")],
        "surface string, title string",
    )
    got = {
        (r["surface"], r["title"]): r["votes"]
        for r in title_given_surface(links).collect()
    }
    assert got == {("s1", "t1"): 2, ("s1", "t2"): 1, ("s2", "t3"): 1}
