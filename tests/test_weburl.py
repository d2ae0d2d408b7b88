"""URL canonicalization rules against hand-written cases."""

from berkeley_entity_spark.operators.weburl import domain_stats, normalize_urls


def test_normalize_urls_hand_cases(spark):
    d = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.News.Example.COM:443/World/story//?utm_source=x&b=2&a=1"),
            (2, "http://news.example.com/World/story"),
            (3, "https://m.example.com:8080/a?fbclid=z&z=9&gclid=q&ref=hp"),
            (4, "https://example.com/"),
            (5, "https://sub.deep.example.co/x#frag"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r.asDict() for r in normalize_urls(d).collect()}
    r1 = rows[1]
    assert r1["scheme"] == "https"
    assert r1["host"] == "news.example.com"
    assert r1["registered_domain"] == "example.com"
    assert r1["path"] == "/World/story"  # trailing slashes stripped, case kept
    assert r1["query_canon"] == "a=1&b=2"  # tracking dropped, sorted
    assert r1["canon_url"] == "https://news.example.com/World/story?a=1&b=2"
    # variant 2 differs only by scheme from variant 1's canonical form
    assert rows[2]["canon_url"] == "http://news.example.com/World/story"
    r3 = rows[3]
    assert r3["host"] == "example.com"  # m. prefix + port stripped
    assert r3["query_canon"] == "z=9"  # every tracking param dropped
    assert rows[4]["path"] == "/"
    r5 = rows[5]
    assert r5["registered_domain"] == "example.co"
    assert r5["path"] == "/x"  # fragment never enters path or query
    assert r5["query_canon"] == ""


def test_domain_stats_collapses_variants(spark):
    d = spark.createDataFrame(
        [
            (1, "https://www.example.com/a"),
            (2, "https://example.com:443/a/"),
            (3, "http://EXAMPLE.com/a?utm_source=x"),
            (4, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    out = {r["host"]: r.asDict() for r in domain_stats(normalize_urls(d)).collect()}
    assert out["example.com"]["n_docs"] == 4
    # 1 and 2 collapse to the same canonical url; 3 keeps its http scheme
    assert out["example.com"]["n_canon_urls"] == 3
