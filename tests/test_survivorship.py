"""Golden-record survivorship: every field rule and tie-break pinned on a
constructed cluster table (operators/survivorship.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.survivorship import golden_records

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731


def _frames(spark, rows, assign):
    recs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    a = spark.createDataFrame(assign, "url string, cluster_id long")
    return recs, a


def test_field_rules_and_tie_breaks(spark):
    rows = [
        # cluster 1: distinct ts / text lengths / langs with a 2-2 lang tie
        ("u:b", TS("2024-01-02"), "short", "en"),
        ("u:a", TS("2024-01-03"), "the longest text here", "de"),
        ("u:c", TS("2024-01-01"), "mid text", "de"),
        ("u:d", TS("2024-01-03"), "the longest TEXT 21ch", "en"),
    ]
    assign = [("u:a", 1), ("u:b", 1), ("u:c", 1), ("u:d", 1)]
    recs, a = _frames(spark, rows, assign)
    g = golden_records(recs, a).collect()[0]
    assert g["cluster_id"] == 1 and g["n_members"] == 4
    assert g["canonical_url"] == "u:a"  # min url
    # latest ts ties between u:a and u:d -> greatest url wins
    assert g["latest_url"] == "u:d"
    assert g["latest_ts"] == TS("2024-01-03")
    # both 21-char texts tie on length -> smallest url (u:a) wins
    assert g["best_text"] == "the longest text here"
    # lang votes en=2 de=2 -> lexicographically smallest ("de")
    assert g["lang_majority"] == "de" and g["n_langs"] == 2


def test_null_lang_handling(spark):
    rows = [
        ("u:a", TS("2024-01-01"), "x", None),
        ("u:b", TS("2024-01-02"), "y", None),
        ("u:c", TS("2024-01-01"), "z", None),
        ("u:d", TS("2024-01-02"), "w", "fr"),
    ]
    assign = [("u:a", 1), ("u:b", 1), ("u:c", 2), ("u:d", 2)]
    recs, a = _frames(spark, rows, assign)
    got = {r["cluster_id"]: r for r in golden_records(recs, a).collect()}
    # all-null cluster: majority NULL, n_langs 0
    assert got[1]["lang_majority"] is None and got[1]["n_langs"] == 0
    # single non-null vote wins over nulls
    assert got[2]["lang_majority"] == "fr" and got[2]["n_langs"] == 1


def test_partitioning_invariance(spark):
    import random

    rnd = random.Random(7)
    rows = []
    assign = []
    for i in range(200):
        rows.append(
            (
                f"u:{i:04d}",
                TS("2024-01-01"),
                "t" * (1 + i % 17),
                ["en", "de", "fr", None][i % 4],
            )
        )
        assign.append((f"u:{i:04d}", i % 13))
    rnd.shuffle(rows)
    recs, a = _frames(spark, rows, assign)
    one = {
        r["cluster_id"]: r
        for r in golden_records(recs.coalesce(1), a).collect()
    }
    many = {
        r["cluster_id"]: r
        for r in golden_records(recs.repartition(16), a.repartition(7)).collect()
    }
    assert one == many and len(one) == 13


def test_singleton_cluster_passthrough(spark):
    rows = [("u:a", TS("2024-01-05"), "only", "es")]
    recs, a = _frames(spark, rows, [("u:a", 9)])
    g = golden_records(recs, a).collect()[0]
    assert (
        g["n_members"] == 1
        and g["canonical_url"] == g["latest_url"] == "u:a"
        and g["best_text"] == "only"
        and g["lang_majority"] == "es"
    )
