"""Column profiling (operators/profile.py) and SCD2 history maintenance
(operators/scd.py) on constructed tables."""

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.profile import profile_columns
from berkeley_entity_spark.operators.scd import scd2_init, scd2_merge


def test_profile_stats_and_topk_ties(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None), ("b", 2), ("c", 2), (None, None)],
        "s string, v int",
    )
    rows = profile_columns(df, top_k=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["column"], []).append(r)
    s = by["s"][0]
    assert s["n_rows"] == 6 and s["n_null"] == 1 and s["n_distinct"] == 3
    assert s["min_value"] == "a" and s["max_value"] == "c"
    # top-2 of s: a=2, b=2, c=1 -> tie a/b at 2 -> a first
    top_s = sorted(by["s"], key=lambda r: r["rank"])
    assert [(r["value"], r["n_value"]) for r in top_s] == [("a", 2), ("b", 2)]
    v = by["v"][0]
    assert v["n_null"] == 2 and v["n_distinct"] == 2
    top_v = sorted(by["v"], key=lambda r: r["rank"])
    assert [(r["value"], r["n_value"]) for r in top_v] == [("2", 3), ("1", 1)]


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    rows = profile_columns(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_null"] == 2 and r["n_distinct"] == 0
    assert r["rank"] is None and r["value"] is None


def test_profile_approx_mode_bounded_error(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 1000).cast("string").alias("k")
    )
    r = profile_columns(df, cols=["k"], top_k=1, approx=True).collect()[0]
    assert abs(r["n_distinct"] - 1000) / 1000 < 0.05


def test_profile_partitioning_invariance(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 7).cast("string").alias("a"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 11).cast("string"))
        .alias("b"),
    )
    one = sorted(map(tuple, profile_columns(df.coalesce(1), top_k=3).collect()))
    many = sorted(
        map(tuple, profile_columns(df.repartition(16), top_k=3).collect())
    )
    assert one == many


def _hist(rows):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in rows
    )


def test_scd2_change_new_absent_and_null_transitions(spark):
    t1, t2 = F.timestamp_seconds(F.lit(100)), F.timestamp_seconds(F.lit(200))
    d1 = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", None), ("d", "w")], "k string, v string"
    )
    h1 = scd2_init(d1, t1)
    # a unchanged; b changed; c NULL->value (must version); d absent; e new
    d2 = spark.createDataFrame(
        [("a", "x"), ("b", "Y"), ("c", "z"), ("e", "n")], "k string, v string"
    )
    h2 = scd2_merge(h1, d2, "k", ("v",), t2)
    rows = h2.collect()
    open_rows = {r["k"]: r["v"] for r in rows if r["valid_to"] is None}
    closed = {r["k"]: r["v"] for r in rows if r["valid_to"] is not None}
    assert open_rows == {"a": "x", "b": "Y", "c": "z", "d": "w", "e": "n"}
    assert closed == {"b": "y", "c": None}
    assert len(rows) == 7


def test_scd2_three_versions_past_passthrough(spark):
    ts = [F.timestamp_seconds(F.lit(t)) for t in (100, 200, 300)]
    h = scd2_init(
        spark.createDataFrame([("a", "v1")], "k string, v string"), ts[0]
    )
    h = scd2_merge(
        h, spark.createDataFrame([("a", "v2")], "k string, v string"),
        "k", ("v",), ts[1],
    )
    h = scd2_merge(
        h, spark.createDataFrame([("a", "v3")], "k string, v string"),
        "k", ("v",), ts[2],
    )
    rows = sorted(h.collect(), key=lambda r: r["valid_from"])
    assert [r["v"] for r in rows] == ["v1", "v2", "v3"]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None


def test_weighted_sample_matches_local_replay(spark):
    import hashlib
    import math

    from berkeley_entity_spark.operators.selection import weighted_sample

    data = [(i, 10 + (i * 37) % 90) for i in range(300)] + [(999, 0)]
    df = spark.createDataFrame(data, "doc_id long, w long")
    got = [
        r["doc_id"]
        for r in weighted_sample(df, "w", k=20).collect()
    ]
    # independent replay: same md5-derived u, same key, python sort
    def key(i, w):
        h = int(hashlib.md5(f"7|{i}".encode()).hexdigest()[:8], 16) + 1
        return round(math.log(h / 2**32) / w, 12)

    want = sorted(
        ((key(i, w), -i) for i, w in data if w > 0), reverse=True
    )[:20]
    assert got == [-t[1] for t in want]
    assert 999 not in got  # weight 0 excluded
