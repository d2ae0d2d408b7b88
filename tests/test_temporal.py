from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.temporal import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    probes = spark.createDataFrame(
        [
            (1, 100, _ts(5), 1.0),   # matches quote at :05 (inclusive)
            (1, 101, _ts(9), 2.0),   # matches quote at :05
            (1, 102, _ts(2), 3.0),   # before any quote -> NULL
            (2, 103, _ts(30), 4.0),  # matches the LATEST of user 2's quotes
            (3, 104, _ts(7), 5.0),   # user with no quotes at all -> NULL
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    quotes = spark.createDataFrame(
        [
            (1, 900, _ts(5), 50.0),
            (1, 901, _ts(10), 51.0),  # after probe 101 -> never matched
            (2, 902, _ts(1), 52.0),
            (2, 903, _ts(20), 53.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    return probes, quotes


def _rows(df):
    return sorted(
        df.select(
            "event_id", "user_id", "ts", "q_ts", "q_event_id", "q_value"
        ).collect()
    )


def test_asof_backward_inclusive_left(spark):
    probes, quotes = _frames(spark)
    got = {
        r.event_id: (r.q_event_id, r.q_value)
        for r in asof_join(probes, quotes).collect()
    }
    assert got == {
        100: (900, 50.0),  # equal ts matches (inclusive)
        101: (900, 50.0),
        102: (None, None),
        103: (903, 53.0),
        104: (None, None),
    }


def test_asof_quote_tie_collapses_to_greatest_payload(spark):
    probes = spark.createDataFrame(
        [(1, 1, _ts(6), 0.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    quotes = spark.createDataFrame(
        [(1, 7, _ts(5), 9.0), (1, 8, _ts(5), 3.0)],  # same (key, ts)
        "user_id long, event_id long, ts timestamp, value double",
    )
    [r] = asof_join(probes, quotes).collect()
    # greatest payload struct: (event_id=8, value=3.0) > (7, 9.0)
    assert (r.q_event_id, r.q_value) == (8, 3.0)


def test_asof_bucketed_path_identical(spark):
    """The hot-key scale path (per-time-bucket windows + carry-forward)
    must be bit-identical to the single-window path — including carries
    across EMPTY buckets (user 2's probe at :30 is 10 minutes of empty
    1-minute buckets past its quote at :20)."""
    probes, quotes = _frames(spark)
    base = _rows(asof_join(probes, quotes))
    for bucket_ms in (60_000, 240_000, 3_600_000_000):
        assert _rows(asof_join(probes, quotes, bucket_ms=bucket_ms)) == base


def test_asof_partitioning_invariance(spark):
    probes, quotes = _frames(spark)
    base = _rows(asof_join(probes, quotes))
    got = _rows(
        asof_join(probes.repartition(7, "event_id"), quotes.repartition(3))
    )
    assert got == base


def test_asof_events_vs_duckdb_native(spark):
    """Replay the driver gate at sf0.001 against DuckDB's native ASOF
    JOIN (independent implementation, not a plan replay)."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in entry.q_asof_join(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(
        entry.oracle_sql()["q_asof_join"]
    ).fetchall())
    assert got == want
