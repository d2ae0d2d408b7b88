from __future__ import annotations

import pytest

from berkeley_entity_spark.sources.warc import (
    parse_records,
    parse_warc,
    record_id_for_url,
    render_record,
    render_warc,
)


def _roundtrip(spark, rows, n_files=2):
    pages = spark.createDataFrame(rows, "url string, text string")
    parsed = parse_warc(render_warc(pages, n_files=n_files))
    return {r["url"]: r.asDict() for r in parsed.collect()}


def test_roundtrip_identity(spark):
    rows = [
        ("http://a.example/x", "plain ascii payload"),
        ("http://b.example/y", "unicode é中文 payload"),
        # payload containing CRLFs and a fake version line: Content-Length
        # framing must NOT be fooled by delimiter-looking payload bytes
        ("http://c.example/z", "line1\r\n\r\nWARC/1.0\r\nline2"),
        ("http://d.example/empty", ""),
    ]
    got = _roundtrip(spark, rows)
    assert set(got) == {u for u, _ in rows}
    for url, text in rows:
        r = got[url]
        assert r["text"] == text
        assert r["payload_len"] == len(text.encode("utf-8"))
        assert r["record_id"] == record_id_for_url(url)
        assert r["warc_date"] == "2026-01-01T00:00:00Z"


def test_render_deterministic_and_partition_invariant(spark):
    rows = [(f"http://site{i}.example/p", f"text {i} " * 5) for i in range(50)]
    pages = spark.createDataFrame(rows, "url string, text string")
    a = {
        r["file_id"]: bytes(r["warc"])
        for r in render_warc(pages, n_files=4).collect()
    }
    b = {
        r["file_id"]: bytes(r["warc"])
        for r in render_warc(pages.repartition(7), n_files=4).collect()
    }
    assert a == b
    assert sum(len(v) for v in a.values()) > 0


def test_parse_tolerates_header_case_and_order():
    payload = b"hello world"
    blob = (
        b"WARC/1.0\r\n"
        b"content-length: 11\r\n"
        b"warc-target-uri: http://x.example/\r\n"
        b"WARC-TYPE: response\r\n"
        b"WaRc-DaTe: 2020-05-05T00:00:00Z\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    (rec,) = list(parse_records(blob))
    assert rec["url"] == "http://x.example/"
    assert rec["text"] == "hello world"
    assert rec["warc_date"] == "2020-05-05T00:00:00Z"


def test_parse_rejects_malformed():
    good = render_record("http://a/", "abc")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_records(good[:-6]))  # chop payload tail + separator
    no_len = (
        b"WARC/1.0\r\nWARC-Target-URI: http://a/\r\n\r\nabc\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_records(no_len))
    with pytest.raises(ValueError, match="version"):
        list(parse_records(b"HTTP/1.1 200\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    # a correct record followed by garbage separator
    bad_sep = good[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="separator"):
        list(parse_records(bad_sep))


def test_multi_record_file_walk():
    blob = b"".join(
        render_record(f"http://h/{i}", f"payload {i}") for i in range(10)
    )
    recs = list(parse_records(blob))
    assert [r["url"] for r in recs] == [f"http://h/{i}" for i in range(10)]
    assert all(r["text"] == f"payload {i}" for i, r in enumerate(recs))
