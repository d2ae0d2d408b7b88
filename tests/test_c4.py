from __future__ import annotations

import duckdb

from berkeley_entity_spark.operators.textstats import c4_clean


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = "this line has five words."


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            GOOD,                                   # kept
            "no terminal punctuation here at all",  # dropped: no terminal
            "too short.",                           # dropped: < 5 words
            "a javascript enabled line right here.",  # dropped: javascript
            "another perfectly fine long line!",    # kept
            "and a third good line stays?",         # kept
        ]
    )
    [r] = c4_clean(_pages(spark, [(1, text)])).collect()
    assert (r.n_lines, r.n_kept_lines, r.page_kept) == (6, 3, True)
    assert r.text_clean.split("\n") == [
        GOOD,
        "another perfectly fine long line!",
        "and a third good line stays?",
    ]


def test_c4_page_rules(spark):
    base = "\n".join([GOOD] * 3)
    rows = [
        (1, base),                                       # kept
        (2, base + "\nsome lorem ipsum filler text."),   # lorem ipsum
        (3, base + "\nvar x = { broken: 1 };"),          # curly brace
        (4, base + "\nthis has badword1 in it today."),  # bad word
        (5, GOOD + "\n" + GOOD),                         # < 3 kept lines
    ]
    out = {r.doc_id: r for r in c4_clean(_pages(spark, rows)).collect()}
    assert {d: out[d].page_kept for d in out} == {
        1: True, 2: False, 3: False, 4: False, 5: False,
    }
    assert out[2].text_clean is None
    # line filtering still reported for dropped pages
    assert out[5].n_kept_lines == 2


def test_c4_gate_vs_duckdb(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in entry.q_c4_clean(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_c4_clean"]).fetchall()
    )
    assert got == want and len(got) > 0
    # the injection must exercise every branch: kept pages, dropped pages,
    # and pages with partially-filtered lines
    keptf = [t[3] for t in got]
    assert any(keptf) and not all(keptf)
    assert any(t[1] > t[2] > 0 for t in got)
