from __future__ import annotations

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.drift import drift_psi, snapshot_histograms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")


def test_identical_snapshots_psi_near_zero(spark):
    # two snapshots with the SAME composition: smoothing keeps psi finite
    # and it must sit at ~0 (exactly 0 here: identical counts -> p == q)
    rows = []
    for snap in ("s0", "s1"):
        for i in range(50):
            rows.append((i, snap, "en" if i % 2 else "de", 100 + (i % 4) * 300))
    out = drift_psi(_docs(spark, rows)).collect()
    assert len(out) == 2  # one non-first snapshot x two features
    for r in out:
        assert r["psi"] == 0.0
        assert not r["drifted"]
        assert r["n_docs"] == 50


def test_shifted_snapshot_flags_drift(spark):
    # s1 swaps the language mix entirely and doubles every doc's length:
    # both features must alarm
    rows = [(i, "s0", "en", 100) for i in range(60)]
    rows += [(1000 + i, "s1", "zh", 1500) for i in range(60)]
    out = {(r["snapshot"], r["feature"]): r for r in drift_psi(_docs(spark, rows)).collect()}
    assert out[("s1", "len")]["drifted"]
    assert out[("s1", "lang")]["drifted"]
    assert out[("s1", "len")]["psi"] > 1.0
    assert out[("s1", "lang")]["psi"] > 1.0


def test_consecutive_chain_and_empty_bin_asymmetry(spark):
    # three snapshots: s0 ~ s1 (stable), s2 introduces a lang absent
    # before — the dense grid must let the empty bin contribute, and
    # each snapshot is compared to its immediate predecessor only
    rows = [(i, "s0", "en", 200) for i in range(40)]
    rows += [(100 + i, "s1", "en", 200) for i in range(40)]
    rows += [(200 + i, "s2", "fr" if i < 20 else "en", 200) for i in range(40)]
    out = {(r["snapshot"], r["feature"]): r["psi"] for r in drift_psi(_docs(spark, rows)).collect()}
    assert set(k[0] for k in out) == {"s1", "s2"}  # first snapshot omitted
    assert out[("s1", "lang")] == 0.0
    assert out[("s2", "lang")] > 0.1
    assert out[("s2", "len")] == 0.0  # length untouched


def test_histogram_counts_partition_invariant(spark):
    rows = [(i, f"s{i % 3}", "en" if i % 2 else "es", (i % 10) * 250) for i in range(90)]
    d = _docs(spark, rows)
    a = sorted(map(tuple, snapshot_histograms(d).collect()))
    b = sorted(map(tuple, snapshot_histograms(d.repartition(7, "doc_id")).collect()))
    assert a == b
    # per-feature totals both equal the corpus size
    tot = (
        snapshot_histograms(d)
        .groupBy("feature")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    assert {r["feature"]: r["n"] for r in tot} == {"len": 90, "lang": 90}
