"""S7 word2vec binary reader: roundtrip + variants + ANN integration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.sources.word2vec import (
    read_word2vec_bin,
    write_word2vec_bin,
)

WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(0)
    return rng.standard_normal((4, 8)).astype(np.float32)


def test_roundtrip(spark, tmp_path, vecs):
    p = str(tmp_path / "v.bin")
    write_word2vec_bin(p, WORDS, vecs)
    got = {r["word"]: r["vector"] for r in read_word2vec_bin(spark, p).collect()}
    assert set(got) == set(WORDS)
    for i, w in enumerate(WORDS):
        assert np.allclose(got[w], vecs[i], atol=0)


def test_negvectors_variant(spark, tmp_path, vecs):
    """The reference's dual-vector layout (w2vReader.scala:51-62)."""
    p = str(tmp_path / "vneg.bin")
    neg = -2.0 * vecs
    write_word2vec_bin(p, WORDS, vecs, neg_vectors=neg)
    rows = {r["word"]: r for r in read_word2vec_bin(spark, p, negvectors=True).collect()}
    for i, w in enumerate(WORDS):
        assert np.allclose(rows[w]["vector"], vecs[i])
        assert np.allclose(rows[w]["neg_vector"], neg[i])


def test_no_terminator_variant(spark, tmp_path, vecs):
    """Standard word2vec.c files have no trailing newline per entry."""
    p = str(tmp_path / "vnt.bin")
    write_word2vec_bin(p, WORDS, vecs, terminator=False)
    got = {r["word"]: r["vector"] for r in read_word2vec_bin(spark, p).collect()}
    assert set(got) == set(WORDS)
    assert np.allclose(got["delta"], vecs[3])


def test_sharded_directory(spark, tmp_path, vecs):
    d = tmp_path / "shards"
    d.mkdir()
    write_word2vec_bin(str(d / "part0.bin"), WORDS[:2], vecs[:2])
    write_word2vec_bin(str(d / "part1.bin"), WORDS[2:], vecs[2:])
    df = read_word2vec_bin(spark, str(d))
    assert df.count() == 4
    assert set(r["word"] for r in df.collect()) == set(WORDS)


def test_feeds_ann(spark, tmp_path, vecs):
    """S7 -> similarity: the read vectors flow straight into cosine_topk."""
    from berkeley_entity_spark.operators.similarity import cosine_topk

    p = str(tmp_path / "v2.bin")
    write_word2vec_bin(p, WORDS, vecs)
    emb = read_word2vec_bin(spark, p).select(
        F.xxhash64("word").alias("vec_id"), F.col("vector").alias("embedding")
    )
    top = cosine_topk(emb, k=1)
    assert top.count() == 4


def test_truncated_and_empty_files(spark, tmp_path, vecs):
    """Truncation keeps fully-parsed entries (the reference's EOFException
    swallow, w2vReader.scala:70); header-only shards yield zero rows."""
    p = str(tmp_path / "t.bin")
    write_word2vec_bin(p, WORDS, vecs)
    blob = open(p, "rb").read()
    pt = str(tmp_path / "trunc.bin")
    open(pt, "wb").write(blob[:-10])
    got = read_word2vec_bin(spark, pt).collect()
    assert len(got) == len(WORDS) - 1
    pe = str(tmp_path / "empty.bin")
    open(pe, "wb").write(b"0 8\n")
    assert read_word2vec_bin(spark, pe).count() == 0


def test_headerless_and_zero_byte_shards(spark, tmp_path, vecs):
    """Code-review regression: header-level truncation must not fail the job."""
    d = tmp_path / "mix"
    d.mkdir()
    write_word2vec_bin(str(d / "good.bin"), WORDS[:2], vecs[:2])
    (d / "zero.bin").write_bytes(b"")
    (d / "nonewline.bin").write_bytes(b"4 8")
    (d / "garbage.bin").write_bytes(b"not a header\n\x00\x01")
    got = read_word2vec_bin(spark, str(d)).collect()
    assert sorted(r["word"] for r in got) == sorted(WORDS[:2])
