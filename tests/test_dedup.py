"""Dedup operator tests over the driver-provided documents table."""

import pytest
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dup(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    return d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).cache()


def test_exact_dedup(docs_dup):
    out = exact_dedup(docs_dup)
    assert out.count() == 500  # every text appears exactly twice
    assert out.where("dup_cnt <> 2").count() == 0
    assert out.where("keep_id >= 100000").count() == 0  # survivor = min id


def test_minhash_finds_exact_dups(docs_dup):
    pairs = minhash_lsh_pairs(docs_dup, bands=4, rows=2).cache()
    dup_pairs = pairs.where(F.col("id_b") - F.col("id_a") == 100000).count()
    assert dup_pairs == 500  # identical docs share every band


def test_ngram_jaccard_exact_dups(docs_dup):
    p = ngram_jaccard_pairs(docs_dup, n=3, threshold=0.9).cache()
    exact = p.where(F.col("id_b") - F.col("id_a") == 100000)
    assert exact.count() == 500
    assert exact.where(F.col("jaccard") < 1.0).count() == 0


def test_simhash_identical_docs_hamming_zero(spark, docs_dup):
    sh = simhash64(docs_dup).cache()
    a = sh.where("doc_id < 100000").toDF("id_a", "sh_a")
    b = sh.where("doc_id >= 100000").select(
        (F.col("doc_id") - 100000).alias("id_a"), F.col("simhash").alias("sh_b")
    )
    j = a.join(b, "id_a")
    assert j.count() == 500
    assert (
        j.where(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) != 0).count() == 0
    )


def test_simhash_near_pairs_contains_dups(docs_dup):
    pairs = simhash_near_pairs(docs_dup.limit(2000), max_hamming=0)
    dup = pairs.where(
        (F.col("id_b") - F.col("id_a") == 100000) & (F.col("hamming") == 0)
    )
    assert dup.count() >= 500
