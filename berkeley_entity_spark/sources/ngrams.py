"""Google Web-ngrams raw count loader + copula pair counting (SURVEY §2
gap closed in round 4; reference: sem/GoogleNgramUtils.scala — whitespace
field access with the COUNT as the last whitespace-separated field — and
sem/QueryCountCollector.scala:44-131 — scan 1gms/3gms/4gms directories,
keep n-grams whose first/last words are mention heads, apply the copula
patterns "X is|are|was|were Y" (3-grams) and "X is|are|was|were a|an|the Y"
(4-grams), and accumulate SYMMETRIC pair counts).

Spark-first shape: `spark.read.text` over the count shards (splittable,
no driver-side line loop), one `split` per line, a BROADCAST semijoin
against the head set (heads are a small dimension — the reference holds
them in a HashSet on one machine for the same reason), and a hash
aggregation for the counts.  At 100 TB of ngram shards the scan is the
only heavy stage and it carries the head filter, so almost nothing
reaches the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COPULAS = ("is", "are", "was", "were")
ARTICLES = ("a", "an", "the")


def parse_ngram_lines(lines: DataFrame, gram_size: int) -> DataFrame:
    """(value string) -> (tokens array<string>, count double).

    Line format (GoogleNgramUtils.fastAccess* semantics): gram_size
    whitespace-separated words, then the count as the LAST whitespace-
    separated field; any run of whitespace separates fields (the reference
    uses Character.isWhitespace, not a fixed tab).  Lines with a different
    field count are dropped (malformed shards exist in the wild)."""
    fields = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.select(fields.alias("f"))
        .where(F.size("f") == gram_size + 1)
        .select(
            F.slice("f", 1, gram_size).alias("tokens"),
            F.element_at("f", -1).cast("double").alias("count"),
        )
        .where(F.col("count").isNotNull())
    )


def read_google_ngrams(
    spark: SparkSession, path: str, gram_size: int
) -> DataFrame:
    """Raw count shard(s) -> (tokens, count); see parse_ngram_lines."""
    return parse_ngram_lines(spark.read.text(path), gram_size)


def head_unigram_counts(ngrams1: DataFrame, heads: DataFrame) -> DataFrame:
    """(head, count) for heads present in the unigram shards
    (QueryCountCollector.countUnigram)."""
    u = ngrams1.select(
        F.element_at("tokens", 1).alias("head"), "count"
    )
    return (
        u.join(F.broadcast(heads.select("head").distinct()), "head")
        .groupBy("head")
        .agg(F.sum("count").alias("count"))
    )


def copula_pair_counts(
    ngrams3: DataFrame, ngrams4: DataFrame, heads: DataFrame
) -> DataFrame:
    """(head_a, head_b, count) — SYMMETRIC copula-pattern counts
    (QueryCountCollector.count): a 3-gram 'X cop Y' or 4-gram
    'X cop art Y' whose X and Y are both heads contributes its count to
    BOTH (X, Y) and (Y, X), exactly like the reference's two
    incrementCount calls.  (The reference additionally pre-restricts to
    head PAIRS seen in its corpus — a driver-memory optimization; counting
    all head x head pairs here yields identical counts for every pair the
    downstream Hearst join consumes, without shipping a quadratic pair set
    to every executor.)"""
    hd = F.broadcast(heads.select("head").distinct())

    def ends(df: DataFrame, gram: int) -> DataFrame:
        e = df.select(
            F.element_at("tokens", 1).alias("w1"),
            F.element_at("tokens", gram).alias("wn"),
            *[
                F.lower(F.element_at("tokens", i)).alias(f"m{i}")
                for i in range(2, gram)
            ],
            "count",
        )
        if gram == 3:
            e = e.where(F.col("m2").isin(*COPULAS))
        else:
            e = e.where(
                F.col("m2").isin(*COPULAS) & F.col("m3").isin(*ARTICLES)
            )
        return (
            e.join(hd.toDF("w1"), "w1")
            .join(hd.toDF("wn"), "wn")
            .where(F.col("w1") != F.col("wn"))
            .select("w1", "wn", "count")
        )

    matched = ends(ngrams3, 3).unionByName(ends(ngrams4, 4))
    sym = matched.unionByName(
        matched.select(
            F.col("wn").alias("w1"), F.col("w1").alias("wn"), "count"
        )
    )
    return (
        sym.groupBy(F.col("w1").alias("head_a"), F.col("wn").alias("head_b"))
        .agg(F.sum("count").alias("count"))
    )


def collect_query_counts(
    spark: SparkSession, counts_root: str, heads: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The QueryCountCollector.collectCounts pipeline over a Google-ngrams
    directory layout (counts_root/{1gms,3gms,4gms}/*): returns
    (head_counts, symmetric copula pair_counts)."""
    n1 = read_google_ngrams(spark, f"{counts_root}/1gms", 1)
    n3 = read_google_ngrams(spark, f"{counts_root}/3gms", 3)
    n4 = read_google_ngrams(spark, f"{counts_root}/4gms", 4)
    return head_unigram_counts(n1, heads), copula_pair_counts(n3, n4, heads)
