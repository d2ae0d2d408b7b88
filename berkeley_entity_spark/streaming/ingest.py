"""Streaming extract: incremental mention extraction over arriving pages.

readStream(parquet dir) -> extract_mentions (stateless mapInPandas works
under Structured Streaming) -> writeStream to the mentions stage table.
Downstream blocking/scoring/clustering stay batch jobs over the growing
mentions table (the reference semantics are corpus-level; incremental
clustering would change results, so the honest incremental unit is extract).

Also provides a watermarked per-window mention-rate aggregation — the
standard late-data-tolerant monitoring stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from berkeley_entity_spark.operators.extract import extract_mentions
from berkeley_entity_spark.synth import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of webpages parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_mentions(pages_stream: DataFrame, lang: str = "en") -> DataFrame:
    """Stateless extract over the stream (same kernel as batch)."""
    return extract_mentions(pages_stream.where(F.col("lang") == lang))


def start_extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the extract stage incrementally; availableNow drains the backlog
    and stops (the batch-equivalent trigger used in tests)."""
    mentions = streaming_mentions(read_page_stream(spark, input_dir))
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mention_rate_stream(pages_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked windowed mention counts per language — late pages beyond
    2 minutes are dropped from the aggregation state."""
    m = extract_mentions(pages_stream)
    with_ts = m.join(
        pages_stream.select("url", "warc_ts"), "url"
    )
    return (
        with_ts.withWatermark("warc_ts", "2 minutes")
        .groupBy(F.window("warc_ts", window), F.col("url").isNotNull().alias("_all"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("window", "n_mentions")
    )
