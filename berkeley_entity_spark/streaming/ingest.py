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


def mention_rate_stream(
    pages_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed mention counts — late pages beyond the watermark
    delay are dropped from the aggregation state.

    warc_ts rides through the extraction kernel as a passthrough column (a
    stream-stream join back to the source would need watermarks + time-range
    bounds on both sides and a second shuffle; the passthrough costs one
    column in the Arrow batch)."""
    m = extract_mentions(pages_stream, passthrough=("warc_ts",))
    return (
        m.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("window", "n_mentions")
    )
