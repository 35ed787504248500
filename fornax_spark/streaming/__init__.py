"""Structured Streaming surfaces.

The reference is batch-only (SURVEY.md §2.5); these are the streaming
capabilities a production corpus engine adds on top:

  * incremental_index_stream: readStream over a pages directory ->
    foreachBatch appending per-batch postings deltas (the streaming
    front of the LSM lifecycle in fulltext.merge — micro-batches land
    small stores; merge_stores compacts them).
  * windowed_event_counts: watermark + tumbling-window aggregation over
    the events table shape (late-data-safe counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding window counts per event_type with a watermark
    (late rows beyond the watermark are dropped, state is bounded)."""
    ts = F.col("ts").cast("timestamp")
    win = F.window(ts, window, slide) if slide else F.window(ts, window)
    return (
        events_stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select("win.start", "win.end", "event_type", "n", "total_value")
    )


def incremental_index_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pages_schema,
):
    """Micro-batch index ingestion: each batch becomes a postings delta
    parquet (a small LSM generation). Returns the StreamingQuery.

    Exactly-once: foreachBatch writes are keyed by batch id (idempotent
    overwrite per batch directory) and the stream checkpoint tracks the
    source offsets — re-running a failed batch rewrites the same dir.
    """
    from ..fulltext.build import build_postings, docs_with_tokens

    stream = (
        spark.readStream.schema(pages_schema).parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = docs_with_tokens(batch_df, from_html=True)
        postings = build_postings(docs)
        (
            postings.write.mode("overwrite")
            .parquet(f"{out_dir}/batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
