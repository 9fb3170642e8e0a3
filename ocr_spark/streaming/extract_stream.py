"""Structured Streaming rendition of the extraction pipeline.

The reference is purely request-at-a-time (SURVEY.md §2.6: no streaming
features); its incremental aspects map to batch-epoch jobs. This module
provides the *streaming deployment shape* anyway, because a transcript lake
ingests continuously: the same fused extraction UDF runs unchanged over a
file-source stream with exactly-once sink semantics via checkpointing —
Structured Streaming's incremental execution IS the scaling story (each
micro-batch is the batch plan over new files only).

Also included: a watermarked sliding-window per-language throughput metric
stream (the streaming analog of A2's per-day counts) demonstrating late-data
handling, and a ``foreachBatch`` learning accrual hook that reuses the batch
epoch merge (ocr_spark.operators.learning) so stream and batch share one
code path for A7.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ocr_spark.operators.extraction import extract_turns
from ocr_spark.plans.job import INPUT_COLUMNS

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream over a transcript directory: new parquet files are
    the micro-batch unit (the streaming analog of the batch job's file-group
    checkpoint; both resume from durable progress — WAL offsets here,
    manifests there). ``maxFilesPerTrigger`` bounds batch size so executor
    memory is stable regardless of backlog depth."""
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(*INPUT_COLUMNS)
    )


def extract_stream(
    stream: DataFrame,
    use_dictionary: bool = True,
    use_spelling: bool = True,
) -> DataFrame:
    """The SAME fused Arrow UDF as the batch path — per-turn transforms are
    stateless, so batch/streaming parity is automatic (one code path, the
    north rule's per-turn equality holds for both)."""
    return extract_turns(
        stream, use_dictionary=use_dictionary, use_spelling=use_spelling
    )


def write_extracted_stream(
    extracted: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Append sink with checkpointed exactly-once file output. With
    ``availableNow`` the query drains the current backlog and stops —
    kill-and-restart resumes from the checkpoint without reprocessing
    (tested in tests/test_streaming.py)."""
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_metrics(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked sliding-window turn counts per role — the streaming
    analog of A2 (per-day request counts, db_service.py:265-278). The
    watermark bounds state: late turns beyond it are dropped, so state size
    is O(windows in flight), not O(stream length)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.octet_length("text")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "bytes_in",
        )
    )


def dedup_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    key: str = "content",
) -> DataFrame:
    """Streaming exact dedup with bounded state: drop rows whose key was
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state evicts past the watermark,
    so memory is O(keys per horizon), not O(stream length)).

    ``key='content'`` dedups on the md5 of the text (the streaming analog
    of the batch exact_dedup operator); ``key='turn'`` on (conv_id,
    turn_idx) — idempotent re-ingestion of replayed source files."""
    s = stream.withWatermark("ts", watermark)
    if key == "content":
        return (
            s.withColumn(
                "text_hash", F.md5(F.coalesce(F.col("text"), F.lit("")))
            ).dropDuplicatesWithinWatermark(["text_hash"])
        )
    return s.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])


def learning_foreach_batch(learned_table_path: str):
    """``foreachBatch`` hook: accrue unknown-word frequencies per
    micro-batch by reusing the batch epoch merge — A7 semantics identical
    in stream and batch (epoch == micro-batch)."""
    from ocr_spark.operators.learning import accrue_learned, epoch_word_counts

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = epoch_word_counts(batch_df)
        from pyspark.errors import AnalysisException

        try:
            existing = spark.read.parquet(learned_table_path)
        except AnalysisException:
            existing = None  # first micro-batch: table not created yet
        # other read failures raise — overwriting the table after a
        # transient error would destroy accumulated learning state
        merged = accrue_learned(existing, counts)
        # local-collect rewrite: the learned table is small (vocab-sized);
        # an Iceberg deployment swaps this for MERGE INTO
        rows = merged.collect()
        if rows:
            spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(learned_table_path)

    return hook
