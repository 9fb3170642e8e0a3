"""Deterministic training-shard assignment and sharded corpus writes.

The last stage of a training-data pipeline: place every document into one of
``n_shards`` stable shards (so reruns, resumes and downstream loaders agree
on placement without coordination) and write the corpus partitioned by
shard, sorted within each shard, with bounded file sizes. Mirrors the
reference's write-back sink role (alfalaq12/OCR persists per-document
results keyed by content hash) at corpus scale.

Shard id = ``conv(substr(md5(id), 1, 8), 16, 10) % n_shards``: md5 is
portable across Spark / DuckDB / Python (the repo-wide oracle-determinism
trick), the first 8 hex chars give an unbiased 32-bit value, and the result
depends only on the id — never on partitioning, row order, or cluster size.

Scale: assignment is a narrow projection (scan speed at 100 TB);
the write repartitions on ``shard`` so each output directory is produced by
one task streaming sorted rows — one shuffle, linear in rows, no driver
involvement. ``maxRecordsPerFile`` bounds file sizes for the loader.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_id(id_col: Column, n_shards: int) -> Column:
    """Stable shard in [0, n_shards) from an id column (any type castable
    to string; same string-ification as the DuckDB oracle's VARCHAR cast)."""
    from ocr_spark.functions.hashing import md5_mod

    return md5_mod(id_col.cast("string"), n_shards).cast("int")


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Adds a ``shard`` column; pure narrow transform."""
    return df.withColumn("shard", shard_id(F.col(id_col), n_shards))


def shard_histogram(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-shard balance stats (docs, bytes, id range) — the observability
    query for shard skew: one hash aggregate with map-side partial combine.
    Range column names follow ``id_col`` (``min_doc_id``/``max_doc_id``
    for the default)."""
    return (
        assign_shards(df, n_shards, id_col)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).cast("long").alias("total_chars"),
            F.min(id_col).alias(f"min_{id_col}"),
            F.max(id_col).alias(f"max_{id_col}"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` parquet-partitioned by shard, each shard's rows sorted
    by id. ``repartition(n_shards, shard)`` co-locates every shard into one
    task (hash collisions may pair shards in a task; ``partitionBy`` still
    splits them into their own directories), so each directory is written
    as one sorted stream — the shape that holds when n_shards is thousands
    and the input is 100 TB."""
    sharded = assign_shards(df, n_shards, id_col)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(path)
