"""Streaming incremental MinHash-LSH near-dup against the accumulated corpus.

The batch near-dup operators (ocr_spark.operators.dedup) answer "which
pairs in THIS corpus are near-duplicates"; a real ingest pipeline asks a
different question per micro-batch: "which of these NEW documents
near-duplicate anything seen so far". ``dropDuplicatesWithinWatermark``
covers exact dedup with bounded state, but MinHash-LSH state (band
postings) must outlive any watermark — so it lives in a versioned snapshot
store committed through the SAME protocol as the learned-words table
(extract_stream._commit_snapshot: staged write → rename arbiter → pointer
swap → deferred GC; batch_id replay guard for foreachBatch's at-least-once
semantics).

Per micro-batch (``foreachBatch`` hook):

1. signatures + banded (band, bucket) rows for the new documents — the
   same single-pass arithmetic as the batch operator
   (dedup.minhash_signatures / dedup.band_buckets), so stream and batch
   share one hash family definition;
2. documents whose id is already in the store are dropped (idempotent
   re-ingestion — a replayed source file cannot double-register a doc);
3. candidate pairs = genuinely-new banded rows joined against the
   ACCUMULATED ∪ new banded rows on (band, bucket) — the new side is the
   micro-batch (small by construction) and broadcasts, so the
   accumulated-side scan is shuffle-free; signature-similarity
   verification happens inline in the join projection;
4. snapshot N+1 = {bands: accumulated ∪ new, pairs: old ∪ new pairs},
   committed atomically.

Incremental-vs-batch equality: a pair (a, b) with b ingested at or after
a collides in some (band, bucket) — exactly the batch candidate
condition — and is found by the join in b's micro-batch (both sides of
the bucket are present: a from the store, b from the batch). The final
pair set therefore equals ``minhash_near_duplicates`` over the full
corpus with the same (n_hashes, n_bands, k, threshold)
(tests/test_streaming.py pins this over a multi-batch replay).

At 100 TB: the store's bands table is O(docs × n_bands) fixed-width rows
— the same asymptotics as the batch shuffle, amortized over ingestion.
The bands table is PARTITIONED AT REST on ``_pb = pmod(hash(bucket),
BANDS_PARTITIONS)`` and each micro-batch probes it through a
``_pb IN (batch's buckets)`` filter, so the per-batch join reads only
the store partitions the new documents can possibly collide with
(PartitionFilters pruning, pinned by tests/test_streaming.py) instead of
scanning the whole accumulated table. The hot-bucket cap is a BATCH-side
concept (global posting sizes aren't known incrementally); cap-sensitive
deployments should periodically re-run the batch operator to rebuild the
store (documented trade-off).
"""
from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import band_buckets, minhash_signatures
from ocr_spark.streaming.extract_stream import (
    _commit_snapshot,
    _learned_state,
    _require_local_path,
    next_commit_version,
)

BANDS_SUBDIR = "bands"
PAIRS_SUBDIR = "pairs"

#: at-rest partition count for the bands table: pmod(hash(bucket), N).
#: Spark's hash() is murmur3 and deterministic across sessions, so the
#: same bucket digest always lands in the same partition on every commit.
BANDS_PARTITIONS = 16


def _with_pb(bands: DataFrame) -> DataFrame:
    """Attach the at-rest partition key (idempotent)."""
    if "_pb" in bands.columns:
        return bands
    return bands.withColumn(
        "_pb", F.pmod(F.hash("bucket"), F.lit(BANDS_PARTITIONS))
    )


def read_neardup_state(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame, DataFrame] | None:
    """Resolve the store's ``_CURRENT`` pointer and read (bands, pairs)
    from the live snapshot; None before the first commit."""
    root = _require_local_path(store_path, "near-dup store root")
    state = _learned_state(root)
    if state is None:
        return None
    snap = root / state["snapshot"]
    return (
        spark.read.parquet(str(snap / BANDS_SUBDIR)),
        spark.read.parquet(str(snap / PAIRS_SUBDIR)),
    )


def _banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    n_bands: int,
    k: int,
) -> DataFrame:
    """(id, signature, band, bucket) rows — the store's unit of state,
    identical arithmetic to the batch operator's posting source."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, k)
    from ocr_spark.functions.explode import posexplode_nonnull

    return posexplode_nonnull(
        sigs, band_buckets("signature", n_bands), "band", "bucket",
        "id", "signature",
    )


def _sig_sim(a, b):
    return F.round(
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda eq: eq))
        / F.size(a),
        6,
    )


def neardup_foreach_batch(
    store_path: str,
    text_col: str = "text",
    id_col: str = "conv_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    keep_snapshots: int = 2,
):
    """``foreachBatch`` hook: near-dup each micro-batch against the
    accumulated corpus and fold the result into the versioned store.
    Exactly-once across at-least-once replays via the pointer's batch_id
    guard (same contract as the learning hook); a commit lost to a
    concurrent writer is retried from the fresh snapshot.

    The plain-filesystem snapshot rewrites the bands table per commit —
    the same accepted pattern as the learned-words table (the merge stays
    on executors; only pointer bytes touch the driver). The Iceberg
    deployment APPENDS the micro-batch's band rows and pair rows in one
    commit transaction instead, making the per-batch cost O(batch), not
    O(corpus)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = _require_local_path(store_path, "near-dup store root")
        root.mkdir(parents=True, exist_ok=True)
        for attempt in range(3):
            state = _learned_state(root)
            last = state.get("batch_id") if state else None
            if last is not None and batch_id <= last:
                return  # replay of an applied micro-batch
            existing = read_neardup_state(spark, store_path)
            new_bands = _banded(
                batch_df, text_col, id_col, n_hashes, n_bands, k
            )
            new_bands = _with_pb(new_bands)
            if existing is None:
                old_bands, old_pairs = None, None
            else:
                old_bands, old_pairs = existing
                old_bands = _with_pb(old_bands)  # pre-_pb-layout stores
                # idempotent re-ingestion: a doc id already registered
                # (replayed source file) must not re-enter the state
                seen = old_bands.select("id").distinct()
                new_bands = new_bands.join(seen, "id", "left_anti")
            all_bands = (
                new_bands if old_bands is None
                else old_bands.unionByName(new_bands)
            )
            # partition-pruned probe: the accumulated store is laid out by
            # _pb at rest, and only partitions holding the micro-batch's
            # buckets can produce a collision — the IN filter reaches the
            # parquet scan as a PartitionFilter (pinned in
            # tests/test_streaming.py), so the per-batch join reads
            # O(batch's partitions), not the whole store. new_bands'
            # buckets all satisfy the filter by construction.
            batch_pbs = [
                row[0]
                for row in new_bands.select("_pb").distinct().collect()
            ]
            if not batch_pbs and existing is None:
                # an empty FIRST batch must not commit: a 0-row
                # partitionBy write has no schema-bearing files, and the
                # replayed empty batch is idempotent anyway
                return
            probe = all_bands.filter(F.col("_pb").isin(batch_pbs))
            # the new side is the micro-batch — broadcast it so the
            # accumulated-side probe is a shuffle-free scan
            l, r = F.col("l"), F.col("r")
            cand = (
                F.broadcast(
                    new_bands.select(
                        F.struct("id", "signature").alias("l"), "band", "bucket"
                    )
                )
                .join(
                    probe.select(
                        F.struct("id", "signature").alias("r"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .filter(l["id"] != r["id"])
                .select(
                    F.when(l["id"] < r["id"], l["id"]).otherwise(r["id"]).alias("id_a"),
                    F.when(l["id"] < r["id"], r["id"]).otherwise(l["id"]).alias("id_b"),
                    _sig_sim(l["signature"], r["signature"]).alias("sig_sim"),
                )
                .filter(F.col("sig_sim") >= threshold)
                .distinct()
            )
            merged_pairs = (
                cand if old_pairs is None
                else old_pairs.unionByName(cand).distinct()
            )

            def stage(tmp: pathlib.Path) -> None:
                all_bands.write.mode("overwrite").partitionBy("_pb").parquet(
                    str(tmp / BANDS_SUBDIR)
                )
                merged_pairs.write.mode("overwrite").parquet(str(tmp / PAIRS_SUBDIR))

            try:
                _commit_snapshot(
                    stage, root, next_commit_version(root),
                    stream_batch_id=batch_id, keep_snapshots=keep_snapshots,
                )
                return
            except RuntimeError:
                if attempt == 2:
                    raise
            except Exception:
                # lazy read of a snapshot GC'd by a concurrent faster
                # writer — retry only if the pointer actually moved
                if attempt == 2 or _learned_state(root) == state:
                    raise

    return hook
