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

APPEND-ONLY LAYOUT (the Iceberg-append analogue, upgraded from the
round-3 full-rewrite): a snapshot is a tiny ``manifest.json`` listing
immutable per-batch DELTA directories —

    root/_CURRENT                      → {"snapshot": "v…", "batch_id": N}
    root/v…/manifest.json              → {"bands": [names], "pairs": [names]}
    root/band_deltas/_delta=<name>/_pb=<k>/*.parquet   (per-batch, immutable)
    root/pair_deltas/_delta=<name>/*.parquet

so a commit writes O(micro-batch) rows + one JSON, never rewriting the
accumulated table (the r3 layout rewrote ALL bands every batch — the
documented O(corpus) seam, now closed). Reading a snapshot = reading the
manifest's delta dirs with ``basePath`` partition discovery; the
``_delta`` partition column is dropped, ``_pb`` stays.

Per micro-batch (``foreachBatch`` hook):

1. signatures + banded (band, bucket) rows for the new documents — the
   same single-pass arithmetic as the batch operator
   (dedup.minhash_signatures / dedup.band_buckets), so stream and batch
   share one hash family definition;
2. documents whose id is already in the store are dropped (idempotent
   re-ingestion — a replayed source file cannot double-register a doc);
3. candidate pairs = genuinely-new banded rows joined against the
   ACCUMULATED ∪ new banded rows on (band, bucket) — the new side is the
   micro-batch (small by construction) and broadcasts, and the
   accumulated side is read through a ``_pb IN (batch's buckets)`` filter
   that prunes at the parquet-partition level;
4. snapshot N+1 = manifest(old deltas + this batch's delta), committed
   atomically. A pair's discovery batch is unique (ids register exactly
   once, and a pair needs at least one newly-registered member), so
   cross-batch pair dedup is structurally unnecessary — the per-batch
   ``distinct`` is the only one.

Incremental-vs-batch equality: a pair (a, b) with b ingested at or after
a collides in some (band, bucket) — exactly the batch candidate
condition — and is found by the join in b's micro-batch (both sides of
the bucket are present: a from the store, b from the batch). The final
pair set therefore equals ``minhash_near_duplicates`` over the full
corpus with the same (n_hashes, n_bands, k, threshold)
(tests/test_streaming.py pins this over a multi-batch replay).

At 100 TB: per-batch work is O(batch) write + a partition-pruned probe
of the accumulated bands (O(docs × n_bands) fixed-width rows at rest).
Delta-file count grows with batch count — run
:func:`compact_neardup_store` periodically (reads everything once,
commits ONE delta); unreferenced delta debris from crashes/compaction is
swept once the live pointer passes it. The hot-bucket cap is a
BATCH-side concept (global posting sizes aren't known incrementally);
cap-sensitive deployments should periodically re-run the batch operator
to rebuild the store (documented trade-off).
"""
from __future__ import annotations

import json
import pathlib
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import band_buckets, minhash_signatures
from ocr_spark.streaming.extract_stream import (
    _commit_snapshot,
    _learned_state,
    _require_local_path,
    next_commit_version,
)

BAND_DELTAS = "band_deltas"
PAIR_DELTAS = "pair_deltas"
MANIFEST = "manifest.json"

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


def _read_manifest(root: pathlib.Path, state: dict) -> dict:
    return json.loads((root / state["snapshot"] / MANIFEST).read_text())


def _read_deltas(
    spark: SparkSession, base: pathlib.Path, names: list[str]
) -> DataFrame | None:
    """Union the named immutable delta dirs via basePath partition
    discovery; the synthetic ``_delta`` partition column is dropped."""
    if not names:
        return None
    paths = [str(base / f"_delta={n}") for n in names]
    return (
        spark.read.option("basePath", str(base)).parquet(*paths).drop("_delta")
    )


def read_neardup_state(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame, DataFrame] | None:
    """Resolve the store's ``_CURRENT`` pointer and read (bands, pairs)
    as unions of the live manifest's deltas; None before the first
    commit."""
    root = _require_local_path(store_path, "near-dup store root")
    state = _learned_state(root)
    if state is None:
        return None
    man = _read_manifest(root, state)
    bands = _read_deltas(spark, root / BAND_DELTAS, man["bands"])
    pairs = _read_deltas(spark, root / PAIR_DELTAS, man["pairs"])
    assert bands is not None and pairs is not None  # empty first commits are skipped
    return bands, pairs


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


def _write_delta(
    bands: DataFrame | None,
    pairs: DataFrame | None,
    root: pathlib.Path,
    name: str,
) -> None:
    """Write one immutable per-batch delta (bands partitioned by _pb)."""
    if bands is not None:
        bands.write.mode("errorifexists").partitionBy("_pb").parquet(
            str(root / BAND_DELTAS / f"_delta={name}")
        )
    if pairs is not None:
        pairs.write.mode("errorifexists").parquet(
            str(root / PAIR_DELTAS / f"_delta={name}")
        )


def _sweep_orphan_deltas(root: pathlib.Path, keep_snapshots: int) -> None:
    """Delete delta dirs referenced by NO live v* manifest whose version
    component is strictly below the live pointer minus the keep window —
    crash debris and compacted-away history. An in-flight concurrent
    writer always targets a version ABOVE the live pointer, so its
    freshly-written (not-yet-referenced) deltas are never swept."""
    state = _learned_state(root)
    if state is None:
        return
    horizon = state.get("version", 0) - (keep_snapshots + 1)
    referenced: set[str] = set()
    for snap in root.glob("v*"):
        mf = snap / MANIFEST
        if mf.exists():
            man = json.loads(mf.read_text())
            referenced.update(man.get("bands", []))
            referenced.update(man.get("pairs", []))
    for base in (root / BAND_DELTAS, root / PAIR_DELTAS):
        if not base.exists():
            continue
        for d in base.glob("_delta=*"):
            name = d.name.split("=", 1)[1]
            try:
                born = int(name.rsplit("x", 1)[1].split("-", 1)[0])
            except (IndexError, ValueError):
                continue
            if name not in referenced and born <= horizon:
                shutil.rmtree(d, ignore_errors=True)


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
    concurrent writer is retried from the fresh snapshot with a FRESH
    delta (the stale one becomes debris for the orphan sweep).

    Commit cost is O(micro-batch): one delta write + one manifest JSON —
    the accumulated table is never rewritten (append-only manifests; the
    true Iceberg deployment maps 1:1 onto append commits)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = _require_local_path(store_path, "near-dup store root")
        root.mkdir(parents=True, exist_ok=True)
        for attempt in range(3):
            state = _learned_state(root)
            last = state.get("batch_id") if state else None
            if last is not None and batch_id <= last:
                return  # replay of an applied micro-batch
            version = next_commit_version(root)
            man = _read_manifest(root, state) if state else {"bands": [], "pairs": []}
            old_bands = _read_deltas(spark, root / BAND_DELTAS, man["bands"])
            old_pairs_names = man["pairs"]

            new_bands = _with_pb(
                _banded(batch_df, text_col, id_col, n_hashes, n_bands, k)
            )
            if old_bands is not None:
                # idempotent re-ingestion: a doc id already registered
                # (replayed source file) must not re-enter the state
                seen = old_bands.select("id").distinct()
                new_bands = new_bands.join(seen, "id", "left_anti")

            # partition-pruned probe: only store partitions holding the
            # micro-batch's buckets can produce a collision — the IN
            # filter reaches the parquet scan as a PartitionFilter
            # (pinned in tests/test_streaming.py). new_bands' own buckets
            # satisfy the filter by construction.
            batch_pbs = [
                row[0] for row in new_bands.select("_pb").distinct().collect()
            ]
            if not batch_pbs:
                if state is None:
                    # an empty FIRST batch must not commit (no delta to
                    # reference); the replayed empty batch is idempotent
                    return
                # record the batch_id against replays; manifest unchanged
                def stage_empty(tmp: pathlib.Path) -> None:
                    tmp.mkdir(parents=True, exist_ok=True)
                    (tmp / MANIFEST).write_text(json.dumps(man))

                try:
                    _commit_snapshot(
                        stage_empty, root, version,
                        stream_batch_id=batch_id, keep_snapshots=keep_snapshots,
                    )
                    return
                except RuntimeError:
                    if attempt == 2:
                        raise
                    continue
            probe_old = (
                old_bands.filter(F.col("_pb").isin(batch_pbs))
                if old_bands is not None
                else None
            )
            probe = (
                new_bands if probe_old is None
                else probe_old.unionByName(new_bands)
            )
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

            # unique delta name: batch id + target version + entropy, so a
            # retried commit never collides with its own debris
            name = f"b{batch_id}x{version}-{uuid.uuid4().hex[:8]}"
            _write_delta(new_bands, cand, root, name)
            new_man = {
                "bands": man["bands"] + [name],
                "pairs": man["pairs"] + [name],
            }

            def stage(tmp: pathlib.Path) -> None:
                tmp.mkdir(parents=True, exist_ok=True)
                (tmp / MANIFEST).write_text(json.dumps(new_man))

            try:
                _commit_snapshot(
                    stage, root, version,
                    stream_batch_id=batch_id, keep_snapshots=keep_snapshots,
                )
                _sweep_orphan_deltas(root, keep_snapshots)
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


def compact_neardup_store(
    spark: SparkSession, store_path: str, keep_snapshots: int = 2
) -> None:
    """Rewrite the accumulated state into ONE delta and commit a manifest
    referencing only it — bounds delta-file growth; superseded deltas are
    swept once the pointer passes the keep window. Keeps the recorded
    stream batch_id unchanged (compaction is not an ingest)."""
    root = _require_local_path(store_path, "near-dup store root")
    state = _learned_state(root)
    if state is None:
        return
    bands, pairs = read_neardup_state(spark, store_path)
    version = next_commit_version(root)
    name = f"compactx{version}-{uuid.uuid4().hex[:8]}"
    _write_delta(bands, pairs, root, name)
    new_man = {"bands": [name], "pairs": [name]}

    def stage(tmp: pathlib.Path) -> None:
        tmp.mkdir(parents=True, exist_ok=True)
        (tmp / MANIFEST).write_text(json.dumps(new_man))

    _commit_snapshot(
        stage, root, version,
        stream_batch_id=state.get("batch_id"), keep_snapshots=keep_snapshots,
    )
    _sweep_orphan_deltas(root, keep_snapshots)
