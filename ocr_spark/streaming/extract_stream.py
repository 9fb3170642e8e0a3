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

import json
import pathlib
import shutil
import uuid

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


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    with_headers: bool = True,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: assemble
    each conversation's turns into one document, emitting when the
    conversation has been silent for ``gap`` of EVENT time — the streaming
    rendition of the batch page-order assembly
    (operators/extraction.assemble_conversations; reference
    ocr_service.py:594-609), with identical document text (parity-tested).

    State per conv_id = the accumulated (turn_idx, text) list; an
    event-time timeout at last_ts + gap fires once the watermark passes it,
    so state is bounded by conversations active within the watermark
    horizon — late turns inside the horizon still join their session;
    beyond it the watermark has already sealed the document. This is the
    operator shape (hand-managed state + timeout) that windowed aggs can't
    express: output depends on per-group ORDER, not just counts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)
    out_schema = (
        "conv_id string, document string, n_turns int, last_ts timestamp"
    )
    state_schema = "turns array<struct<i:int,t:string>>, last_ms long"

    def assemble(turns: list) -> str:
        # filter BEFORE sorting: None text inside the sort key would raise
        # on a (same-idx, None) vs (same-idx, str) comparison
        nonempty = [(i, t) for i, t in turns if t is not None and t.strip()]
        units = []
        for i, t in sorted(nonempty):
            if with_headers:
                units.append(f"--- Halaman {i + 1} ---\n{t}")
            else:
                units.append(t)
        return "\n\n".join(units)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (turns, last_ms) = state.get
            turns = [(int(s["i"]), s["t"]) for s in turns]
            doc = assemble(turns)
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "document": [doc],
                    "n_turns": [sum(1 for _, t in turns if t and t.strip())],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                }
            )
            return
        turns = []
        last_ms = 0
        if state.exists:
            prev_turns, last_ms = state.get
            turns = list(prev_turns)
        for pdf in pdfs:
            for i, t, ts in zip(pdf["turn_idx"], pdf["text"], pdf["ts"]):
                turns.append({"i": int(i), "t": t})
                last_ms = max(last_ms, int(pd.Timestamp(ts).value // 10**6))
        state.update((turns, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            {"conv_id": [], "document": [], "n_turns": [], "last_ts": []}
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(spec: str) -> int:
    """'30 minutes' / '2 hours' / '90 seconds' -> milliseconds."""
    n, unit = spec.split()
    factor = {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(n) * factor


#: pointer file naming the live snapshot of a versioned learned table
LEARNED_CURRENT = "_CURRENT"


def _require_local_path(path: str | pathlib.Path, what: str) -> pathlib.Path:
    """The versioned-table root is a LOCAL-FILESYSTEM contract: the commit
    protocol's arbiter is ``os.rename`` atomicity and the pointer/meta
    files are written with pathlib, while the row data goes through
    ``df.write`` — on an object store (s3a://...) or HDFS the two halves
    would land in different filesystems and rename would not be atomic.
    Reject URI-schemed paths loudly instead of splitting the artifact; the
    deployment-grade rendition is an Iceberg/metastore commit transaction
    (or routing the small writes through the Hadoop FileSystem API)."""
    s = str(path)
    scheme, sep, _ = s.partition("://")
    if sep and scheme != "file":
        raise NotImplementedError(
            f"{what} requires a local filesystem path (atomic-rename commit "
            f"protocol); got scheme {scheme!r}: {s}. Use an Iceberg/metastore "
            f"commit for object-store deployments."
        )
    return pathlib.Path(s[7:] if s.startswith("file://") else s)


def _learned_state(root: pathlib.Path) -> dict | None:
    cur = root / LEARNED_CURRENT
    if not cur.exists():
        return None
    return json.loads(cur.read_text())


def _state_version(state: dict | None) -> int:
    if state is None:
        return -1
    # .get fallback: pointers from before the version/batch_id split
    return state.get("version", state.get("batch_id", -1))


def next_commit_version(root: pathlib.Path) -> int:
    """The version a new commit should target: one past BOTH the pointer
    and the highest existing snapshot dir. Skipping past unreferenced dirs
    is what makes crash debris (a writer that died between its rename and
    its pointer swap) harmless: nobody ever deletes or reuses a dir that
    might belong to a live concurrent writer — the orphan just gets
    superseded and swept by a later committer's GC once the pointer has
    advanced past it."""
    dir_max = -1
    for p in root.glob("v*"):
        try:
            dir_max = max(dir_max, int(p.name[1:]))
        except ValueError:
            continue
    return max(_state_version(_learned_state(root)), dir_max) + 1


def read_learned_table(spark: SparkSession, learned_table_path: str) -> DataFrame | None:
    """Resolve the ``_CURRENT`` pointer of a versioned learned table and
    read the live snapshot; None when no snapshot has been committed yet."""
    root = pathlib.Path(learned_table_path)
    state = _learned_state(root)
    if state is None:
        return None
    return spark.read.parquet(str(root / state["snapshot"]))


def learning_foreach_batch(learned_table_path: str, keep_snapshots: int = 2):
    """``foreachBatch`` hook: accrue unknown-word frequencies per
    micro-batch by reusing the batch epoch merge — A7 semantics identical
    in stream and batch (epoch == micro-batch).

    Exactly-once across foreachBatch's at-least-once replays: the last
    applied batch_id is recorded in the ``_CURRENT`` pointer, and a replayed
    micro-batch (batch_id <= recorded) is a no-op — without this, a
    crash-replay would re-ADD frequencies and auto-approve words early.

    Snapshot protocol (the plain-filesystem rendition of an Iceberg
    ``MERGE INTO`` + snapshot commit): merge reads snapshot N and writes
    snapshot N+1 to a temp dir, the dir is renamed into place, then the
    pointer file is atomically replaced. No driver-side ``collect()`` —
    the merge stays on executors, so a 100 TB multilingual vocabulary is
    fine. The last ``keep_snapshots`` snapshots are retained (crash safety
    + debug); older ones are GC'd."""
    from ocr_spark.operators.learning import accrue_learned, epoch_word_counts

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = _require_local_path(learned_table_path, "learned table root")
        root.mkdir(parents=True, exist_ok=True)
        # retry loop: a commit lost to a concurrent admin (CLI) writer is
        # re-merged against the fresh snapshot — dropping the batch would
        # lose its counts, and propagating would kill the whole stream
        for attempt in range(3):
            state = _learned_state(root)
            last_stream = state.get("batch_id") if state else None
            if last_stream is not None and batch_id <= last_stream:
                return  # at-least-once replay of an applied micro-batch
            existing = (
                spark.read.parquet(str(root / state["snapshot"]))
                if state
                else None
            )
            merged = accrue_learned(existing, epoch_word_counts(batch_df))
            version = next_commit_version(root)
            try:
                commit_learned_snapshot(
                    merged, root, version, stream_batch_id=batch_id,
                    keep_snapshots=keep_snapshots,
                )
                return
            except RuntimeError:
                if attempt == 2:
                    raise  # persistent contention: surface it
            except Exception:
                # the merge READS the source snapshot lazily during the
                # commit's write job — a concurrent faster writer's GC can
                # delete it mid-read, surfacing as a raw Spark/IO error
                # rather than the protocol's RuntimeError. If the pointer
                # moved since our read, treat it as the same retryable
                # conflict (re-resolve and re-merge); a failure with an
                # UNCHANGED pointer is a real error and propagates.
                if attempt == 2 or _learned_state(root) == state:
                    raise

    return hook


def commit_learned_snapshot(
    merged: DataFrame,
    root: pathlib.Path,
    version: int,
    stream_batch_id: int | None = None,
    keep_snapshots: int = 2,
) -> None:
    """Snapshot-commit protocol shared by the streaming hook and the batch
    learning CLI: write the new table to a temp dir, rename it into place,
    atomically replace the ``_CURRENT`` pointer, GC old snapshots.

    The pointer tracks TWO counters: ``version`` (every commit, any
    writer — names the snapshot dir) and ``batch_id`` (the last STREAMING
    micro-batch applied — the hook's at-least-once replay guard). They
    must stay separate: if a CLI mutation advanced the replay guard, a
    resumed stream would treat genuinely new micro-batches as replays and
    silently drop their counts. A CLI commit passes
    ``stream_batch_id=state['batch_id']`` unchanged.

    Optimistic concurrency: the commit raises ``RuntimeError`` when
    another writer took this ``version`` first. The ARBITER is the
    atomic ``rename(tmp → v{version})`` — each writer stages into a
    uniquely named tmp dir, so concurrent same-version writers can't
    delete each other's in-flight output, and exactly one rename wins;
    the loser cleans up and raises. An already-existing ``v{version}``
    dir is ALWAYS a conflict — it is either a live concurrent writer
    between its rename and pointer swap, or crash debris; deleting it
    inline could destroy the winner's just-committed snapshot, so this
    commit never removes a same-version dir (callers pick the next
    version with :func:`next_commit_version`, which skips past debris;
    debris is swept only by a LATER committer's GC, after the pointer has
    advanced past it). A pointer re-check immediately before the swap
    keeps a slower lower-version writer from regressing ``_CURRENT`` past
    a higher commit. Callers retry from a fresh read (the streaming hook
    does; the CLI reports and exits). This is a plain-LOCAL-filesystem
    protocol (rename atomicity — URI-schemed roots are rejected); it
    makes every detectable race an error instead of a silent clobber — a
    metastore/Iceberg commit transaction is the deployment-grade version.

    GC keeps ``keep_snapshots`` + 1 snapshot dirs (one extra beyond the
    nominal retention): a concurrent slower writer reads its merge source
    lazily during its own write job, so the previous-but-one snapshot must
    outlive in-flight merges; everything swept is strictly below the
    pointer just committed."""
    _commit_snapshot(
        lambda tmp: merged.write.mode("overwrite").parquet(str(tmp)),
        root,
        version,
        stream_batch_id=stream_batch_id,
        keep_snapshots=keep_snapshots,
    )


def _commit_snapshot(
    stage,
    root: pathlib.Path,
    version: int,
    stream_batch_id: int | None = None,
    keep_snapshots: int = 2,
) -> None:
    """The protocol core shared by every versioned snapshot table (the
    learned-words table, the streaming near-dup store): ``stage(tmp)``
    writes the snapshot's full content into the staging dir — one parquet
    table or several subdir tables — and everything from the rename
    arbiter on is identical. See :func:`commit_learned_snapshot` for the
    concurrency contract."""
    root = _require_local_path(root, "versioned table root")
    root.mkdir(parents=True, exist_ok=True)
    snap = f"v{version:010d}"
    tmp = root / f"_tmp-{snap}-{uuid.uuid4().hex[:8]}"  # per-writer staging
    stage(tmp)

    def conflict(reason: str):
        shutil.rmtree(tmp, ignore_errors=True)
        return RuntimeError(
            f"concurrent learned-table commit on {root}: {reason}; "
            f"re-read state and retry"
        )

    def current_version():
        return _state_version(_learned_state(root))

    if current_version() >= version:
        raise conflict(f"pointer already at or past v{version:010d}")
    final = root / snap
    if final.exists():
        # live concurrent writer mid-commit OR crash debris — never rmtree
        # it here (the live writer's rename may have JUST won); the retry
        # path targets a higher version via next_commit_version
        raise conflict(f"snapshot dir {snap} already exists")
    try:
        tmp.rename(final)  # the arbiter: exactly one same-version winner
    except OSError as e:
        raise conflict(f"lost the rename race for {snap}") from e
    if current_version() >= version:  # re-check just before the swap
        raise RuntimeError(
            f"concurrent learned-table commit on {root}: pointer advanced "
            f"past v{version:010d} after rename; snapshot left for GC"
        )
    ptr_tmp = root / f"{LEARNED_CURRENT}.tmp-{uuid.uuid4().hex[:8]}"
    ptr_tmp.write_text(
        json.dumps(
            {"snapshot": snap, "version": version, "batch_id": stream_batch_id}
        )
    )
    ptr_tmp.rename(root / LEARNED_CURRENT)  # atomic commit
    # sweep runs only after a successful pointer swap, so every deleted dir
    # (including any adopted crash debris) is strictly below the live
    # pointer; +1 defers one extra version for in-flight lazy readers
    for old in sorted(root.glob("v*"))[: -(keep_snapshots + 1)]:
        shutil.rmtree(old)
