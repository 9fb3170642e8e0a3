"""Learning accrual (A7), import merge (J4), union (J5), threshold approval
— against the FIXTURES.md §2 contract: a word seen in exactly 5 turns gets
approved, a word seen in 4 does not."""
import datetime

from pyspark.sql import functions as F

from ocr_spark.operators.extraction import extract_turns
from ocr_spark.operators.learning import (
    accrue_learned,
    epoch_word_counts,
    kamus_union,
    learning_stats,
    merge_import,
    pending_top_k,
)

T0 = datetime.datetime(2026, 1, 1)


def _turns(spark, texts):
    rows = [(i, t, T0 + datetime.timedelta(seconds=i)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "turn_idx int, text string, ts timestamp")


def test_threshold_approval(spark):
    # "zxqword" in 5 turns -> approved; "fourword" in 4 -> pending;
    # per-turn dedup: repeating a word inside one turn counts once
    texts = ["zxqword zxqword fourword"] * 4 + ["zxqword"]
    df = extract_turns(_turns(spark, texts))
    counts = epoch_word_counts(df)
    learned = accrue_learned(None, counts)
    rows = {r["word"]: r for r in learned.collect()}
    assert rows["zxqword"]["frequency"] == 5 and rows["zxqword"]["is_approved"]
    assert rows["zxqword"]["approved_at"] is not None
    assert rows["fourword"]["frequency"] == 4 and not rows["fourword"]["is_approved"]
    assert rows["fourword"]["approved_at"] is None
    # first/last seen span the epoch
    assert rows["zxqword"]["first_seen"] == T0
    assert rows["zxqword"]["last_seen"] == T0 + datetime.timedelta(seconds=4)


def test_accrual_across_epochs(spark):
    e1 = extract_turns(_turns(spark, ["accrualword"] * 3))
    learned1 = accrue_learned(None, epoch_word_counts(e1))
    e2 = extract_turns(_turns(spark, ["accrualword"] * 2))
    learned2 = accrue_learned(learned1, epoch_word_counts(e2))
    row = learned2.filter(F.col("word") == "accrualword").first()
    assert row["frequency"] == 5 and row["is_approved"]


def test_validity_filter(spark):
    # <3 chars and digit-bearing words never enter the table; the UDF's
    # unknown_words are [a-z]{3,} so simulate raw epoch counts directly
    df = spark.createDataFrame(
        [([("ok-word")], T0), (["ab"], T0), (["bad1word"], T0)],
        "unknown_words array<string>, ts timestamp",
    )
    words = [r["word"] for r in epoch_word_counts(df).collect()]
    assert words == ["ok-word"]


def test_merge_import_semantics(spark):
    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    existing = spark.createDataFrame(
        [("alpha", 3, False, T0, T0, None), ("beta", 10, True, T0, T0, T0)], schema
    )
    imported = spark.createDataFrame(
        [("alpha", 7, True, T0, T0, T0), ("gamma", 1, False, T0, T0, None)], schema
    )
    rows = {r["word"]: r for r in merge_import(existing, imported).collect()}
    assert rows["alpha"]["frequency"] == 7  # max wins
    assert rows["alpha"]["is_approved"]  # approve wins
    assert rows["beta"]["frequency"] == 10
    assert rows["gamma"]["frequency"] == 1  # new insert


def test_union_topk_stats(spark):
    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    learned = spark.createDataFrame(
        [
            ("appr", 9, True, T0, T0, T0),
            ("pend1", 4, False, T0, T0 + datetime.timedelta(1), None),
            ("pend2", 4, False, T0, T0, None),
            ("pend3", 2, False, T0, T0, None),
        ],
        schema,
    )
    base = spark.createDataFrame([("rumah",), ("appr",)], "word string")
    assert kamus_union(base, learned).count() == 2  # dedup of "appr"
    top = [r["word"] for r in pending_top_k(learned, 2).collect()]
    assert top == ["pend1", "pend2"]  # freq desc, last_seen desc tiebreak
    stats = learning_stats(learned).first()
    assert (stats["total_words"], stats["approved"], stats["pending"]) == (4, 1, 3)


def test_s5_json_export_import_roundtrip(spark, tmp_path):
    """S5/S6 (routers/learning.py:184-369): learned words export as JSON and
    re-import losslessly; the re-imported table merges as a no-op."""
    from ocr_spark.operators.learning import merge_import

    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    learned = spark.createDataFrame(
        [
            ("alpha", 9, True, T0, T0, T0),
            ("beta", 4, False, T0, T0, None),
        ],
        schema,
    )
    out = str(tmp_path / "export")
    learned.coalesce(1).write.json(out)
    imported = spark.read.schema(schema).json(out)
    assert {tuple(r) for r in imported.collect()} == {
        tuple(r) for r in learned.collect()
    }
    merged = merge_import(learned, imported)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in learned.collect()
    }  # self-merge is the identity (max/or/least/greatest are idempotent)


def test_manual_approve_and_reject(spark):
    """Reference admin semantics (learning_service.py:136-165): approve
    flips pending rows only (sticky approved_at), reject deletes."""
    from ocr_spark.operators.learning import approve_words, reject_words

    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    t_old = datetime.datetime(2025, 1, 1)
    learned = spark.createDataFrame(
        [
            ("alpha", 9, True, T0, T0, t_old),
            ("beta", 4, False, T0, T0, None),
            ("gamma", 2, False, T0, T0, None),
        ],
        schema,
    )
    t_new = datetime.datetime(2026, 8, 17)
    out = {r["word"]: r for r in
           approve_words(learned, ["  Beta ", "alpha"], t_new).collect()}
    assert out["beta"]["is_approved"] and out["beta"]["approved_at"] == t_new
    assert out["alpha"]["approved_at"] == t_old  # sticky, not restamped
    assert not out["gamma"]["is_approved"]

    left = {r["word"] for r in reject_words(learned, ["GAMMA"]).collect()}
    assert left == {"alpha", "beta"}


def test_learning_snapshot_commit_roundtrip(spark, tmp_path):
    """The CLI's snapshot commit is atomic and versioned: a mutation
    yields a new readable snapshot, the pointer advances, old snapshots
    are GC'd past the keep window."""
    import pathlib

    from ocr_spark.operators.learning import approve_words
    from ocr_spark.streaming.extract_stream import (
        commit_learned_snapshot,
        read_learned_table,
    )

    root = pathlib.Path(tmp_path / "learned_cli")
    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    base = spark.createDataFrame([("kata", 3, False, T0, T0, None)], schema)
    commit_learned_snapshot(base, root, 0)
    t1 = read_learned_table(spark, str(root))
    assert t1.count() == 1 and not t1.first()["is_approved"]
    commit_learned_snapshot(
        approve_words(t1, ["kata"], datetime.datetime(2026, 8, 17)), root, 1
    )
    t2 = read_learned_table(spark, str(root))
    assert t2.first()["is_approved"]
    commit_learned_snapshot(t2, root, 2)
    commit_learned_snapshot(t2, root, 3)
    snaps = sorted(p.name for p in root.glob("v*"))
    # keep_snapshots=2 retains 2+1 dirs (one extra version deferred for
    # in-flight lazy readers of the previous snapshot) — v0 is GC'd
    assert snaps == ["v0000000001", "v0000000002", "v0000000003"]


def test_snapshot_commit_aborts_on_conflict(spark, tmp_path):
    """Optimistic concurrency: a commit whose version was already taken by
    another writer must abort, not clobber the live snapshot."""
    import pathlib

    import pytest

    from ocr_spark.streaming.extract_stream import (
        commit_learned_snapshot,
        read_learned_table,
    )

    root = pathlib.Path(tmp_path / "learned_race")
    schema = "word string, frequency long, is_approved boolean"
    a = spark.createDataFrame([("a", 1, False)], schema)
    b = spark.createDataFrame([("b", 2, False)], schema)
    commit_learned_snapshot(a, root, 0)
    commit_learned_snapshot(b, root, 1)
    # a stale writer that also computed version 1 must fail loudly...
    with pytest.raises(RuntimeError, match="concurrent"):
        commit_learned_snapshot(a, root, 1)
    # ...and the live table is untouched
    assert read_learned_table(spark, str(root)).first()["word"] == "b"


def test_s5_export_sink_and_reimport(spark, tmp_path):
    """The full S5 export surface (routers/learning.py:184-248): sectioned
    rows, version-header meta envelope, pending cap, approved_only variant,
    and a lossless reimport through the S6 merge."""
    import json

    from ocr_spark.operators.learning import (
        export_learned_words,
        merge_import,
        read_learned_export,
        write_learned_export,
    )

    schema = (
        "word string, frequency long, is_approved boolean, "
        "first_seen timestamp, last_seen timestamp, approved_at timestamp"
    )
    rows = [("app%d" % i, 10 + i, True, T0, T0, T0) for i in range(3)] + [
        ("pend%d" % i, 5 - i % 5, False, T0, T0, None) for i in range(8)
    ]
    learned = spark.createDataFrame(rows, schema)

    # pending cap honours (frequency desc, word asc)
    capped = export_learned_words(learned, pending_limit=2).collect()
    pend = [r["word"] for r in capped if r["section"] == "pending"]
    assert pend == ["pend0", "pend5"]  # both freq 5; word tie-break
    assert len([r for r in capped if r["section"] == "approved"]) == 3

    out = str(tmp_path / "s5")
    meta = write_learned_export(learned, out, export_date="2026-08-17T00:00:00")
    assert meta["version"] == "1.0" and meta["export_type"] == "full"
    assert meta["approved_count"] == 3 and meta["pending_count"] == 8
    on_disk = json.loads((tmp_path / "s5" / "_meta.json").read_text())
    assert on_disk == meta

    # round-trip: reimport == original (modulo column order), merge no-op
    imported = read_learned_export(spark, out)
    assert {tuple(r) for r in imported.select(*learned.columns).collect()} == {
        tuple(r) for r in learned.collect()
    }
    merged = merge_import(learned, imported)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in learned.collect()}

    # approved_only variant
    write_learned_export(
        learned, str(tmp_path / "s5a"), export_date="x", approved_only=True
    )
    meta_a = json.loads((tmp_path / "s5a" / "_meta.json").read_text())
    assert meta_a["export_type"] == "approved_only"
    assert meta_a["total_words"] == meta_a["approved_count"] == 3


def test_snapshot_commit_never_deletes_existing_same_version_dir(spark, tmp_path):
    """The race the old protocol had: a writer finding v{N} already on disk
    must CONFLICT, not rmtree it — that dir may be a live concurrent
    writer's just-renamed snapshot (between its rename and pointer swap).
    Debris is only swept by a later committer's GC, after the pointer has
    advanced past it."""
    import pathlib

    import pytest

    from ocr_spark.streaming.extract_stream import (
        commit_learned_snapshot,
        next_commit_version,
        read_learned_table,
    )

    root = pathlib.Path(tmp_path / "learned_debris")
    schema = "word string, frequency long, is_approved boolean"
    a = spark.createDataFrame([("a", 1, False)], schema)
    b = spark.createDataFrame([("b", 2, False)], schema)
    commit_learned_snapshot(a, root, 0)
    # simulate a concurrent writer that renamed v1 into place but has not
    # yet swapped the pointer (or crashed right there)
    b.write.parquet(str(root / "v0000000001"))
    sentinel = set((root / "v0000000001").iterdir())
    with pytest.raises(RuntimeError, match="already exists"):
        commit_learned_snapshot(a, root, 1)
    # the winner's snapshot is untouched and the pointer did not move
    assert set((root / "v0000000001").iterdir()) == sentinel
    assert read_learned_table(spark, str(root)).first()["word"] == "a"
    # the retry path targets the NEXT free version, past the debris
    assert next_commit_version(root) == 2
    commit_learned_snapshot(a, root, 2)
    assert read_learned_table(spark, str(root)).count() == 1


def test_versioned_table_rejects_object_store_paths(spark):
    """The atomic-rename commit protocol is a local-filesystem contract:
    URI-schemed roots must fail loudly instead of splitting the artifact
    between the driver's disk and the remote store (same for the export
    sink's meta header)."""
    import pytest

    from ocr_spark.operators.learning import write_learned_export
    from ocr_spark.streaming.extract_stream import commit_learned_snapshot

    df = spark.createDataFrame([("a", 1, False)], "word string, frequency long, is_approved boolean")
    with pytest.raises(NotImplementedError, match="s3a"):
        commit_learned_snapshot(df, "s3a://bucket/learned", 0)
    with pytest.raises(NotImplementedError, match="hdfs"):
        write_learned_export(df, "hdfs://nn/export", export_date="2026-08-17")
