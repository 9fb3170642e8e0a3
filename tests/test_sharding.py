"""Training-shard assignment and sharded-write tests."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.sharding import (
    assign_shards,
    shard_histogram,
    shard_id,
    write_training_shards,
)

N = 64  # docs in the fixture
SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i}", 11 + i) for i in range(N)],
        ["doc_id", "text", "n_chars"],
    )


def expected_shard(i: int, n_shards: int = SHARDS) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_shards


def test_assignment_matches_local_md5(docs):
    rows = assign_shards(docs, SHARDS).select("doc_id", "shard").collect()
    assert len(rows) == N
    for r in rows:
        assert r["shard"] == expected_shard(r["doc_id"])


def test_assignment_independent_of_partitioning(docs):
    base = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, SHARDS).collect()
    }
    re_parted = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs.repartition(7), SHARDS).collect()
    }
    assert base == re_parted


def test_histogram_partitions_the_corpus(docs):
    rows = shard_histogram(docs, SHARDS).collect()
    assert sum(r["n_docs"] for r in rows) == N
    assert sum(r["total_chars"] for r in rows) == sum(11 + i for i in range(N))
    assert {r["shard"] for r in rows} <= set(range(SHARDS))
    for r in rows:
        assert r["min_doc_id"] <= r["max_doc_id"]


def test_invalid_shard_count():
    with pytest.raises(ValueError):
        shard_id(F.col("doc_id"), 0)


def test_write_roundtrip_and_layout(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, SHARDS)

    back = spark.read.parquet(out)
    assert back.count() == N
    # partition column survives and matches the deterministic assignment
    for r in back.select("doc_id", "shard").collect():
        assert int(r["shard"]) == expected_shard(r["doc_id"])
    # every occupied shard is its own directory
    occupied = {expected_shard(i) for i in range(N)}
    dirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
    assert dirs == {f"shard={s}" for s in occupied}


def test_write_sorted_within_shard(docs, spark, tmp_path):
    out = str(tmp_path / "sorted")
    write_training_shards(docs, out, SHARDS)
    for s in {expected_shard(i) for i in range(N)}:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/shard={s}").collect()
        ]
        # one sorted file per shard → read order is id order
        assert ids == sorted(ids)


def test_max_records_per_file_bounds_files(docs, tmp_path):
    out = tmp_path / "capped"
    write_training_shards(docs, str(out), 1, max_records_per_file=10)
    files = [p for p in (out / "shard=0").iterdir() if p.suffix == ".parquet"]
    assert len(files) >= N // 10
