"""Source tests: binary-blob ingestion with validation pushdown (S1/S2).

The s3a path is configuration-only (same reader code); these tests drive
the identical code path over the local filesystem.
"""
from __future__ import annotations

import pytest

from ocr_spark.sources.io import (
    read_binary_documents,
    read_documents_table,
    rejected_files,
    s3a_conf,
)


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "sub").mkdir()
    (d / "a.pdf").write_bytes(b"%PDF-1.4 fake")
    (d / "b.PNG").write_bytes(b"\x89PNG fake")
    (d / "m.Png").write_bytes(b"\x89PNG mixed-case")
    (d / "sub" / "c.jpg").write_bytes(b"\xff\xd8 fake jpeg")
    (d / "notes.txt").write_bytes(b"not allowed")
    (d / "huge.pdf").write_bytes(b"x" * 2048)
    return str(d)


def test_binary_source_validation_pushdown(spark, blob_dir):
    docs = read_binary_documents(spark, blob_dir, max_bytes=1024)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in docs.collect()}
    # extension allow-list (case-INSENSITIVE, incl. mixed case) + recursion
    assert set(rows) == {"a.pdf", "b.PNG", "m.Png", "c.jpg"}
    assert rows["a.pdf"]["payload"] == b"%PDF-1.4 fake"
    assert rows["b.PNG"]["ext"] == "png"
    assert rows["c.jpg"]["size_bytes"] == len(b"\xff\xd8 fake jpeg")
    # the extension gate is a listing-time glob, not a post-read filter
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow scan


def test_rejected_files_audit(spark, blob_dir):
    audit = {
        r["path"].rsplit("/", 1)[-1]: r["reject_reason"]
        for r in rejected_files(spark, blob_dir, max_bytes=1024).collect()
    }
    assert audit == {
        "notes.txt": "extension_not_allowed",
        "huge.pdf": "file_too_large",
    }


def test_documents_table_column_pruning(spark):
    df = read_documents_table(
        spark, "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    assert df.columns == ["doc_id"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[-1][:200]  # pruned scan


def test_s3a_conf_sets_hadoop_endpoint(spark):
    s3a_conf(spark, "http://localhost:9000", "ak", "sk")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
