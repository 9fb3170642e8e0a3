"""Document sources: table scans, object-store paths, binary blobs (S1/S2).

The reference ingests via multipart upload with extension/size validation
(routers/ocr.py:79-188, config.py:42-43) and via a MinIO S3 client
(minio_service.py:30-39). The Spark-first rendition: documents live in a
table/lake path and ingestion IS the scan — validation becomes pushed-down
metadata filters, and "fetch object bytes" becomes the ``binaryFile``
source, which reads (path, modificationTime, length, content) with the
same code path for ``file://``, ``s3a://`` (MinIO/S3 — endpoint + creds
are Hadoop conf, no code change), ``abfss://``, etc.

Scale notes: ``pathGlobFilter`` prunes at file-listing time (no bytes read
for rejected extensions); the size cap filters on the ``length`` metadata
column (no content decode); binary contents stream one file per row, so
executor memory needs bound only to the configured cap, mirroring the
reference's 50 MB limit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference upload limits (config.py:42-43)
MAX_FILE_BYTES = 50 * 1024 * 1024
ALLOWED_EXTENSIONS = ("png", "jpg", "jpeg", "gif", "bmp", "tiff", "pdf")


def s3a_conf(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool | None = None,
) -> None:
    """Point the generic s3a filesystem at a MinIO/S3-compatible endpoint —
    the whole MinIO client re-expressed as configuration (S2). Readers below
    then take ``s3a://bucket/prefix`` paths unchanged. TLS follows the
    endpoint scheme unless ``ssl`` overrides it (never silently downgrade
    an https endpoint to plaintext)."""
    if ssl is None:
        ssl = endpoint.startswith("https")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hconf.set("fs.s3a.connection.ssl.enabled", "true" if ssl else "false")


def read_binary_documents(
    spark: SparkSession,
    path: str,
    extensions: tuple[str, ...] = ALLOWED_EXTENSIONS,
    max_bytes: int = MAX_FILE_BYTES,
    recursive: bool = True,
) -> DataFrame:
    """The upload/object-store source (S1/S2): binary blobs + metadata from
    any Hadoop-compatible path (local, s3a/MinIO, ...).

    Validation mirrors the reference's gate as *pushdown*: the extension
    allow-list compiles to a ``pathGlobFilter`` applied during file listing
    (rejected files are never opened), and the size cap filters the
    ``length`` metadata column. Returns (path, modification_time, size_bytes,
    ext, payload)."""
    # case-INSENSITIVE extension match via per-character classes — a plain
    # {png,PNG} alternation silently drops mixed-case files like `.Png`
    # (which the audit view, matching case-insensitively, wouldn't list
    # either: data would vanish from the accounting)
    classes = sorted(
        "".join(f"[{c.lower()}{c.upper()}]" for c in e)
        for e in {e.lower() for e in extensions}
    )
    globs = "{" + ",".join(classes) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{globs}")
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(path)
    )
    return (
        df.filter(F.col("length") <= max_bytes)
        .select(
            F.col("path"),
            F.col("modificationTime").alias("modification_time"),
            F.col("length").alias("size_bytes"),
            F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias("ext"),
            F.col("content").alias("payload"),
        )
    )


def read_documents_table(
    spark: SparkSession, path: str, fmt: str = "parquet", columns: list[str] | None = None
) -> DataFrame:
    """Plain table source (S1 for already-ingested text): format-agnostic
    scan with column pruning up front so ReadSchema stays minimal."""
    df = spark.read.format(fmt).load(path)
    return df.select(*columns) if columns else df


def rejected_files(
    spark: SparkSession,
    path: str,
    extensions: tuple[str, ...] = ALLOWED_EXTENSIONS,
    max_bytes: int = MAX_FILE_BYTES,
) -> DataFrame:
    """Audit view of the validation gate: files present under ``path`` that
    the source would reject, with the reason — the batch analog of the
    reference's 400/413 upload errors. Lists ALL files (no glob) but reads
    only metadata columns, never content."""
    all_files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            "path",
            F.col("length").alias("size_bytes"),
            F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias("ext"),
        )
    )
    ok_ext = F.col("ext").isin([e.lower() for e in extensions])
    return all_files.select(
        "path",
        "size_bytes",
        "ext",
        F.when(~ok_ext, F.lit("extension_not_allowed"))
        .when(F.col("size_bytes") > max_bytes, F.lit("file_too_large"))
        .alias("reject_reason"),
    ).filter(F.col("reject_reason").isNotNull())
