"""Stage-by-stage timing of winnow_near_duplicates at data/sf1.

Counts actions (no driver collect) so this measures ENGINE cost, not the
oracle harness's row serialization — forensic_winnow.py showed the
fingerprint computation itself is ~4 s and the sweep's 57 s is collect().
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

CAP = 1000


def t(label, fn):
    t0 = time.monotonic()
    v = fn()
    print(f"{label:22s} {time.monotonic() - t0:7.1f}s  -> {v}")


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ocr_spark.functions.explode import explode_nonnull
    from ocr_spark.operators.dedup import (
        jaccard_pairs_from_exploded,
        posting_pairs,
        winnow_near_duplicates,
    )
    from ocr_spark.operators.textstats import with_winnow_fingerprints

    docs = spark.read.parquet(str(REPO / "data/sf1/documents.parquet"))
    if docs.rdd.getNumPartitions() < 8:
        docs = docs.repartition(32)
    docs = docs.select("doc_id", "text").localCheckpoint(eager=True)

    fps = with_winnow_fingerprints(
        docs.select(F.col("doc_id").alias("id"), "text")
    )
    sized = explode_nonnull(
        fps, "winnow", "shingle", "id", F.size("winnow").alias("n_sh")
    )
    t("explode_count", lambda: sized.count())

    posting = sized.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("id", "n_sh"))).alias("docs")
    )
    posting = posting.filter(F.size("docs") <= CAP).localCheckpoint(eager=True)
    t("posting_sizes", lambda: posting.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("docs")).alias("tot"),
        F.sum(F.size("docs") * F.size("docs")).alias("sq"),
        F.max(F.size("docs")).alias("mx"),
    ).collect()[0])

    pairs = posting_pairs(
        posting,
        "docs",
        lambda a, b: [
            a["id"].alias("id_a"),
            b["id"].alias("id_b"),
            a["n_sh"].alias("na"),
            b["n_sh"].alias("nb"),
        ],
        max_posting=CAP,
    )
    t("pair_explosion", lambda: pairs.count())
    inter = pairs.groupBy("id_a", "id_b", "na", "nb").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    t("pair_agg", lambda: inter.count())

    t("full_near_dup", lambda: winnow_near_duplicates(
        docs, threshold=0.1, max_doc_freq=CAP
    ).count())
    spark.stop()


if __name__ == "__main__":
    main()
