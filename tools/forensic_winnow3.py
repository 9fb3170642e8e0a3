"""A/B pair-generation shapes for the winnow posting lists at data/sf1.

forensic_winnow2.py: generation of 255M (string,string,long,long) pair
structs costs 125 s; the count-agg adds ~13 s. Candidates:
  cur_flat    current: flat struct(id_a,id_b,na,nb) strings
  int_flat    dense long ids, flat struct(ia,ib) — 16B structs
  int_stream  dense long ids, posexplode + tail slice, NO structs
Each timed for generation (count) and for the (ia,ib) count-agg.
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
    print(f"{label:24s} {time.monotonic() - t0:7.1f}s  -> {v}")


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ocr_spark.functions.explode import explode_nonnull
    from ocr_spark.operators.dedup import posting_pairs
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
    ).localCheckpoint(eager=True)

    # ---- current shape
    posting_s = (
        sized.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("id", "n_sh"))).alias("docs"))
        .filter(F.size("docs") <= CAP)
        .localCheckpoint(eager=True)
    )
    cur = posting_pairs(
        posting_s,
        "docs",
        lambda a, b: [
            a["id"].alias("id_a"),
            b["id"].alias("id_b"),
            a["n_sh"].alias("na"),
            b["n_sh"].alias("nb"),
        ],
        max_posting=CAP,
    )
    t("cur_flat_gen", lambda: cur.count())
    t(
        "cur_flat_agg",
        lambda: cur.groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
        .count(),
    )

    # ---- dense long ids
    dic = (
        sized.select("id")
        .distinct()
        .withColumn("_iid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    isized = sized.join(F.broadcast(dic), "id").select("_iid", "shingle")
    posting_i = (
        isized.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("_iid")).alias("docs"))
        .filter(F.size("docs") <= CAP)
        .localCheckpoint(eager=True)
    )

    flat = explode_nonnull(
        posting_i.filter(F.size("docs") >= 2),
        F.flatten(
            F.transform(
                F.col("docs"),
                lambda a, i: F.transform(
                    F.slice(F.col("docs"), i + 2, F.size("docs")),
                    lambda b: F.struct(a.alias("ia"), b.alias("ib")),
                ),
            )
        ),
        "_p",
    ).select("_p.*")
    t("int_flat_gen", lambda: flat.count())
    t(
        "int_flat_agg",
        lambda: flat.groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("c")).count(),
    )

    ex = posting_i.filter(F.size("docs") >= 2).select(
        F.col("docs").alias("_docs"), F.posexplode("docs").alias("_i", "ia")
    )
    stream = explode_nonnull(
        ex, F.slice("_docs", F.col("_i") + 2, F.size("_docs")), "ib", "ia"
    ).select("ia", "ib")
    t("int_stream_gen", lambda: stream.count())
    t(
        "int_stream_agg",
        lambda: stream.groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("c")).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
