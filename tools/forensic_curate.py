"""Round-4 forensics: curate_corpus 7.8 (r2) → 10.7 (r3) → 13.4 s (r4 bench)
with a 23 s rep spread. Break the operator into its stages and time each
in-process, interleaved, to attribute the cost."""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def main():
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("forensic-curate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    from ocr_spark.functions.explode import explode_nonnull
    from ocr_spark.operators.curation import curate_corpus
    from ocr_spark.operators.dedup import (
        connected_components,
        decontaminate,
        jaccard_pairs_from_exploded,
        shingle_ids_from_tokens,
    )
    from ocr_spark.operators.textstats import tokens, with_lang_id, with_quality

    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    quotas = {"web": 80, "wiki": 100, "forum": 60, "code": 100}

    def full():
        return curate_corpus(docs, bench, quotas).count()

    def scoring_only():
        scored = with_lang_id(with_quality(docs, "text"), "text")
        kept = (
            scored.filter(
                (F.col("quality_score") >= 50) & (F.col("lang_pred") != "und")
            )
            .select(
                F.col("doc_id").alias("id"),
                F.col("source").alias("stratum"),
                "lang_pred",
                "quality_score",
                tokens("text").alias("_toks"),
            )
            .select(
                "id", "stratum", "lang_pred", "quality_score",
                shingle_ids_from_tokens(F.col("_toks"), 3).alias("sh"),
            )
        )
        return kept.localCheckpoint(eager=True).count()

    def pairs_only():
        sized = docs.select(
            F.col("doc_id").alias("id"), tokens("text").alias("_t")
        ).select("id", shingle_ids_from_tokens(F.col("_t"), 3).alias("sh"))
        ex = explode_nonnull(sized, "sh", "shingle", "id", F.size("sh").alias("n_sh"))
        return jaccard_pairs_from_exploded(ex, 0.1, 1000).count()

    def cc_only():
        sized = docs.select(
            F.col("doc_id").alias("id"), tokens("text").alias("_t")
        ).select("id", shingle_ids_from_tokens(F.col("_t"), 3).alias("sh"))
        ex = explode_nonnull(sized, "sh", "shingle", "id", F.size("sh").alias("n_sh"))
        pairs = jaccard_pairs_from_exploded(ex, 0.1, 1000)
        return connected_components(pairs).count()

    def decon_only():
        return decontaminate(docs, bench).count()

    STAGES = {
        "scoring+ckpt": scoring_only,
        "pairs": pairs_only,
        "pairs+cc": cc_only,
        "decontaminate": decon_only,
        "full_curate": full,
    }
    reps = 4
    times = {k: [] for k in STAGES}
    for rep in range(reps):
        for name, fn in STAGES.items():
            t0 = time.monotonic()
            c = fn()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{rep} {name:14s} {dt:6.2f}s rows={c}", flush=True)
    print("\n=== medians ===")
    for name in STAGES:
        print(f"{name:14s} {statistics.median(times[name]):6.2f}s "
              f"(all: {[round(t,2) for t in times[name]]})")


if __name__ == "__main__":
    main()
