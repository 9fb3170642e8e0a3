"""Round-4 performance forensics: where did minhash_near_dup's +4 s go?

In-process A/B (the only trustworthy methodology on this shared VM — see
BENCH/BASELINE.md): each variant runs interleaved, 3 reps, same session,
median reported.  Variants isolate the two round-3 suspects named in
VERDICT.md:

  A. current  — signature carried through posexplode into struct postings
  B. id-only postings + signature re-join for the verify step (r2 shape)
  C. current, but signature staged behind an explicit localCheckpoint
     (tests whether the signature HOF is being re-evaluated)
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.explode import posexplode_nonnull
from ocr_spark.operators.dedup import (
    band_buckets,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    posting_pairs,
)

SF_DIR = "/root/testdata/sf0.1"


def variant_current(docs):
    return minhash_near_duplicates(
        docs, n_hashes=16, n_bands=4, threshold=0.25, max_bucket_size=1000
    )


def variant_rejoin(docs):
    sigs = minhash_signatures(docs, "text", "doc_id", 16, 3)
    cands = lsh_candidate_pairs(sigs, n_bands=4, max_bucket_size=1000)
    sa = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    sim = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e
            )
        )
        / F.size("sig_a"),
        6,
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", sim.alias("sig_sim"))
        .filter(F.col("sig_sim") >= 0.25)
    )


def variant_checkpointed(docs):
    sigs = minhash_signatures(docs, "text", "doc_id", 16, 3).localCheckpoint(
        eager=False
    )
    bands = posexplode_nonnull(
        sigs, band_buckets("signature", 4), "band", "bucket", "id", "signature"
    )
    posting = bands.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(F.struct("id", "signature"))).alias("docs")
    ).filter(F.size("docs") <= 1000)

    def pair(a, b):
        sim = F.round(
            F.size(
                F.filter(
                    F.zip_with(a["signature"], b["signature"], lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.size(a["signature"]),
            6,
        )
        return [a["id"].alias("id_a"), b["id"].alias("id_b"), sim.alias("sig_sim")]

    return (
        posting_pairs(posting, "docs", pair, max_posting=1000)
        .distinct()
        .filter(F.col("sig_sim") >= 0.25)
    )


def _staged_sigs(docs, n_hashes=16, k=3):
    """Signatures with the token array staged in its own projection so the
    4 references to it in the shingle expression don't each re-run the
    regexp tokenize (no cross-expression CSE in interpreted eval)."""
    from ocr_spark.operators.dedup import (
        _MINHASH_INIT,
        MINHASH_P,
        minhash_coefficients,
    )
    from ocr_spark.operators.textstats import tokens

    staged = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    full = F.array(F.array_join(toks, " "))
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    sh = F.array_distinct(F.when(n >= k, grams).otherwise(full))
    per_shingle = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
            "decimal(20,0)"
        ),
    )
    coeffs = minhash_coefficients(n_hashes)
    init = F.array_repeat(F.lit(_MINHASH_INIT).cast("long"), n_hashes)
    p = F.lit(MINHASH_P).cast("decimal(20,0)")
    sig = F.aggregate(
        per_shingle,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    ((F.lit(a).cast("decimal(20,0)") * h + F.lit(b)) % p).cast(
                        "long"
                    )
                    for a, b in coeffs
                ]
            ),
            lambda x, y: F.least(x, y),
        ),
    )
    return staged.select("id", sig.alias("signature"))


def variant_staged(docs):
    sigs = _staged_sigs(docs)
    bands = posexplode_nonnull(
        sigs, band_buckets("signature", 4), "band", "bucket", "id", "signature"
    )
    posting = bands.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(F.struct("id", "signature"))).alias("docs")
    ).filter(F.size("docs") <= 1000)

    def pair(a, b):
        sim = F.round(
            F.size(
                F.filter(
                    F.zip_with(a["signature"], b["signature"], lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.size(a["signature"]),
            6,
        )
        return [a["id"].alias("id_a"), b["id"].alias("id_b"), sim.alias("sig_sim")]

    return (
        posting_pairs(posting, "docs", pair, max_posting=1000)
        .distinct()
        .filter(F.col("sig_sim") >= 0.25)
    )


VARIANTS = {
    "current": variant_current,
    "staged": variant_staged,
}


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("forensic-minhash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if "--plan" in sys.argv:
        df = variant_current(docs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # count signature-aggregate occurrences in the final plan
        print("aggregate( occurrences:", plan.count("aggregate("))
        print("md5 occurrences:", plan.count("md5"))
        print("regexp occurrences:", plan.count("regexp"))
        print(df.explain("formatted"))
        return

    reps = 5
    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    counts: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in VARIANTS.items():
            t0 = time.monotonic()
            c = fn(docs).count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            counts[name] = c
            print(f"rep{rep} {name:14s} {dt:6.2f}s  rows={c}", flush=True)
    print("\n=== medians ===")
    for name in VARIANTS:
        print(f"{name:14s} {statistics.median(times[name]):6.2f}s  "
              f"(all: {[round(t,2) for t in times[name]]})  rows={counts[name]}")


if __name__ == "__main__":
    main()
