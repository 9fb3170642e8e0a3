"""In-process A/B forensics for the winnow fingerprint cost at data/sf1.

Stages timed back-to-back in ONE JVM (the only trustworthy methodology on
this shared VM — see BENCH/BASELINE.md):
  norm       normalize only (regexp_replace lower)
  md5_grams  + one md5 per 8-gram (the current hash)        <- suspect
  md5_full   + w-window minima + distinct sort (current op)
  poly_grams + one 8-step Karp-Rabin fold per gram (B=257, M=2^31-1)
  poly_full  + window minima (candidate hof replacement)
  arrow_full normalized text -> numpy poly hash + sliding min (candidate)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

B = 257
M = (1 << 31) - 1
K = 8
W = 4


def timed(label, df):
    t0 = time.monotonic()
    n = df.select(F.sum(F.size("out")).alias("s")).collect()[0]["s"]
    dt = time.monotonic() - t0
    print(f"{label:12s} {dt:7.1f}s  sum_sizes={n}")
    return dt


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(REPO / "data/sf1/documents.parquet"))
    if docs.rdd.getNumPartitions() < 8:
        docs = docs.repartition(32)
    docs = docs.select("doc_id", "text").localCheckpoint(eager=True)
    from ocr_spark.functions.hashing import md5_mod

    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    base = docs.withColumn("_t", norm)

    # --- norm only
    timed("norm", base.select(F.array(F.length("_t")).alias("out")))

    n_grams = F.length("_t") - K + 1
    md5_h = F.when(
        F.length("_t") >= K,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: md5_mod(F.col("_t").substr(i, F.lit(K)), 1 << 32),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = base.withColumn("out", md5_h)
    timed("md5_grams", g)

    def win_min(hcol):
        n_windows = F.size(hcol) - W + 1
        return F.when(
            F.size(hcol) >= W,
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), n_windows),
                        lambda j: F.array_min(F.slice(hcol, j, W)),
                    )
                )
            ),
        ).otherwise(F.array().cast("array<long>"))

    g2 = base.withColumn("_h", md5_h).withColumn("out", win_min(F.col("_h"))).drop("_h")
    timed("md5_full", g2)

    # --- polynomial fold: codes staged once, 8-step fold per gram
    codes = F.when(
        F.length("_t") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length("_t")),
            lambda i: F.ascii(F.col("_t").substr(i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    pb = base.withColumn("_c", codes)
    poly_h = F.when(
        F.size("_c") >= K,
        F.transform(
            F.sequence(F.lit(1), F.size("_c") - K + 1),
            lambda i: F.aggregate(
                F.slice("_c", i, K),
                F.lit(0).cast("long"),
                lambda acc, c: (acc * B + c) % M,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    timed("poly_grams", pb.withColumn("out", poly_h))
    p2 = pb.withColumn("_h", poly_h).withColumn("out", win_min(F.col("_h"))).drop("_h")
    timed("poly_full", p2)

    # --- arrow candidate
    @F.pandas_udf("array<long>")
    def winnow_arrow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or len(t) < K + W - 1:
                out.append([])
                continue
            c = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.uint64)
            n = len(c) - K + 1
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(K):
                acc = (acc * np.uint64(B) + c[j : j + n]) % np.uint64(M)
            mins = acc[: n - W + 1].copy()
            for j in range(1, W):
                np.minimum(mins, acc[j : j + n - W + 1], out=mins)
            out.append(np.unique(mins).astype(np.int64).tolist())
        return pd.Series(out)

    a = base.withColumn("out", winnow_arrow(F.col("_t")))
    timed("arrow_full", a)
    timed("arrow_full2", a)

    spark.stop()


if __name__ == "__main__":
    main()
