"""Skewed-key as-of micro-bench: one hot key holding ~95% of rows.

The unsalted path sorts the hot key in ONE task; the salted two-pass
splits it across time buckets. Reports wall times + equality of results.
Run on an idle box (in-process back-to-back, median of reps).

  python tools/bench_asof_skew.py [--left 2000000] [--right 200000]
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ocr_spark.operators.joins import asof_join
from ocr_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", type=int, default=2_000_000)
    ap.add_argument("--right", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=float, default=3600.0)
    args = ap.parse_args()

    spark = get_spark("asof-skew-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # 95% of rows on key 'HOT', the rest over 50 cold keys; ts spans ~40
    # days of seconds so width=3600 yields ~1000 buckets for the hot key
    span = 3_456_000
    key = F.when(F.col("id") % 20 != 0, F.lit("HOT")).otherwise(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
    )
    left = (
        spark.range(args.left)
        .select(
            key.alias("sym"),
            (F.col("id") * 2654435761 % span).cast("double").alias("ts"),
            F.col("id").alias("trade_id"),
        )
    )
    right = (
        spark.range(args.right)
        .select(
            key.alias("sym"),
            (F.col("id") * 40503 % span).cast("double").alias("ts"),
            F.col("id").alias("quote_id"),
        )
    )

    def run(salt):
        df = asof_join(left, right, on="sym", prefix="q_",
                       salt_bucket_seconds=salt)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # correctness first: salted == unsalted on a 1% sample of keys' rows
    a = asof_join(left.filter("trade_id % 100 = 0"), right, on="sym",
                  prefix="q_")
    b = asof_join(left.filter("trade_id % 100 = 0"), right, on="sym",
                  prefix="q_", salt_bucket_seconds=args.width)
    ah = a.selectExpr("sum(hash(sym, ts, trade_id, q_ts, q_quote_id)) h").first()["h"]
    bh = b.selectExpr("sum(hash(sym, ts, trade_id, q_ts, q_quote_id)) h").first()["h"]
    assert ah == bh, (ah, bh)
    print(f"equality: OK (checksum {ah})")

    times = {"unsalted": [], "salted": []}
    for rep in range(args.reps):
        for name, salt in (("unsalted", None), ("salted", args.width)):
            dt = run(salt)
            times[name].append(dt)
            print(f"rep{rep} {name:9s} {dt:6.2f}s", flush=True)
    print("\n=== medians ===")
    for name, ts in times.items():
        print(f"{name:9s} {statistics.median(ts):6.2f}s "
              f"(all: {[round(t, 2) for t in ts]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
