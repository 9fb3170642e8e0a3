"""Second-stage curate forensics: the operator's stages are fast (3.8 s
full composition in-process) but the bench records 13.4 s — reproduce the
bench's EXACT query + noop-write forcing to find the delta."""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.1"


def main():
    import __spark_entry__ as e

    if "--bench-session" in sys.argv:
        from ocr_spark.session import get_spark

        spark = get_spark("forensic-curate2", master="local[32]",
                          shuffle_partitions=32)
    else:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "16g")
            .appName("forensic-curate2")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def force_noop(name):
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def force_count(name):
        return qs[name](spark, SF_DIR).count()

    STAGES = {
        "curate_noop": lambda: force_noop("curate_corpus"),
        "curate_count": lambda: force_count("curate_corpus"),
        "decon_noop": lambda: force_noop("decontaminate"),
        "decon_count": lambda: force_count("decontaminate"),
    }
    times = {k: [] for k in STAGES}
    for rep in range(4):
        for name, fn in STAGES.items():
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{rep} {name:13s} {dt:6.2f}s", flush=True)
    print("\n=== medians ===")
    for name in STAGES:
        print(f"{name:13s} {statistics.median(times[name]):6.2f}s "
              f"(all: {[round(t,2) for t in times[name]]})")


if __name__ == "__main__":
    main()
