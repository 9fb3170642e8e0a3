"""Third-stage forensics: reproduce the bench's QUERY ORDERING to find the
cross-query contamination. Suspect: localCheckpoint RDDs from the CC-based
queries stay pinned in storage memory (the ContextCleaner only drops them
after driver GC), shrinking execution memory for every later query."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
ORDER = [
    "exact_dedup", "minhash_near_dup", "jaccard_near_dup", "dedup_clusters",
    "simhash_near_dup", "decontaminate", "curate_corpus",
]


def main():
    import __spark_entry__ as e
    from ocr_spark.session import get_spark

    spark = get_spark("forensic-order", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    jsc = spark.sparkContext._jsc.sc()

    def n_persistent():
        return jsc.getPersistentRDDs().size()

    for rep in range(3):
        for name in ORDER:
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            print(f"rep{rep} {name:22s} {dt:6.2f}s  persistentRDDs={n_persistent()}",
                  flush=True)
        if True:
            import gc

            gc.collect()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            print(f"  after gc+unpersist: persistentRDDs={n_persistent()}",
                  flush=True)


if __name__ == "__main__":
    main()
