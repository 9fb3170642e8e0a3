"""Scale proof for the round-3 knn_join shape fix.

Round 2's knn_join computed the per-query rank with a window over the
FULL |corpus| × |queries| scored cross-product — every query_id's entire
corpus landed on one task (single-task shuffle ∝ |corpus|). The fix does
per-partition partial top-k inside mapInPandas, so the window input is
partitions × queries × k rows.

This script runs both shapes on a synthetic 10⁶-vector corpus × 64
queries and reports wall time plus the window-input row count (the
single-task hazard, measured not asserted). Output: one JSON line.

  python tools/bench_knn_scale.py [n_corpus] [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_knn_join(corpus, queries, k=5):
    """Round 2's shape, reconstructed for the comparison: broadcast
    cross-join scoring + full-corpus-per-query rank window."""
    from ocr_spark.operators.similarity import _as_double, dot, norm

    q = queries.filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("query_id"),
        _as_double("embedding").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("id"), _as_double("embedding").alias("v")
    ).withColumn("vn", norm(F.col("v")))
    denom = F.col("vn") * F.col("qn")
    score = F.round(
        F.when(denom == 0, F.lit(0.0)).otherwise(
            dot(F.col("v"), F.col("qv")) / denom
        ),
        6,
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "id", score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.select(
            "query_id", "id", "score", F.row_number().over(w).alias("rank")
        ).filter(F.col("rank") <= k)
    )


def main() -> int:
    from ocr_spark.operators.similarity import knn_join
    from ocr_spark.session import get_spark

    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim, k = 16, 5

    spark = get_spark("knn-scale", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic corpus, generated distributed (no driver rows)
    def vec_expr(seed: int):
        return F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id") * (seed * dim + j + 1)), F.lit(1000))
                 / 500.0 - 1.0).cast("double")
                for j in range(dim)
            ]
        )

    corpus = spark.range(n_corpus).select(
        F.col("id").alias("vec_id"), vec_expr(1).alias("embedding")
    )
    queries = spark.range(n_queries).select(
        (F.col("id") + n_corpus).alias("vec_id"), vec_expr(2).alias("embedding")
    )

    t0 = time.monotonic()
    new_rows = knn_join(corpus, queries, k=k)
    n_new = new_rows.count()
    t_new = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    n_old = old_knn_join(corpus, queries, k=k).count()
    t_old = round(time.monotonic() - t0, 1)

    n_parts = corpus.rdd.getNumPartitions()
    print(
        json.dumps(
            {
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "k": k,
                "new_shape_sec": t_new,
                "old_shape_sec": t_old,
                "new_window_input_rows_max": n_parts * n_queries * k,
                "old_window_input_rows": n_corpus * n_queries,
                "rows_out": n_new,
                "rows_out_old": n_old,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
