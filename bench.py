"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the flagship fused-extraction pipeline (the north metric is
its turns/sec) plus one representative per operator family (dedup,
similarity, text analysis, aggregates, reassembly, joins). Each query is
forced end-to-end with a noop sink (full computation, no driver collect
overhead); one warmup pass absorbs JVM/codegen compilation so the numbers
measure steady-state executor throughput, which is what scales.

SELF-DEFENSE against shared-VM noise (two rounds of ambiguous flagship
numbers forced this): every query runs ``SPARK_GRAFT_BENCH_REPS`` times
(default 3) and reports the MEDIAN; per-query spread (max−min) ships in
the JSON so a reader can tell signal from contention. The flagship gets
extra reps (up to 3 more) whenever its relative spread exceeds
``_STABLE_SPREAD`` — and if it STILL exceeds the bound, the JSON carries
``"flagship_unstable": true`` so the docs/sec headline is explicitly
marked untrustworthy rather than silently wrong.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

#: flagship reps whose (max−min)/median exceeds this are re-run; still
#: above the bound after the extra reps → flagged unstable in the JSON
_STABLE_SPREAD = 0.25

HEADLINE = [
    "flagship_extract",
    "full_pipeline",
    "boilerplate_strip",
    "pdf_layout",
    "a7_word_frequency",
    "t8_event_sessions",
    "exact_dedup",
    "minhash_near_dup",
    "jaccard_near_dup",
    "dedup_clusters",
    "simhash",
    "simhash_near_dup",
    "decontaminate",
    "curate_corpus",
    "substr_dup_stats",
    "ann_cosine_topk",
    "bm25_topk",
    "bm25_join",
    "ivf_topk",
    "knn_join",
    "embedding_near_dup",
    "semantic_dedup",
    "asof_signup_attribution",
    "range_join_error_sessions",
    "lang_id_counts",
    "line_strip",
    "rrf_fusion",
    "doc_quality",
    "gopher_repetition",
    "unigram_nll",
    "bigram_nll",
    "tfidf_topk_terms",
    "edit_near_dup",
    "pmi_collocations",
    "paragraph_dedup",
    "chunk_documents",
    "source_kl_divergence",
    "c4_filters",
    "mojibake_repair",
    "flesch_readability",
    "lexical_diversity",
    "split_summary",
    "char_entropy",
    "heaps_growth",
    "cross_source_dup_matrix",
    "event_funnel",
    "cohort_retention",
    "daily_anomalies",
    "temperature_resample",
    "length_quantiles",
    "incremental_near_dup",
    "leakage_safe_split",
    "ivf_recall",
    "collapse_repeats",
    "dialogue_audit",
    "ngram_coverage",
    "cms_heavy_hitters",
    "lsh_recall",
    "centroid_similarity",
    "ngram_novelty",
    "normalized_dedup",
    "sft_context",
    "sft_pairs",
    "conv_prefix_dedup",
    "tool_runs",
    "mad_outliers",
    "curriculum_bins",
    "truncate_context",
    "merge_role_runs",
    "quantize_embeddings",
    "curate_conversations",
    "turn_latency",
    "role_transitions",
    "bpe_token_counts",
    "fingerprints",
    "pii_redaction",
    "source_stats",
    "training_shards",
    "q1_pricing",
    "q3_nation_revenue",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    import __spark_entry__ as entrymod
    from ocr_spark.session import get_spark

    spark = get_spark("ocr-spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    # warmup: one full flagship pass spins up all Python workers, compiles
    # the rule tables per worker, and JITs the codegen'd stages — the timed
    # runs then measure steady-state throughput (what scales on a cluster)
    _force(qs["flagship_extract"](spark, SF_DIR))

    def _clean_session() -> None:
        """Between-query hygiene: operators that RETURN checkpoint-backed
        results (curate_corpus, dedup_clusters) leave their final blocks
        persisted — the caller owns their lifetime, and this caller has
        consumed them (noop write). Drop them and collect the py4j refs so
        the ContextCleaner isn't waiting on a driver GC that may never
        come. Without this the suite degrades progressively as leaked
        blocks accumulate (measured: curate_corpus 8.1 → 19.2 → 29.1 s
        over three consecutive reps — the round-3 bench regression)."""
        import gc

        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    def _timed(name: str) -> float:
        t0 = time.monotonic()
        _force(qs[name](spark, SF_DIR))
        dt = time.monotonic() - t0
        _clean_session()
        return dt

    reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        reps[name] = [_timed(name) for _ in range(REPS)]

    # per-query self-defense (same rationale as the flagship's below, at
    # lower cost): a shared-VM contention burst hitting 1-2 of 3 reps
    # still inflates the MEDIAN, so any query whose spread exceeds its
    # median gets up to 2 extra reps — an intermittent burst then leaves
    # >=3 clean reps for the median while a genuine regression (all reps
    # agreeing) spends nothing. Capped so a fully-contended box cannot
    # stretch the suite unboundedly.
    for name in HEADLINE:
        r = reps[name]
        if (max(r) - min(r)) > max(0.5, statistics.median(r)):
            r.extend(_timed(name) for _ in range(2))

    # flagship self-defense: the north metric must not be a noise artifact.
    # Stability is judged over the LAST 3 reps: early-session reps measure
    # JVM heap growth and page-cache warm-up (stage forensics: the same
    # shuffle stage shows 4355 s task runtime / 1550 s CPU cold vs
    # 224 s / 218 s warm), not the plan, so a monotone warm-up ramp must
    # extend the series instead of poisoning the headline. All reps are
    # reported so a reader can see the ramp.
    flag = reps["flagship_extract"]

    def _tail_spread(r: list[float]) -> float:
        tail = r[-3:]
        return (
            (max(tail) - min(tail)) / statistics.median(tail)
            if len(tail) > 1
            else 0.0
        )

    extra = 0
    while len(flag) > 1 and _tail_spread(flag) > _STABLE_SPREAD and extra < 3:
        flag.append(_timed("flagship_extract"))
        extra += 1
    flagship_spread = round(_tail_spread(flag), 3)
    flagship_unstable = flagship_spread > _STABLE_SPREAD

    times = {n: round(statistics.median(r), 3) for n, r in reps.items()}
    spread = {n: round(max(r) - min(r), 3) for n, r in reps.items()}
    # headline flagship time = steady-state median (last 3 reps)
    times["flagship_extract"] = round(statistics.median(flag[-3:]), 3)

    # the north metric: end-to-end turns/sec of the flagship extraction
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    turns_per_sec = round(n_docs / times["flagship_extract"], 1)

    # cap-drop counters: the hot-key caps trade recall for bounded fan-out
    # (shingles over the doc-freq cap leave the Jaccard universe; over-cap
    # LSH buckets are dropped before pair generation). Reporting the drop
    # counts makes the recall loss OBSERVABLE per tier — a silent cap reads
    # as "covered everything" when it didn't. Both counters are 0 until the
    # corpus actually has hot keys (inert at sf≤0.1; the data/sf1 tier and
    # any real corpus exercise them).
    from pyspark.sql import functions as F

    from ocr_spark.functions.explode import explode_nonnull
    from ocr_spark.operators.dedup import (
        band_buckets,
        minhash_signatures,
        shingle_ids_from_tokens,
    )
    from ocr_spark.operators.textstats import tokens

    cap = entrymod._JACCARD_CAP
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dropped_shingles = (
        explode_nonnull(
            docs.select(tokens("text").alias("_toks")),
            shingle_ids_from_tokens(F.col("_toks"), 3),
            "s",
        )
        .groupBy("s")
        .count()
        .filter(F.col("count") > cap)
        .count()
    )
    hot_buckets = (
        minhash_signatures(docs, n_hashes=16, k=3)
        .select(F.posexplode(band_buckets("signature", 4)).alias("band", "bucket"))
        .groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > cap)
        .count()
    )
    spark.stop()

    total = round(sum(times.values()), 3)
    record = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rep_spread": spread,
        "reps": REPS,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "flagship_docs": n_docs,
        "flagship_docs_per_sec": turns_per_sec,
        "flagship_reps": [round(t, 3) for t in flag],
        "flagship_spread_pct": flagship_spread,
        "flagship_unstable": flagship_unstable,
        "cap_counters": {
            "max_doc_freq": cap,
            "max_bucket_size": cap,
            "jaccard_dropped_shingles": dropped_shingles,
            "minhash_hot_buckets": hot_buckets,
        },
    }
    # persist the round record ourselves: the driver captures stdout, and
    # BENCH_r04.json shipped with "parsed": null + a truncated tail — the
    # official record must never depend on a pipe surviving intact.
    # Atomic (tmp+rename) so a killed bench never leaves a half-written
    # artifact shadowing the previous good one.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    tmp = os.path.join(bench_dir, "bench_latest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(record, fh, indent=1)
    os.replace(tmp, os.path.join(bench_dir, "bench_latest.json"))
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
