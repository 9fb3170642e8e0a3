"""The end-to-end training-data curation pipeline as ONE operator.

Chains the gates a corpus pass actually runs — quality score, language ID,
benchmark decontamination, near-dup cluster dedup, deterministic stratified
sampling — sharing work the naive operator chain recomputes:

* the gate SURVIVORS (quality + lang-ID features + shingle-id arrays,
  one narrow scoring pass) are ``localCheckpoint``-ed once; every later
  consumer — the shingle explosion feeding both the decontamination join
  and the Jaccard posting lists, the anti-joins, the final projection —
  derives from that materialization, so the regex-heavy scoring and
  tokenize+md5 work (extraction-style, ~1000× compute per byte) never
  re-executes (pass ``checkpoint_dir`` for reliable ``checkpoint`` on a
  cluster — the same knob connected_components takes);
* pair→cluster resolution and the final anti-join reuse the dedup
  operators unchanged.

Semantics are EXACTLY the composition of the individual operators (the
entry-level oracle pins this: same output as the chained SQL), just with
the redundant physical work removed.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import (
    connected_components,
    jaccard_pairs_from_exploded,
    shingle_ids_from_tokens,
    stratified_sample,
)
from ocr_spark.operators.textstats import tokens, with_lang_id, with_quality


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    quotas: dict[str, int],
    min_quality: int = 50,
    drop_lang: str = "und",
    jaccard_threshold: float = 0.1,
    k: int = 3,
    max_doc_freq: int | None = 1000,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns the curated corpus rows (id, stratum, lang_pred,
    quality_score): quality ≥ ``min_quality``, language ≠ ``drop_lang``,
    zero benchmark shingle overlap, one doc (min id) per near-dup cluster,
    sampled per-stratum."""
    scored = with_lang_id(with_quality(docs, text_col), text_col)
    # ONE materialization of the gate survivors (quality/lang scoring is
    # regex-heavy): every later consumer — the shingle explosion, the
    # anti-joins, the final projection — derives from this checkpoint, so
    # the scoring pass never re-executes. The token array is staged in its
    # own projection first — the shingle expression references it 4× and
    # interpreted HOF trees re-run every reference (dedup.shingles_from_tokens)
    kept = (
        scored.filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != drop_lang)
        )
        .select(
            F.col(id_col).alias("id"),
            F.col(strata_col).alias("stratum"),
            "lang_pred",
            "quality_score",
            tokens(text_col).alias("_toks"),
        )
        .select(
            "id",
            "stratum",
            "lang_pred",
            "quality_score",
            shingle_ids_from_tokens(F.col("_toks"), k).alias("sh"),
        )
    )
    from ocr_spark.operators.dedup import _checkpointer

    kept = _checkpointer(kept, checkpoint_dir)(kept)
    # the shared shingle explosion: decontamination join + jaccard postings
    ex = kept.select(
        "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )

    from ocr_spark.functions.explode import explode_nonnull

    bench_sh = explode_nonnull(
        benchmark.select(tokens(text_col).alias("_btoks")),
        shingle_ids_from_tokens(F.col("_btoks"), k),
        "shingle",
    ).distinct()
    contaminated = (
        ex.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("id")
        .distinct()
    )
    clean_ex = ex.join(contaminated, "id", "left_anti")

    pairs = jaccard_pairs_from_exploded(clean_ex, jaccard_threshold, max_doc_freq)
    dropped = (
        connected_components(pairs, checkpoint_dir=checkpoint_dir)
        .filter(F.col("cluster") != F.col("id"))
        .select("id")
    )
    clean = (
        kept.drop("sh")
        .join(contaminated, "id", "left_anti")
        .join(dropped, "id", "left_anti")
    )
    return stratified_sample(clean, quotas, strata_col="stratum", id_col="id")