"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting, and document fingerprinting over a
``documents``-style table. These generalize the reference's per-document
scoring ideas (alfalaq12/OCR ``scoring_service.py:62-126`` word extraction +
ratio scoring) to the generic training-data-curation setting.

Everything here is **pure built-in column expressions** — no Python UDFs, no
shuffle (all narrow per-row transforms), whole-stage-codegen friendly — so
the operators scale linearly with input splits: at 100 TB these run at scan
speed and the only cost is the parquet read itself. The one exception is
:func:`with_bpe_token_counts` (exact BPE is inherently iterative), which is
an Arrow-batched pandas UDF with per-word-type memoization.

Determinism contract: every function has an exact ANSI-SQL re-expression
(used as the DuckDB oracle in ``__spark_entry__.py``) — same regexes, same
word lists, same rounding.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

#: the word regex shared with the reference's scoring/unknown-word extraction
#: (scoring_service.py:71, dictionary_corrector.py:226)
WORD_RE = "[a-z]{3,}"

#: tiny deterministic stopword lists for the lang-ID heuristic (public
#: high-frequency function words; the heuristic is n-gram/stopword voting,
#: standard practice for cheap language ID)
EN_STOPWORDS = (
    "the of and to in a is that it for on with as are was at be this have "
    "from or by not but all were when we there can an your which their"
).split()
ID_STOPWORDS = (
    "yang dan di ke dari untuk dengan pada adalah ini itu tidak dalam akan "
    "ada juga saya kami mereka bisa harus sudah belum atau tersebut dapat"
).split()


def tokens(text_col: str = "text") -> Column:
    """Lowercased >=3-letter word tokens as an array (codegen, no UDF)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token / whitespace-token / char counts per document.

    ``n_tokens``: regex word tokens; ``n_ws_tokens``: whitespace-split count
    (BPE-ish upper bound ``n_bpe_est`` = ceil(chars/4), the common
    chars-per-token rule of thumb, as a cheap SQL-expressible estimator —
    :func:`with_bpe_token_counts` is the exact counter).
    """
    return df.select(
        "*",
        F.size(tokens(text_col)).alias("n_tokens"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .alias("n_ws_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_bpe_est"),
    )


def with_bpe_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """EXACT BPE token count per document (``n_bpe``) using the vendored
    merges table (functions/bpe.py) — the real budget tool the
    ``n_bpe_est = ceil(chars/4)`` heuristic in :func:`with_token_stats`
    stands in for. Arrow-batched pandas UDF (BPE application is inherently
    iterative — not expressible in built-in column functions); the encoder
    memoizes per word type, so Zipfian corpora count at dict-hit speed.
    Narrow, no shuffle; deterministic on every engine/partitioning (merge
    application order is rank-based, pinned in tests/test_textstats.py)."""

    @pandas_udf(IntegerType())
    def bpe_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ocr_spark.functions.bpe import vendored

        enc = vendored()  # loads once per Python worker (lru_cache)
        for texts in batches:
            yield pd.Series(
                [enc.count(t if isinstance(t, str) else None) for t in texts],
                dtype="int32",
            )

    return df.withColumn("n_bpe", bpe_count(F.col(text_col)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count stopword hits per language, take the
    argmax (ties and zero-evidence rows → 'und'). Adds ``lang_pred``,
    ``en_hits``, ``id_hits``. Tokenization is staged into its own
    projection so the regex runs once per row, not once per language."""
    en_lit = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    id_lit = F.array(*[F.lit(w) for w in ID_STOPWORDS])
    out = (
        df.select("*", tokens(text_col).alias("_toks"))
        .select(
            "*",
            F.size(
                F.filter("_toks", lambda t: F.array_contains(en_lit, t))
            ).alias("en_hits"),
            F.size(
                F.filter("_toks", lambda t: F.array_contains(id_lit, t))
            ).alias("id_hits"),
        )
        .drop("_toks")
    )
    return out.withColumn(
        "lang_pred",
        F.when(F.col("en_hits") > F.col("id_hits"), F.lit("en"))
        .when(F.col("id_hits") > F.col("en_hits"), F.lit("id"))
        .otherwise(F.lit("und")),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0,100].

    Features: length, alpha ratio, punctuation ratio, stopword ratio,
    mean word length. Score = 100 * (0.4*stopword_signal + 0.3*alpha_ratio
    + 0.3*length_signal), truncated toward zero like the reference's
    ``int()`` scoring (scoring_service.py:159-164). All ratios are exact
    rational arithmetic over counts, rounded to 4 dp — reproducible in SQL.
    """
    # Stage the raw counts behind an eval barrier so each regex runs ONCE
    # per row: a single Project would inline the token extraction into every
    # ratio and the score (higher-order-function expressions are not
    # codegen-subexpression-eliminated), multiplying the regex work ~4x.
    stop_lit = F.array(*[F.lit(w) for w in EN_STOPWORDS + ID_STOPWORDS])
    tokked = df.select("*", tokens(text_col).alias("_toks"))
    counted = tokked.select(
        "*",
        F.length(text_col).alias("_nc"),
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).alias("_na"),
        F.length(
            F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"()\[\]-]", "")
        ).alias("_np"),
        F.size("_toks").alias("_nt"),
        F.size(
            F.filter("_toks", lambda t: F.array_contains(stop_lit, t))
        ).alias("_ns"),
    ).drop("_toks")
    nc, na, np_, nt, ns = (F.col(c) for c in ("_nc", "_na", "_np", "_nt", "_ns"))
    alpha_ratio = F.when(nc > 0, na / nc).otherwise(F.lit(0.0))
    punct_ratio = F.when(nc > 0, np_ / nc).otherwise(F.lit(0.0))
    stop_ratio = F.when(nt > 0, ns / nt).otherwise(F.lit(0.0))
    # length signal: saturating ramp, full credit at >=200 chars
    len_signal = F.least(nc / F.lit(200.0), F.lit(1.0))
    score = F.floor(
        100 * (0.4 * stop_ratio + 0.3 * alpha_ratio + 0.3 * len_signal)
    ).cast("int")

    return counted.select(
        "*",
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality_score"),
    ).drop("_nc", "_na", "_np", "_nt", "_ns")


#: winnowing defaults: 8-char grams, 4-hash windows — any shared substring
#: of ≥ k+w-1 = 11 normalized chars is guaranteed to produce a shared
#: fingerprint (the winnowing detection guarantee)
WINNOW_K = 8
WINNOW_W = 4


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    out_col: str = "winnow",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
    the MOSS scheme): normalize → hash every k-char gram (rolling k-gram
    set) → keep the minimum of each w-hash window → distinct sorted set.
    Unlike :func:`with_fingerprint`'s whole-document hash, shared SUBSTRINGS
    of ≥ k+w-1 chars guarantee shared fingerprints, so overlap of the sets
    localizes partial copies, not just identical documents.

    Pure JVM higher-order functions, narrow, no shuffle; each stage
    (normalized text, gram hashes, window minima) sits in its own
    projection — no cross-expression CSE for these, so inlining would
    re-hash every gram per derived column. Gram hashes reuse the repo's
    md5 bucket primitive at modulus 2³² (identity on the 8-hex value), so
    the DuckDB oracle mirrors them with the standard hex-cast trick.
    Documents with fewer than k+w-1 normalized chars yield an empty set."""
    from ocr_spark.functions.hashing import md5_mod

    if k <= 0 or w <= 0:
        raise ValueError(f"k and w must be positive, got k={k}, w={w}")
    empty = F.array().cast("array<long>")
    staged = df.withColumn(
        "_wn_t", F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    )
    n_grams = F.length("_wn_t") - k + 1
    staged = staged.withColumn(
        "_wn_h",
        F.when(
            F.length("_wn_t") >= k,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: md5_mod(F.col("_wn_t").substr(i, F.lit(k)), 1 << 32),
            ),
        ).otherwise(empty),
    ).drop("_wn_t")
    n_windows = F.size("_wn_h") - w + 1
    winnowed = F.when(
        F.size("_wn_h") >= w,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda j: F.array_min(F.slice("_wn_h", j, w)),
                )
            )
        ),
    ).otherwise(empty)
    return staged.withColumn(out_col, winnowed).drop("_wn_h")


def source_stats(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source curation dashboard: doc count, distinct
    normalized-content fingerprints, duplicate rate, quality mean/min/max —
    the domain-level view a web-scale pipeline uses to decide which sources
    to keep, cap, or drop (per-host/per-domain stats in the web setting).

    Composes :func:`with_quality` + :func:`with_fingerprint` (one narrow
    scoring pass) into ONE aggregate; ``count(DISTINCT fingerprint)`` plans
    as Spark's two-stage distinct aggregate (partial per-partition expand,
    then final), so the shuffle carries (source, fingerprint) pairs — fine
    at any scale because fingerprints are fixed-width md5, and the number
    of sources is small."""
    scored = with_fingerprint(with_quality(df, text_col), text_col)
    n_docs = F.count(F.lit(1))
    n_unique = F.countDistinct("fingerprint")
    return (
        scored.groupBy(source_col)
        .agg(
            n_docs.alias("n_docs"),
            n_unique.alias("n_unique"),
            F.round(1 - n_unique / n_docs, 4).alias("dup_rate"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.min("quality_score").alias("min_quality"),
            F.max("quality_score").alias("max_quality"),
        )
        .orderBy(source_col)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the casefolded, whitespace-collapsed,
    punctuation-stripped text — the standard "normalized-content hash" used
    for fuzzy-exact dedup of near-identical formatting variants."""
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.withColumn("fingerprint", F.md5(normalized))
