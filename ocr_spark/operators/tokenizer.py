"""Distributed BPE tokenizer training — the corpus-scale path for the
vendored mini-BPE of functions/bpe.py (greedy byte-pair merging, Sennrich
et al. 2016), the same trainer-as-a-Spark-job recipe as the distributed
k-means in operators/similarity.py: the offline tools/train_bpe.py
collects texts to the driver, which stops being possible long before
100 TB, while the trainer STATE — the word-type vocabulary — is corpus-
size-independent (Zipf: new text stops minting new types) and lives
happily as a DataFrame.

Shape per merge iteration: ONE pair-count aggregate over the vocabulary
(adjacent symbol pairs built narrowly with zip_with over each type's
symbol array; map-side partial combine, exact integer counts), ONE
TakeOrdered(1) argmax with the reference's (count desc, pair asc) tie
rule, and ONE narrow left-to-right merge rewrite (an aggregate fold with
a skip flag — the published sequential merge semantics, per row). The
vocabulary is localCheckpoint'ed each iteration (superseded generations
freed — the connected-components discipline) so 200 iterations never
stack 200 plans.

Determinism: everything is exact integer counts and lexicographic ties,
so the merges list is bit-identical to functions/bpe.train_bpe on the
same texts — pinned by pytest — at any partitioning. Word splitting
mirrors Python str.split() on ASCII whitespace (the corpus contract;
Java \\s and Python's unicode split differ outside ASCII)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.bpe import EOW
from ocr_spark.functions.explode import explode_nonnull
from ocr_spark.operators.dedup import _free_checkpoint


def word_type_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols array<string>, n) — one row per distinct whitespace word,
    symbols = chars + the end-of-word marker. ONE explode + hash
    aggregate over the corpus (the unigram_counts shape); everything the
    merge loop touches afterwards is vocabulary-sized."""
    words = explode_nonnull(
        df.select(F.split(F.col(text_col), r"\s+").alias("_w")), "_w", "word"
    ).filter(F.col("word") != "")
    types = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    symbols = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )
    return types.select(symbols.alias("symbols"), "n")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        explode_nonnull(vocab.filter(F.size(s) >= 2), pairs, "_p", "n")
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_expr(a: str, b: str):
    """Narrow left-to-right merge of the pair (a, b) in a symbols array:
    fold over positions with a skip flag, exactly the reference's
    sequential scan (a merged pair's right symbol cannot start another
    merge — 'aaa' with pair (a,a) becomes ['aa','a'])."""
    s = F.col("symbols")
    step = lambda acc, i: (  # noqa: E731
        F.when(acc["skip"], F.struct(acc["arr"].alias("arr"),
                                     F.lit(False).alias("skip")))
        .when(
            (F.element_at(s, i + 1) == a)
            & (i + 2 <= F.size(s))
            & (F.element_at(s, i + 2) == b),
            F.struct(
                F.concat(acc["arr"], F.array(F.lit(a + b))).alias("arr"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["arr"], F.array(F.element_at(s, i + 1))).alias(
                    "arr"
                ),
                F.lit(False).alias("skip"),
            )
        )
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.size(s) - 1),
        F.struct(
            F.array().cast("array<string>").alias("arr"),
            F.lit(False).alias("skip"),
        ),
        step,
        lambda acc: acc["arr"],
    )


def train_bpe_distributed(
    df: DataFrame, text_col: str = "text", n_merges: int = 200
) -> list[tuple[str, str]]:
    """Greedy BPE merges learned over the corpus as a Spark job;
    bit-identical to functions/bpe.train_bpe on the same texts. Returns
    the ordered merges (driver-resident by nature — a few hundred
    tuples); feed them to functions/bpe.BPE for encoding/counting.

    Per-word-type counts stay exact through every rewrite (types descend
    from distinct words, whose symbol concatenation IS the word — merges
    can never collide two types, so no re-aggregation is needed). Each
    iteration materializes the rewritten vocabulary with an eager
    localCheckpoint and frees the superseded generation, so plan depth
    and executor storage stay O(1) across hundreds of merges."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    vocab = word_type_vocab(df, text_col).localCheckpoint(eager=True)
    prev: DataFrame | None = None
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # ONE job per iteration: the argmax action also materializes the
        # current vocabulary's LAZY checkpoint (an eager one would be a
        # second job per merge — measured ~2× the wall for nothing); the
        # superseded generation is freed only after that materialization
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if prev is not None:
            _free_checkpoint(prev)
            prev = None
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        nxt = vocab.select(
            _merge_expr(a, b).alias("symbols"), "n"
        ).localCheckpoint(eager=False)
        prev, vocab = vocab, nxt
    _free_checkpoint(vocab)
    if prev is not None:
        _free_checkpoint(prev)
    return merges
