"""Epoch feedback loop: A7 accrual → J5 kamus union → next-epoch T3/T7/A6.

The reference mutates its kamus mid-stream (cross-request feedback,
learning_service.py + dictionary_corrector.py:199-214). The batch engine
uses epoch-snapshot semantics (SURVEY.md §7.4): words approved from epoch
N's accrual join the kamus for epoch N+1. These tests pin that loop
end-to-end, pure-Python first, then through the Spark job.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.textops import extract_turn, fuzzy_best_match
from ocr_spark.operators.extraction import extract_turns
from ocr_spark.operators.learning import (
    accrue_learned,
    epoch_word_counts,
    kamus_union,
)

MADE_UP = "zorblat"  # not in any dictionary
TEXT = f"dokumen {MADE_UP} penting"


def test_extra_kamus_changes_unknown_and_score():
    base = extract_turn(TEXT)
    aug = extract_turn(TEXT, extra_kamus=frozenset({MADE_UP}))
    assert MADE_UP in base["unknown_words"]
    assert MADE_UP not in aug["unknown_words"]
    assert (
        aug["quality"]["matched_words"] == base["quality"]["matched_words"] + 1
    )
    assert aug["quality"]["dictionary_match"] > base["quality"]["dictionary_match"]
    # text itself unchanged — learned words only affect tracking/scoring
    assert aug["normalized_text"] == base["normalized_text"]


def test_extra_kamus_protects_from_fuzzy():
    # a word close to a kamus word would fuzzy-correct; learning it stops that
    word = "surot"  # 1 edit from kamus word 'surat'
    base = extract_turn(word, fuzzy=True)
    aug = extract_turn(word, fuzzy=True, extra_kamus=frozenset({word}))
    assert base["normalized_text"] == "surat"
    assert aug["normalized_text"] == word


def test_fuzzy_cache_resets_between_epochs():
    # same query word, different epoch kamus -> different answers
    a = fuzzy_best_match("surot")
    b = fuzzy_best_match("surot", extra=frozenset({"surot"}))
    assert a == "surat"
    assert b == "surot"  # exact self-match at 100 wins
    assert fuzzy_best_match("surot") == "surat"  # epoch switch back


@pytest.mark.parametrize("threshold", [2])
def test_epoch_loop_via_spark(spark, threshold):
    rows = [
        ("c0", i, "user", TEXT, "", None) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )

    # epoch 1: the made-up word is unknown everywhere
    e1 = extract_turns(df)
    counts = epoch_word_counts(e1)
    learned = accrue_learned(None, counts, threshold=threshold)
    approved = {
        r["word"] for r in learned.filter("is_approved").collect()
    }
    assert MADE_UP in approved  # 3 occurrences >= threshold 2

    # J5: next epoch's kamus
    base_words = spark.createDataFrame([("dokumen",)], ["word"])
    kamus2 = {r["word"] for r in kamus_union(base_words, learned).collect()}
    assert MADE_UP in kamus2 and "dokumen" in kamus2

    # epoch 2: the word is no longer unknown, scores improve
    extra = frozenset(approved)
    e2 = extract_turns(df, extra_kamus=extra)
    u1 = e1.select(F.explode("unknown_words").alias("w")).collect()
    u2 = e2.select(F.explode("unknown_words").alias("w")).collect()
    assert any(r["w"] == MADE_UP for r in u1)
    assert not any(r["w"] == MADE_UP for r in u2)
    s1 = e1.select(F.avg("quality.dictionary_match").alias("m")).first()["m"]
    s2 = e2.select(F.avg("quality.dictionary_match").alias("m")).first()["m"]
    assert s2 > s1
