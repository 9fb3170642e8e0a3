"""Provenance checks on the extracted dictionary data (SURVEY.md §7.1)."""
from ocr_spark.functions import dictionaries as D


def test_counts():
    assert len(D.KAMUS) == 585
    assert len(D.PHRASE_MAP) == 324
    assert len(D.MULTI_WORD_MAP) == 277
    assert len(D.FOREIGN_WORDS) == 27
    assert len(D.SPELLING_RULES) == 6
    assert len(D.J_TO_Y) == 5


def test_multiword_rule_order():
    # longest-first, stable for ties — application order is part of the contract
    lengths = [len(r.key) for r in D.MULTI_WORD_RULES]
    assert lengths == sorted(lengths, reverse=True)
    # garbage-deletion keys map to empty string
    assert sum(1 for r in D.MULTI_WORD_RULES if r.replacement == "") == 9


def test_probe_soundness():
    # every probe is a literal space-free chunk of its key
    for r in D.MULTI_WORD_RULES:
        assert r.probe in r.key.lower()
        assert " " not in r.probe


def test_spelling_rules():
    assert D.SPELLING_RULES == [
        ("oe", "u"), ("dj", "j"), ("tj", "c"),
        ("nj", "ny"), ("sj", "sy"), ("ch", "kh"),
    ]
    assert D.J_TO_Y["jang"] == "yang"
    assert D.J_TO_Y["jangan"] == "jangan"  # identity entry, stays j
