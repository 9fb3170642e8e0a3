"""PII-redaction operator tests: masking, staged counts, NULL handling."""
from __future__ import annotations

import pytest

from ocr_spark.operators.redaction import PII_RULES, with_pii_redacted

CLEAN = "no personal data in this sentence at all"
EMAIL = "reach me at jane.doe+spam@sub.example.co.uk today"
IPS = "served from 10.0.0.1 and 192.168.100.200 last night"
PHONE = "call (0812) 345-6789 or 0812-9876543 now"
MIXED = "a@b.io logged in from 8.8.8.8 card 4111 1111 1111 1111"


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(
        [
            (0, CLEAN),
            (1, EMAIL),
            (2, IPS),
            (3, PHONE),
            (4, MIXED),
            (5, None),
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    return {r["doc_id"]: r for r in with_pii_redacted(df).collect()}


def test_clean_text_is_identity(redacted):
    r = redacted[0]
    assert r["redacted"] == CLEAN
    assert (r["n_email"], r["n_ipv4"], r["n_longnum"]) == (0, 0, 0)


def test_email_masked(redacted):
    r = redacted[1]
    assert r["redacted"] == "reach me at <EMAIL> today"
    assert r["n_email"] == 1


def test_ipv4_masked(redacted):
    r = redacted[2]
    assert r["redacted"] == "served from <IP> and <IP> last night"
    assert r["n_ipv4"] == 2


def test_long_digit_runs_masked(redacted):
    r = redacted[3]
    # "(0812) 345-6789" collapses to one run (digits/space/dash/parens
    # between its first and last digit), "0812-9876543" to another
    assert r["redacted"] == "call (<NUM> or <NUM> now"
    assert r["n_longnum"] == 2


def test_all_rules_compose(redacted):
    r = redacted[4]
    assert r["redacted"] == "<EMAIL> logged in from <IP> card <NUM>"
    assert (r["n_email"], r["n_ipv4"], r["n_longnum"]) == (1, 1, 1)


def test_counts_are_per_stage(redacted):
    # the email local part and IP octets contain digits, but by the time
    # the longnum rule runs they are already masked — no double counting
    assert redacted[4]["n_longnum"] == 1


def test_null_and_empty_text(redacted):
    assert redacted[5]["redacted"] is None
    assert redacted[5]["n_email"] is None
    assert redacted[6]["redacted"] == ""
    assert (redacted[6]["n_email"], redacted[6]["n_longnum"]) == (0, 0)


def test_masks_contain_no_redactable_chars():
    # invariant that makes the staged chain order-safe: no mask can ever
    # feed a later rule
    for _, _, rep in PII_RULES:
        assert "@" not in rep and not any(c.isdigit() for c in rep)


def test_rules_match_python_re(redacted):
    """The Java-regex patterns mean the same thing under Python's engine —
    cross-dialect evidence beyond the DuckDB oracle."""
    import re

    for doc_id, text in ((1, EMAIL), (2, IPS), (3, PHONE), (4, MIXED)):
        cur = text
        for name, pat, rep in PII_RULES:
            assert len(re.findall(pat, cur)) == redacted[doc_id][f"n_{name}"]
            cur = re.sub(pat, rep, cur)
        assert cur == redacted[doc_id]["redacted"]
