"""PII redaction for training-data curation.

Scrubs the personally-identifiable patterns every web-scale corpus pipeline
removes before training — email addresses, IPv4 addresses, long digit runs
(phone/account numbers) — as **pure JVM ``regexp_replace`` chains**: no
Python UDFs, narrow per-row transforms, whole-stage-codegen friendly, so at
100 TB this runs at parquet scan speed exactly like the rest of
``textstats``. This generalizes the reference's per-document text
normalization pass (alfalaq12/OCR ``text_processor.py`` applies ordered
regex rewrites per page) to the corpus-curation setting.

Determinism contract: rules are applied in the fixed :data:`PII_RULES`
order, each rule's hit count is taken on the text *as of that stage* (email
hits on the raw text, IP hits after emails are masked, digit runs last), and
every pattern is written in the common Java-regex/RE2 subset (character
classes + bounded quantifiers, no alternation, no backreferences) so the
DuckDB oracle replays the chain byte-for-byte. Replacement tokens contain no
digits or ``@``/dots, so a later rule can never match inside an earlier
rule's mask.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ordered (name, pattern, replacement) rules. Patterns deliberately use only
#: the Java/RE2-common subset; greedy quantifiers over character classes
#: match the same spans under Java's leftmost-first backtracking and RE2's
#: leftmost-longest rule (no alternation → the greedy walk IS the longest).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # 8+ chars of digits/space/dash/parens, starting and ending on a digit:
    # phone numbers, account numbers, card numbers with separators
    ("longnum", r"[0-9][-0-9 ()]{6,}[0-9]", "<NUM>"),
)


def with_pii_redacted(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Adds ``out_col`` (the scrubbed text) and one ``n_<rule>`` hit-count
    column per rule. NULL text stays NULL (counts NULL too).

    Each stage is its own projection so every regex runs once per row —
    Spark has no cross-expression CSE for non-codegen (higher-order /
    multi-use) projections, and inlining the replace chain into the counts
    would re-run the earlier regexes per derived column."""
    out = df.select("*", F.col(text_col).alias("_pii0"))
    for i, (name, pat, rep) in enumerate(PII_RULES):
        cur = f"_pii{i}"
        out = out.select(
            "*",
            F.size(
                F.regexp_extract_all(F.col(cur), F.lit(pat), F.lit(0))
            ).alias(f"n_{name}"),
            F.regexp_replace(F.col(cur), F.lit(pat), F.lit(rep)).alias(
                f"_pii{i + 1}"
            ),
        ).drop(cur)
    return out.withColumnRenamed(f"_pii{len(PII_RULES)}", out_col)


def pii_rules_sql(text_expr: str) -> tuple[str, list[str]]:
    """The same rule chain as DuckDB SQL: returns (redacted_expr,
    [count_expr per rule]) over ``text_expr``, counts staged exactly like
    the Spark plan (each count on the text as of its stage). Used by the
    oracle so Spark and DuckDB replay one shared rule table."""
    counts = []
    cur = text_expr
    for name, pat, rep in PII_RULES:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return cur, counts
