"""The repo's one safe-explosion idiom.

NEVER inner-`explode` an array built by a fused higher-order / non-codegen
expression: Catalyst's InferFiltersFromGenerate adds a ``size(arr) > 0``
filter under the Generate, and with a CodegenFallback producer fused into
the same codegen stage that degrades evaluation of the WHOLE array to once
per OUTPUT row — measured 200× on the winnowing fingerprint chain (100.7 s
→ 0.5 s for 50 docs) and 2.6× on the k-gram shingle explosion at sf0.1.
``explode_outer``/``posexplode_outer`` trigger no inferred filter; the one
null row an empty/NULL array produces is dropped on the OUTPUT column,
which is byte-identical to inner-explode semantics whenever the array
cannot contain null ELEMENTS (true for every caller: md5 digests,
hash-bucket longs, regexp extracts, pair structs).

These two helpers exist so the hazard cannot be reintroduced at a new call
site — same single-definition rule as ``hashing.md5_mod`` and
``dedup.posting_pairs``.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonnull(
    df: DataFrame, arr: Column | str, alias: str, *keep: Column | str
) -> DataFrame:
    """``select(*keep, explode_outer(arr) AS alias)`` + null-row drop."""
    return df.select(*keep, F.explode_outer(arr).alias(alias)).filter(
        F.col(alias).isNotNull()
    )


def posexplode_nonnull(
    df: DataFrame,
    arr: Column | str,
    pos_alias: str,
    val_alias: str,
    *keep: Column | str,
) -> DataFrame:
    """``select(*keep, posexplode_outer(arr) AS (pos, val))`` + null drop."""
    return df.select(
        *keep, F.posexplode_outer(arr).alias(pos_alias, val_alias)
    ).filter(F.col(val_alias).isNotNull())
