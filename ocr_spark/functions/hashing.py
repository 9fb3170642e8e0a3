"""The repo's one deterministic bucket primitive.

``md5_mod(col, n)`` = first-8-hex-chars-of-md5 as a 32-bit value, mod n —
portable bit-for-bit across every engine this repo compares against:

- Spark:  ``conv(substring(md5(x), 1, 8), 16, 10) % n``
- DuckDB: ``('0x' || substring(md5(x), 1, 8))::BIGINT % n``
- Python: ``int(hashlib.md5(x).hexdigest()[:8], 16) % n``

Used for training-shard placement (operators/sharding.py), stratified
sampling quotas (operators/dedup.py) and the feature-hashing trick
(operators/similarity.py) so a single recipe backs every oracle mirror.
The input column must already be a string — casting is the caller's
explicit choice because it IS the cross-engine stringification contract
(e.g. BIGINT → '123' must match DuckDB's VARCHAR cast).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_mod(str_col: Column, n: int) -> Column:
    """Uniform deterministic bucket in [0, n) from a string column; NULL in
    → NULL out. Raises at plan-build time for a non-positive modulus."""
    if n <= 0:
        raise ValueError(f"modulus must be positive, got {n}")
    h = F.conv(F.substring(F.md5(str_col), 1, 8), 16, 10)
    return h.cast("long") % n
