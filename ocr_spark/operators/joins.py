"""Time-series joins: as-of and range joins in scale-safe shapes.

The as-of join ("for each left row, the latest right row at or before it,
per key") is the workhorse of event attribution — tie each action to the
session login that preceded it, each tick to the last quote, each request
to the config version it ran under. The reference's analytics surface has
no such operator; it belongs to the large-scale-pipeline family this
engine adds (cf. kdb+ ``aj``, pandas ``merge_asof``, Flink temporal join —
all public designs).

Spark-first shape: a naive formulation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a max-per-row rerank) whose
candidate set explodes quadratically per key. Instead we UNION the two
inputs, tag the side, and run ONE window pass per key ordered by
``(ts, side, payload)`` carrying the last-seen right payload forward
(``last(..., ignorenulls=True)``). Cost: a single hash shuffle on the key
plus a per-key sort — the same cost as the aggregation Spark would need
for the rerank alone, with no intermediate blow-up. At 100 TB this is
shuffle-bound on |left|+|right| rows exactly once; a hot key serializes
into one task's sort (spill-backed) — the documented limit shared by
every per-key-ordered operator here (cf. ``t8`` sessionization). For the
SKEWED-key case, ``salt_bucket_seconds`` switches to a two-pass shape
that splits each key's sort into time-bucket tasks (see
:func:`asof_join`'s parameter docs) at the cost of one extra small
shuffle — exact same results, pinned by tests/test_joins.py.

Semantics (= DuckDB ``ASOF LEFT JOIN`` with a deterministic tie rule):
- backward: match the greatest right ``ts`` <= left ``ts`` (inclusive).
- forward: match the least right ``ts`` >= left ``ts`` (inclusive).
- several right rows at the matched timestamp: the one with the MAXIMUM
  payload struct wins (field-order lexicographic) — DuckDB leaves this
  unspecified, so oracles must pre-dedup; the operator itself is total.
- no match (or outside ``tolerance``): right columns are NULL (left join).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    prefix: str = "right_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    salt_bucket_seconds: float | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on equal ``on`` keys and the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) each ``left_ts``.

    Returns every ``left`` row with its original columns plus
    ``{prefix}{right_ts}`` and ``{prefix}{c}`` for each carried right
    column — NULL where no right row qualifies. ``tolerance_seconds``
    additionally nulls matches farther than that gap (kept rows, NULLed
    payload — left-join semantics throughout); on NUMERIC timestamp
    columns (epoch seconds, offsets) the tolerance compares in the ts
    column's own units via plain subtraction.

    NULL hygiene (= equi-join semantics, matching the DuckDB oracle):
    right rows with a NULL key or NULL timestamp never match anything
    (dropped from the match side); left rows with a NULL key or NULL
    timestamp are kept with a NULL match.

    ``salt_bucket_seconds`` (opt-in) is the SKEW escape hatch: the default
    single window sorts each key in one task, so a hot key (one symbol
    with 10⁹ events) becomes a straggler. With a bucket width set, the
    operator runs the scale-safe two-pass shape instead: (1) the same
    union+window per (key, time-bucket) — a hot key's sort now splits
    across its buckets — and (2) a per-(key, bucket) pre-aggregation of
    the right side's last-seen payload, carried across buckets by a
    window over the TINY bucket timeline and merged into bucket-local
    misses. Results are EXACTLY equal to the unsalted path (equal
    timestamps always share a bucket, so the inclusive bound and the
    max-payload tie rule are decided by the same in-bucket ordering);
    cost is one extra shuffle of one row per non-empty (key, bucket).
    Width is in seconds for timestamp columns, in the column's own units
    for numeric ones; pick it so a hot key spreads over hundreds of
    buckets (e.g. an hour for a year of ticks).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    payload_cols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in keys and c != rts
    ]
    # the matched timestamp always rides first in the payload struct (the
    # tie groups share it, so it never perturbs the max-payload tie rule)
    pay_fields = [F.col(rts).alias("_ts"), *(F.col(c).alias(c) for c in payload_cols)]

    right_matchable = right.filter(F.col(rts).isNotNull())
    for k in keys:
        right_matchable = right_matchable.filter(F.col(k).isNotNull())
    right_part = right_matchable.select(
        *keys,
        F.col(rts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*pay_fields).alias("_asof_r"),
    )
    pay_type = right_part.schema["_asof_r"].dataType
    left_part = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.struct(*(F.col(c) for c in left.columns)).alias("_asof_l"),
    )
    unioned = left_part.withColumn(
        "_asof_r", F.lit(None).cast(pay_type)
    ).unionByName(
        right_part.withColumn(
            "_asof_l",
            F.lit(None).cast(left_part.schema["_asof_l"].dataType),
        )
    )

    # one ordering serves both directions: flip only the timestamp.
    # side asc puts right rows BEFORE the left rows they tie with (the
    # inclusive bound); payload asc makes last-seen = max payload on ties.
    ts_order = (
        F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    )
    if salt_bucket_seconds is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts_order, F.col("_asof_side").asc(), F.col("_asof_r").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # a NULL left timestamp never matches (in forward mode it would
        # sort NULLS LAST in the desc ordering and see every right row)
        matched = F.when(
            F.col("_asof_ts").isNotNull(),
            F.last("_asof_r", ignorenulls=True).over(w),
        )
        out = unioned.withColumn("_asof_m", matched).filter(
            F.col("_asof_side") == 1
        )
    else:
        out = _salted_asof(
            unioned, keys, ts_order, direction, float(salt_bucket_seconds)
        )
    if tolerance_seconds is not None:
        a, b = (
            (F.col("_asof_m._ts"), F.col("_asof_ts"))
            if direction == "backward"
            else (F.col("_asof_ts"), F.col("_asof_m._ts"))
        )
        from pyspark.sql.types import NumericType

        if isinstance(unioned.schema["_asof_ts"].dataType, NumericType):
            # numeric ts columns (epoch seconds, offsets, …): the tolerance
            # is in the column's OWN units — timestamp_diff would fail at
            # analysis time with an unrelated-looking type error
            out = out.withColumn(
                "_asof_m",
                F.when((b - a) <= F.lit(float(tolerance_seconds)), F.col("_asof_m")),
            )
        else:
            # numeric microsecond gap, not an interval literal: float-
            # formatted literals break on scientific notation (5e-05), and
            # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike
            tol_us = int(round(float(tolerance_seconds) * 1_000_000))
            gap_us = F.timestamp_diff("MICROSECOND", a, b)
            out = out.withColumn(
                "_asof_m", F.when(gap_us <= tol_us, F.col("_asof_m"))
            )

    cols = [F.col(f"_asof_l.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_asof_m._ts").alias(f"{prefix}{rts}"))
    cols.extend(F.col(f"_asof_m.{c}").alias(f"{prefix}{c}") for c in payload_cols)
    return out.select(*cols)


def _salted_asof(
    unioned: DataFrame,
    keys: list[str],
    ts_order,
    direction: str,
    width: float,
) -> DataFrame:
    """The skew-safe two-pass as-of core over the tagged union frame.

    Pass 1 — bucket-local window: the unsalted ordering, but partitioned
    by (key, time-bucket); a left row whose match lives in its own bucket
    resolves here, and a hot key's sort is now ~|key rows| / #buckets per
    task. Pass 2 — cross-bucket carry: one representative right payload
    per non-empty (key, bucket) (the bucket's LAST right row under the
    same ordering — an unbounded window over right rows only, so ties
    keep the max-payload rule), carried along the bucket timeline by a
    window whose partitions hold one row per bucket, then merged into the
    bucket-local misses. Equal timestamps always land in the same bucket
    (the bucket function is monotone in ts), so inclusive-bound semantics
    never split across the seam."""
    from pyspark.sql.types import NumericType

    ts = F.col("_asof_ts")
    dt = unioned.schema["_asof_ts"].dataType
    if isinstance(dt, NumericType):
        bucket = F.floor(ts / F.lit(width))
    else:
        # TIMESTAMP / TIMESTAMP_NTZ: microseconds from a fixed epoch (a
        # cast to long is illegal on NTZ; timestamp_diff works on both)
        epoch = F.lit("1970-01-01 00:00:00").cast(dt)
        bucket = F.floor(
            F.timestamp_diff("MICROSECOND", epoch, ts) / F.lit(width * 1e6)
        )
    b = unioned.withColumn("_asof_bk", bucket)

    wloc = (
        Window.partitionBy(*keys, "_asof_bk")
        .orderBy(ts_order, F.col("_asof_side").asc(), F.col("_asof_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.when(
        ts.isNotNull(), F.last("_asof_r", ignorenulls=True).over(wloc)
    )
    b = b.withColumn("_asof_loc", local)

    # one representative right payload per non-empty (key, bucket): the
    # window value is constant over the partition, so distinct() yields
    # exactly one row per bucket
    wrep = (
        Window.partitionBy(*keys, "_asof_bk")
        .orderBy(ts_order, F.col("_asof_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    reps = (
        b.filter(F.col("_asof_side") == 0)
        .select(*keys, "_asof_bk", F.last("_asof_r").over(wrep).alias("_asof_bl"))
        .distinct()
    )

    # the bucket timeline (both sides' buckets, so carry-in exists for
    # left buckets holding no right rows), ordered along the direction;
    # the frame EXCLUDES the own bucket — pass 1 already decided it
    timeline = (
        b.select(*keys, "_asof_bk").distinct().filter(F.col("_asof_bk").isNotNull())
    )
    bord = (
        F.col("_asof_bk").asc() if direction == "backward"
        else F.col("_asof_bk").desc()
    )
    wcarry = (
        Window.partitionBy(*keys)
        .orderBy(bord)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        timeline.join(reps, [*keys, "_asof_bk"], "left")
        .select(
            *keys,
            "_asof_bk",
            F.last("_asof_bl", ignorenulls=True).over(wcarry).alias("_asof_prev"),
        )
    )
    return (
        b.filter(F.col("_asof_side") == 1)
        .join(carry, [*keys, "_asof_bk"], "left")
        .withColumn("_asof_m", F.coalesce("_asof_loc", "_asof_prev"))
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str,
    end_col: str,
    left_ts: str = "ts",
    on: str | list[str] | None = None,
    bucket_seconds: float | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Interval-containment join: each ``left`` row paired with every
    ``right`` interval where ``start_col <= left_ts <= end_col``
    (inclusive both ends), optionally also matching equi keys ``on``.

    Spark has no native range-join strategy: a bare range predicate
    compiles to BroadcastNestedLoopJoin (or a cartesian product) — an
    all-pairs scan that dies at scale. Two shapes avoid it:

    - With ``on`` keys: ordinary equi join on the keys, range predicate as
      the join filter. One hash shuffle; the range never drives the join.
    - Without keys: the BUCKETING rewrite (the technique behind
      Databricks' range-join optimization and interval libraries such as
      bedtools' binning, both public designs). Each interval explodes to
      one row per ``bucket_seconds``-wide time bucket it overlaps
      (``sequence`` on the bucket index — fan-out is
      interval_length/bucket + 1); each point maps to its single bucket;
      an EQUI join on the bucket index meets them; the exact containment
      filter runs on the matched pairs. A (point, interval) pair meets in
      exactly one bucket — the point's — so no dedup pass is needed.
      Pick ``bucket_seconds`` near the typical interval length: wider
      buckets explode less but funnel more candidates per bucket.

    Returns the left columns plus each right column under ``prefix``
    (inner-join semantics: unmatched left rows drop; a point inside k
    overlapping intervals yields k rows).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    overlap = set(keys)
    rcols = [c for c in right.columns if c not in overlap]
    rpref = right.select(
        *keys, *[F.col(c).alias(f"{prefix}{c}") for c in rcols]
    )
    p_start, p_end = f"{prefix}{start_col}", f"{prefix}{end_col}"
    contained = (F.col(left_ts) >= F.col(p_start)) & (
        F.col(left_ts) <= F.col(p_end)
    )

    if keys:
        joined = left.join(rpref, on=keys, how="inner").filter(contained)
        return joined.select(
            *left.columns, *[f"{prefix}{c}" for c in rcols]
        )

    if bucket_seconds is None:
        raise ValueError("keyless range_join requires bucket_seconds")
    w = float(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    # bucket index = whole-second epoch / width. The bucketing is internal
    # only (the exact containment filter decides semantics), so it just has
    # to be the SAME monotonic function on both sides; TIMESTAMP_NTZ gets a
    # plain TIMESTAMP cast first (session-tz consistent within the job).
    # Fractional widths are valid (floor stays monotonic); the epoch is
    # second-granular, so sub-second widths only add fan-out, never misses.
    def bidx(col: str):
        return F.floor(
            F.col(col).cast("timestamp").cast("long") / F.lit(w)
        ).cast("long")

    points = left.withColumn("_rj_bucket", bidx(left_ts))
    intervals = rpref.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(bidx(p_start), bidx(p_end))),
    )
    joined = points.join(intervals, on="_rj_bucket", how="inner").filter(
        contained
    )
    return joined.select(*left.columns, *[f"{prefix}{c}" for c in rcols])
