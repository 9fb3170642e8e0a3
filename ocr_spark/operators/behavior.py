"""Behavioral event analytics: funnels, cohort retention, anomaly z-scores.

Beyond-reference surface (SURVEY.md §2.8 X40-X42): the reference's history
DB answers "how many requests per day" (db_service.py:265-278); any team
shipping an analytics engine over the same event stream immediately asks
the next three questions — "how far do users get through an ordered flow",
"do users come back week over week", and "which user-days are abnormal".
All three are classic OLAP shapes, expressed here so ONE shuffle on the
user key carries each query.

Determinism rules (repo-wide): ratios are ratios of exact BIGINT counts;
the anomaly z-score is computed from integer sums only — the single
``sqrt`` is correctly-rounded IEEE 754 in both Spark and DuckDB, so the
oracle hash-matches without tolerance.

Scale profile at 100 TB of events:
- ``funnel``: one hash exchange on user_id + one per-user sort; the k
  cascaded window columns share that sort (same WindowSpec → Catalyst
  stacks Window nodes over a single Exchange+Sort). Final rollup is k rows.
- ``cohort_retention``: pre-``repartition(user_id)`` lets the per-user
  first-seen agg AND the per-(user, period) activity agg both reuse one
  exchange (hash partitioning on a subset of the group keys satisfies the
  clustered distribution); the (cohort, offset) rollup is the only other
  shuffle and its cardinality is cohorts × horizon, tiny.
- ``daily_anomalies``: same subset-partitioning trick — repartition on
  user_id, count per (user, day) without a second exchange, then the
  per-user moment window reuses the partitioning again. Zero-event days
  are NOT materialized (observed-days model); zero-fill upstream with
  metrics.requests_by_date(zero_fill=True) if calendar gaps must count.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step k when an event of
    type ``steps[k]`` occurs STRICTLY AFTER the earliest time they reached
    step k-1. Returns one row per step:

        (step_index, step, n_users, conv_overall, conv_from_prev)

    ``conv_overall`` = users at step k / users at step 1;
    ``conv_from_prev`` = users at step k / users at step k-1 (1.0 at k=1).

    Construction: the classic cascading-cumulative-window rewrite. Over
    one window (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING):

        t1 = cum-min ts of step-1 events
        tk = cum-min ts of step-k events with t(k-1) < ts

    Each tk is materialized as a column before the next references it
    (a window function cannot nest inside another's argument), but all k
    Window nodes share the same spec, so the physical plan has ONE
    Exchange(user) + ONE Sort — k passes over sorted runs, no extra
    shuffle. This is how funnels stay one-shuffle at any event volume;
    the alternative (k self-joins on user) is k shuffles.

    Ordering note: ties on ``ts`` are broken by ``id_col`` for a
    deterministic sort, but step advancement itself requires a strictly
    later timestamp (t(k-1) < ts), so two events sharing a timestamp never
    advance the funnel twice — same convention as the oracle SQL.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs at least 2 steps, got {list(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {list(steps)}")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = df.select(user_col, ts_col, type_col, id_col)
    prev = None
    reach_cols = []
    for k, step in enumerate(steps):
        col = f"_t{k}"
        if k == 0:
            hit = F.col(type_col) == step
        else:
            hit = (F.col(type_col) == step) & (
                F.col(prev) < F.col(ts_col)
            )
        cur = cur.withColumn(
            col, F.min(F.when(hit, F.col(ts_col))).over(w)
        )
        prev = col
        reach_cols.append(col)

    per_user = cur.groupBy(user_col).agg(
        *[
            F.max(F.col(c).isNotNull()).alias(f"_r{k}")
            for k, c in enumerate(reach_cols)
        ]
    )
    counts = per_user.agg(
        *[
            F.sum(F.when(F.col(f"_r{k}"), 1).otherwise(0))
            .cast("long")
            .alias(f"_n{k}")
            for k in range(len(steps))
        ]
    )
    rows = []
    for k, step in enumerate(steps):
        n = F.col(f"_n{k}")
        n1 = F.col("_n0")
        np_ = F.col(f"_n{max(k - 1, 0)}")
        rows.append(
            F.struct(
                F.lit(k + 1).alias("step_index"),
                F.lit(step).alias("step"),
                n.alias("n_users"),
                F.round(
                    F.when(n1 > 0, n / n1).otherwise(F.lit(0.0)), 4
                ).alias("conv_overall"),
                F.round(
                    F.when(np_ > 0, n / np_).otherwise(F.lit(0.0)), 4
                ).alias("conv_from_prev"),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("step_index")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: cohort a user by the period of their
    first event (period = floor(days-since-epoch / period_days), rendered
    as the period's start date), then for each (cohort, period-offset)
    count distinct active users and the retention ratio vs cohort size.

        (cohort_start, period_offset, n_active, cohort_size, retention)

    Period arithmetic is integer (days since epoch div period_days), not
    date_trunc, so any period length works and both engines agree exactly.
    Offset 0 always has retention 1.0 (a user is active in their own
    first period by construction).

    Shuffle profile: repartition(user) up front; the per-user min-date agg
    and per-(user, period) distinct both reuse that exchange (subset
    partitioning satisfies the clustered distribution), as does the join
    of activity back to cohorts. Only the final (cohort, offset) rollup
    re-shuffles, and its cardinality is cohorts × horizon.
    """
    if period_days <= 0:
        raise ValueError(f"period_days must be positive: {period_days}")
    base = df.repartition(F.col(user_col)).select(
        F.col(user_col).alias("u"),
        # floor, not cast-truncation: pre-epoch days are negative, and
        # truncate-toward-zero would merge days -6..6 into one fat period
        # (DuckDB's // also truncates, so the oracle uses explicit floor)
        F.floor(
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            / period_days
        )
        .cast("long")
        .alias("p"),
    )
    firsts = base.groupBy("u").agg(F.min("p").alias("cohort_p"))
    activity = base.distinct()
    joined = activity.join(firsts, "u").select(
        "u",
        "cohort_p",
        (F.col("p") - F.col("cohort_p")).cast("int").alias("period_offset"),
    )
    sizes = firsts.groupBy("cohort_p").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    grid = joined.groupBy("cohort_p", "period_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_p")
        .select(
            F.date_add(
                F.lit("1970-01-01"),
                (F.col("cohort_p") * period_days).cast("int"),
            ).alias("cohort_start"),
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_start", "period_offset")
    )


def daily_anomalies(
    df: DataFrame,
    z_threshold: float = 2.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_days: int = 3,
) -> DataFrame:
    """Per-user daily-volume anomalies: days whose event count deviates
    from that user's own mean by more than ``z_threshold`` population
    standard deviations. Returns

        (user_id, date, n_events, z)   ordered, anomalous days only.

    Integer-exact z-score: with per-day counts x, n observed days,
    S = Σx, Q = Σx² (all BIGINT),

        z = (n·x − S) / sqrt(n·Q − S²)

    — algebraically (x − mean)/std_pop but evaluated from integer sums, so
    the only inexact operation is one IEEE sqrt; Spark and DuckDB agree
    bit-for-bit (no Welford-vs-naive drift, no summation-order drift).
    Users with fewer than ``min_days`` observed days or zero variance are
    never flagged. Only days with ≥1 event exist in the domain (observed-
    days model — a silent day is absence of data, not a zero sample).

    Shuffle profile: repartition(user) → count per (user, day) with no
    second exchange → per-user moment window reuses the partitioning →
    narrow filter. One shuffle end-to-end.
    """
    if min_days < 2:
        raise ValueError(f"min_days must be >= 2: {min_days}")
    daily = (
        df.repartition(F.col(user_col))
        .groupBy(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("date")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("u")
    staged = daily.select(
        "u",
        "date",
        "n_events",
        F.count(F.lit(1)).over(w).cast("long").alias("_n"),
        F.sum("n_events").over(w).cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .over(w)
        .cast("long")
        .alias("_q"),
    )
    num = F.col("_n") * F.col("n_events") - F.col("_s")
    den2 = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    z = F.round(num / F.sqrt(den2.cast("double")), 4)
    return (
        staged.filter(
            (F.col("_n") >= min_days)
            & (den2 > 0)
            & (F.abs(num / F.sqrt(den2.cast("double"))) > z_threshold)
        )
        .select(F.col("u").alias(user_col), "date", "n_events", z.alias("z"))
        .orderBy(user_col, "date")
    )
