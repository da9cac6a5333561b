"""Event-stream relational operators (sessionization + time rollups).

The reference has no event/telemetry surface — these are the
training-pipeline companions the engine needs at corpus scale
(request logs, crawl telemetry): gap-based sessionization and
tumbling-window rollups, both pure DataFrame (whole-stage codegen,
one shuffle on the grouping key each).

Invariant hygiene: everything that crosses the DuckDB comparison is
integer (epoch seconds, counts, x1000-scaled floor of min/max) —
double summation never crosses the gate.

Scale notes: sessionize shuffles once on user_id and runs two window
passes over each partition; at 100 TB the input should be
bucketed/partitioned by user_id so the shuffle is map-side-free.
Skewed users (bots with 10^8 events) are the hazard — cap per-user
event counts upstream or range-split users by (user_id, day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 30 * 60


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds `gap_s`. Deterministic order via
    (ts, event_id) tie-break; epoch math at whole-second resolution so
    the SQL oracle reproduces it exactly.

    Returns (user_id, session_idx, n_events, start_epoch, end_epoch).
    """
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch"),
    )
    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("epoch") - F.lag("epoch").over(w) > F.lit(gap_s), 1
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("epoch").alias("start_epoch"),
        F.max("epoch").alias("end_epoch"),
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event_type: counts plus exact
    integer-scaled min/max of `value` (min/max of doubles are exact
    set elements — unlike sums they cannot drift across engines)."""
    return (
        events.withColumn(
            "hour_epoch", F.floor(F.unix_timestamp("ts") / F.lit(3600))
        )
        .groupBy("event_type", "hour_epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.min("value") * 1000).cast("long").alias("min_v_x1000"),
            F.floor(F.max("value") * 1000).cast("long").alias("max_v_x1000"),
        )
    )


def asof_join(
    events: DataFrame, left_type: str = "error", right_type: str = "click"
) -> DataFrame:
    """As-of join: for each `left_type` event, the most recent
    `right_type` event of the same user at-or-before it (whole-second
    epoch resolution, like sessionize).

    Scale shape: NOT a range join. Both sides union into one frame,
    shuffle ONCE on user_id, and a single window pass carries the last
    right-event forward (`last(..., ignorenulls)`), so cost is
    O(n log n) per user partition with zero candidate blow-up — the
    per-key merge a dedicated as-of operator would do, expressed as a
    window. At equal epoch the right event sorts first so the boundary
    is inclusive (ts_right <= ts_left); ties broken by event_id.

    Returns (event_id, user_id, epoch, match_id, match_epoch);
    match columns are null when no prior right event exists.
    """
    ev = events.filter(F.col("event_type").isin(left_type, right_type)).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch"),
        "event_type",
    )
    is_right = F.col("event_type") == right_type
    # `side` is materialized once (not re-derived per window column) so
    # both last() aggregates share one Sort + one Window node
    tagged = (
        ev.withColumn("r_epoch", F.when(is_right, F.col("epoch")))
        .withColumn("r_id", F.when(is_right, F.col("event_id")))
        .withColumn("side", F.when(is_right, 0).otherwise(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "epoch",
            "event_type",
            F.last("r_id", ignorenulls=True).over(w).alias("match_id"),
            F.last("r_epoch", ignorenulls=True).over(w).alias("match_epoch"),
        )
        .filter(F.col("event_type") == left_type)
        .select("event_id", "user_id", "epoch", "match_id", "match_epoch")
    )


def interval_join(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "view",
    radius_s: int = 300,
) -> DataFrame:
    """Banded interval join: all (left, right) same-user event pairs
    with |t_left - t_right| <= radius_s.

    Scale shape: a time-bucket equi-join, never an unbounded
    range-condition join (which Spark plans as a per-key cross join).
    The right side keys on bucket = floor(epoch / radius); the left
    side explodes to its 3 candidate buckets {b-1, b, b+1}; the join
    is a plain hash equi-join on (user_id, bucket) and the exact
    radius predicate filters the survivors. Each true pair matches
    exactly once (the right event has one bucket), so no dedup pass.
    Candidate blow-up is bounded at 3x the left side regardless of
    radius or data volume.

    Returns (a_id, b_id, user_id, delta_s) with
    delta_s = epoch_right - epoch_left (signed).
    """
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch"),
        "event_type",
    )
    bkt = F.floor(F.col("epoch") / F.lit(radius_s))
    left = (
        ev.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("a_id"),
            F.col("epoch").alias("a_epoch"),
            F.explode(
                F.array(bkt - 1, bkt, bkt + 1)
            ).alias("bucket"),
        )
    )
    right = ev.filter(F.col("event_type") == right_type).select(
        F.col("user_id"),
        F.col("event_id").alias("b_id"),
        F.col("epoch").alias("b_epoch"),
        bkt.alias("bucket"),
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .filter(
            F.abs(F.col("b_epoch") - F.col("a_epoch")) <= F.lit(radius_s)
        )
        .select(
            "a_id",
            "b_id",
            "user_id",
            (F.col("b_epoch") - F.col("a_epoch")).alias("delta_s"),
        )
    )


def props_rollup(events: DataFrame, field: str = "k") -> DataFrame:
    """Semi-structured extraction: events carry a JSON `props` string
    (the universal event-pipeline pattern); parse it with an explicit
    schema via `from_json` — JVM-side, whole-stage-codegen'd, one
    parse per row for ALL fields (never per-field get_json_object
    re-parses, never a Python UDF) — and roll the extracted integer
    up per event_type.

    Malformed JSON and missing keys parse to null (from_json never
    throws — the error-channel contract), surfaced via the
    n_events/n_with_k gap so silent schema drift is visible in the
    rollup rather than swallowed.

    Scale: parse is map-side in the scan stage; the rollup is one
    key-hashed exchange with map-side partials. Returns
    (event_type, n_events, n_with_k, sum_k, min_k, max_k).
    """
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), f"{field} INT")
        .getField(field)
        .alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def funnel_counts(
    events: DataFrame, steps: tuple[str, ...] = ("signup", "view", "purchase")
) -> DataFrame:
    """Ordered funnel analysis — the sequential-pattern staple: how
    many users completed step 1, then step 2 AFTER their first step 1,
    then step 3 after that, etc. (each step's anchor is the EARLIEST
    qualifying occurrence, the standard funnel definition; equal
    timestamps count as completing — inclusive boundary like
    asof_join).

    Plan: one filtered per-user min-aggregate per step, each joined to
    the survivors of the previous step — k key-hashed joins whose
    right side only SHRINKS (survivors), so later stages broadcast as
    the funnel narrows; no window pass, no per-user event-list
    collection. Integer epochs end-to-end. Returns
    (step int, step_name, n_users) with one row per step.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("epoch"),
    )
    out_rows = []
    survivors = None
    for i, step in enumerate(steps):
        cur = ev.filter(F.col("event_type") == step)
        if survivors is not None:
            cur = cur.join(survivors, "user_id").filter(
                F.col("epoch") >= F.col("_prev_t")
            )
        survivors = cur.groupBy("user_id").agg(
            F.min("epoch").alias("_t")
        ).select("user_id", F.col("_t").alias("_prev_t"))
        out_rows.append(
            # global agg (no groupBy): an empty survivor set still
            # yields ONE row with n_users = 0, like the oracle's count
            survivors.agg(
                F.count(F.lit(1)).cast("long").alias("n_users")
            ).select(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    result = out_rows[0]
    for df in out_rows[1:]:
        result = result.unionByName(df)
    return result


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention cohorts — the classic activation/retention
    matrix a product-analytics pipeline derives from the event log:
    each user's cohort is their first active epoch-week
    (floor(unix_ts / 604800) — pure integer bucketing, no calendar
    semantics to diverge across engines), and each (cohort_week,
    week_offset) cell counts the distinct users of that cohort active
    `week_offset` weeks later.

    Two data-sized exchanges: the (user, week) dedup (map-side
    partials collapse each user's event stream to its active weeks)
    and the per-user cohort window; the final cell aggregate's
    distinct expands on (cohort, offset, user) rows already reduced
    to active-weeks size. Columns: cohort_week, week_offset,
    n_users.
    """
    from pyspark.sql import Window

    e = events.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(604800))
        .cast("long")
        .alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id")
    c = e.withColumn("cohort_week", F.min("week").over(w))
    return (
        c.groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
        .select(
            "cohort_week",
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )
