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
