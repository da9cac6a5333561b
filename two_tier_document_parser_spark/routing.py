"""Tier routing: classify-then-split with a broadcast model.

The reference's tier dispatch is the caller's URL choice
(examples/demo_client.py:25; README.md:303-306). Here it is a
DataFrame-level decision (SURVEY §2.1 O3): structural features are
computed JVM-side with higher-order array functions (no Python), the
per-doc_class threshold model is a tiny DataFrame joined with an
explicit `broadcast()` hint, and the tier is a CASE WHEN — all of
which Catalyst folds into one whole-stage-codegen pass over the scan.

Determinism: tier is a pure function of (doc_class, spans) only
(SURVEY §7.7.2) — never of partition, time, or size-of-cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import (
    MEDIA_KINDS,
    REASON_INVALID,
    ROUTING_DEFAULT,
    ROUTING_MODEL,
    T1_MAX_SPANS,
    T2_MAX_SPANS,
    too_large_reason,
)


def routing_model_df(spark: SparkSession) -> DataFrame:
    rows = [(k, float(bt), int(mt)) for k, (bt, mt) in ROUTING_MODEL.items()]
    return spark.createDataFrame(
        rows, "doc_class string, box_frac_t double, media_t int"
    )


def with_features(df: DataFrame) -> DataFrame:
    """Structural routing features via JVM higher-order functions —
    stays inside codegen, no Arrow hop, no UDF."""
    media = list(MEDIA_KINDS)
    return (
        df.withColumn("n_spans", F.size("spans"))
        .withColumn(
            "n_box",
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("box"))),
        )
        .withColumn(
            "n_media",
            F.size(F.filter("spans", lambda s: s["kind"].isin(media))),
        )
    )


def with_tier(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Attach `tier` and `quarantine_reason`: broadcast-join the
    routing model, apply the rule, drop the helper columns.

    Quarantine classes (reason is '' on valid rows):
    - invalid (null doc_id / no spans / n_pages < 1) — the reference's
      400 semantics (fast/app.py:61-62);
    - oversize for its routed tier — the reference's 413 semantics
      (100 MB fast / 500 MB accurate, fast/app.py:71-73,
      accurate/app.py:125-127), in spans (spec.T1/T2_MAX_SPANS)."""
    model = F.broadcast(routing_model_df(spark))
    bt_def, mt_def = ROUTING_DEFAULT
    invalid = (
        F.col("doc_id").isNull()
        | (F.col("n_spans") == 0)
        | (F.col("n_pages") < 1)
    )
    deep_rule = (
        F.col("n_box") / F.col("n_spans") > F.col("box_frac_t")
    ) | (F.col("n_media") >= F.col("media_t"))
    routed = (
        with_features(df)
        .join(model, "doc_class", "left")
        .withColumn("box_frac_t", F.coalesce("box_frac_t", F.lit(float(bt_def))))
        .withColumn("media_t", F.coalesce("media_t", F.lit(int(mt_def))))
        .withColumn(
            "tier",
            F.when(invalid, F.lit("error"))
            .when(deep_rule & (F.col("n_spans") > T2_MAX_SPANS), F.lit("error"))
            .when(deep_rule, F.lit("deep"))
            .when(F.col("n_spans") > T1_MAX_SPANS, F.lit("error"))
            .otherwise(F.lit("fast")),
        )
        .withColumn(
            "quarantine_reason",
            F.when(invalid, F.lit(REASON_INVALID))
            .when(
                deep_rule & (F.col("n_spans") > T2_MAX_SPANS),
                F.lit(too_large_reason("deep")),
            )
            .when(
                ~deep_rule & (F.col("n_spans") > T1_MAX_SPANS),
                F.lit(too_large_reason("fast")),
            )
            .otherwise(F.lit("")),
        )
    )
    return routed.drop("n_spans", "n_box", "n_media", "box_frac_t", "media_t")
