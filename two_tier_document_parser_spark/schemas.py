"""Canonical Spark schemas (FIXTURES.md §§1-3, SURVEY.md §1.2).

The engine is schema-first end-to-end: the reference's schemaless
middle_json dicts (accurate/service.py:119-123) are replaced by fixed
StructTypes enforced at every mapInPandas boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SPAN_IN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

RAW_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("doc_class", StringType(), False),
        StructField("n_pages", IntegerType(), False),
        StructField("spans", ArrayType(SPAN_IN, False), False),
    ]
)

SPAN_OUT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("order", IntegerType(), False),
        # [x0, y0, x1, y1] in integer layout-grid units, [] when the
        # span has no geometry (tier-1 output, regions without boxes).
        # Reference parity: every ImageData/TableData/FormulaData
        # carries bbox (accurate/models.py:8-29, populated at
        # accurate/service.py:177-216); ints (not floats) keep the
        # bbox OUT of the float-free equality invariant while still
        # being exact (SURVEY §7.7.4).
        StructField("bbox", ArrayType(IntegerType(), False), False),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tier", StringType(), False),
        StructField("pages", IntegerType(), False),
        StructField("spans", ArrayType(SPAN_OUT, False), False),
        StructField("markdown", StringType(), False),
        StructField("n_images", IntegerType(), False),
        StructField("n_tables", IntegerType(), False),
        StructField("n_formulas", IntegerType(), False),
        StructField("skipped_pages", ArrayType(IntegerType(), False), False),
        StructField("processing_time_ms", LongType(), False),
        StructField("error", StringType(), False),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("doc_id_min", StringType(), True),
        StructField("doc_id_max", StringType(), True),
        StructField("n_docs", LongType(), False),
        StructField("n_spans", LongType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)
