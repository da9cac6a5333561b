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

# ---------------------------------------------------------------------------
# shared Arrow-side assembly for the raw-bytes decoders (html_io /
# pdf_io / ingest): one place owns the documents_raw batch shape and
# the quarantine row, so the three decoders cannot drift
# ---------------------------------------------------------------------------


def spans_arrow_type():
    import pyarrow as pa

    return pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )


QUARANTINE_ROW = {"doc_class": "", "n_pages": 0, "spans": []}


def decode_raw_batches(batches, decode_fn):
    """(doc_id, payload binary) RecordBatches -> documents_raw
    RecordBatches via `decode_fn(payload) -> row-dict | None`. A None
    result or ANY exception becomes a quarantine-shaped row (error
    channel O19) — the kernel never raises."""
    import pyarrow as pa

    span_t = spans_arrow_type()
    for batch in batches:
        if batch.num_rows == 0:
            continue
        rows = []
        for payload in batch.column("payload").to_pylist():
            try:
                doc = decode_fn(payload)
            except Exception:  # absolute backstop
                doc = None
            rows.append(doc if doc is not None else QUARANTINE_ROW)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pa.array([r["doc_class"] for r in rows], type=pa.string()),
                pa.array([r["n_pages"] for r in rows], type=pa.int32()),
                pa.array([r["spans"] for r in rows], type=span_t),
            ],
            names=["doc_id", "doc_class", "n_pages", "spans"],
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
