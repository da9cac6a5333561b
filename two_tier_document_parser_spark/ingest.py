"""Unified raw-bytes ingestion router.

One Arrow kernel turns a (doc_id, payload binary) table into
documents_raw rows, sniffing the container per document BY CONTENT:
%PDF- -> the from-scratch PDF-subset reader (pdf_io), TTDP1 magic ->
the columnar container decoder (binary_io), anything else -> the HTML
DOM lift (html_io). Undecodable payloads become quarantine-shaped
rows (doc_class='', no spans — error channel O19); the kernel never
raises. Content wins over filename, matching api._decode_payload.

Map-only: no shuffle, splits on parquet row groups, composes with
the fused cascade in the same stage — identical plan shape batch or
streaming (both call `sniff_decode_table`; the kernel is stateless).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from .schemas import RAW_SCHEMA


def sniff_decode_doc(payload: bytes) -> dict | None:
    """One payload -> documents_raw row dict (sans doc_id) or None."""
    from . import binary_io, html_io, pdf_io

    p = payload or b""
    if p.startswith(b"%PDF-"):
        return pdf_io.parse_pdf(p)
    if p.startswith(binary_io.MAGIC):
        got = list(
            binary_io.decode_batches(
                iter(
                    [pa.RecordBatch.from_pylist([{"doc_id": "", "payload": p}])]
                )
            )
        )
        row = got[0].to_pylist()[0] if got else None
        return row if row and row["doc_class"] else None
    return html_io.parse_html(p)


def sniff_decode_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    from .schemas import decode_raw_batches

    return decode_raw_batches(batches, sniff_decode_doc)


def sniff_decode_table(bin_df):
    """(doc_id, payload binary) DataFrame (batch OR stream) ->
    documents_raw rows with per-document format sniffing."""
    return bin_df.select("doc_id", "payload").mapInArrow(
        sniff_decode_batches, RAW_SCHEMA
    )
