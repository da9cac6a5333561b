"""WARC (ISO 28500 / WARC/1.0) web-archive ingestion: the container
format a web-scale extraction pipeline actually reads. The reference
accepts opaque per-document bytes over HTTP (fast/app.py:49-66); at
crawl scale those bytes arrive as WARC files — many gzip members per
file, one record per member, response records wrapping an HTTP
message whose body is the HTML this engine's DOM lift consumes. This
module implements both directions from scratch off the public spec:

    write_warc(records)  -> one WARC file blob: per record a header
                            block (WARC/1.0 + named headers +
                            Content-Length), CRLF framing, the HTTP
                            response envelope, each record its OWN
                            gzip member (the Common-Crawl layout —
                            members are independently decompressible,
                            which is what makes the format splittable
                            at member boundaries).
    parse_warc(blob)     -> [(doc_id, html_payload_bytes)] — walks
                            gzip members via zlib's unused_data
                            boundary detection, parses WARC headers,
                            honors Content-Length exactly, keeps only
                            WARC-Type: response records (warcinfo /
                            request records are framing, not
                            documents), recovers doc_id from the
                            WARC-Target-URI path, splits the HTTP
                            envelope at the first blank line.

Determinism: WARC-Date is a fixed constant and gzip members are
written with mtime=0, so the same records always produce the same
file bytes — required by the engine-wide replay/idempotence rule.

Scale shape: packing is mapInArrow per Arrow batch (map-only — at
crawl scale the writer is the sink side of the extraction job, one
file per task); parsing is mapInArrow over (file_id, data) rows where
the per-RECORD Python loop mirrors binary_io's per-document header
loop — gzip inflation and header splits only; the data-sized HTML
payload goes straight into the existing vectorized DOM lift
(html_io.parse_batches) untouched. A malformed member stops that
FILE's remaining members (framing is sequential within a file) but
never throws — prior records are kept, matching the O19 error-channel
contract.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pyarrow as pa

CRLF = b"\r\n"
WARC_DATE = "2026-01-01T00:00:00Z"  # fixed: determinism over realism
_URI_PREFIX = "https://corpus.example/doc/"


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no name, level 6)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    # header written by zlib carries mtime=0 already (it never embeds
    # wall-clock; Python's gzip module does, which is why we use zlib)
    return co.compress(data) + co.flush()


def _record(warc_type: str, headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + warc_type.encode())
    for k, v in headers:
        head.append(f"{k}: {v}".encode())
    head.append(b"Content-Length: " + str(len(body)).encode())
    return CRLF.join(head) + CRLF + CRLF + body + CRLF + CRLF


def write_warc(
    records: list[tuple[str, bytes]], compress: bool = True
) -> bytes:
    """[(doc_id, html_bytes)] -> WARC file bytes — gzip-per-record by
    default (the Common-Crawl layout) or a plain .warc stream with
    compress=False (also legal per ISO 28500). Leads with a warcinfo
    record (the standard file preamble) so readers are exercised on
    skipping non-response types."""
    info_body = (
        b"software: two_tier_document_parser_spark\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    member = _gzip_member if compress else (lambda b: b)
    out = [
        member(
            _record(
                "warcinfo",
                [
                    ("WARC-Date", WARC_DATE),
                    ("Content-Type", "application/warc-fields"),
                ],
                info_body,
            )
        )
    ]
    for doc_id, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: "
            + str(len(html)).encode()
            + CRLF
            + CRLF
            + html
        )
        out.append(
            member(
                _record(
                    "response",
                    [
                        ("WARC-Target-URI", _URI_PREFIX + doc_id),
                        ("WARC-Date", WARC_DATE),
                        (
                            "Content-Type",
                            "application/http; msgtype=response",
                        ),
                    ],
                    http,
                )
            )
        )
    return b"".join(out)


def _members(blob: bytes) -> Iterator[bytes]:
    """Yield one decompressed record-block per gzip member; for a
    PLAIN (uncompressed) .warc file — also legal per ISO 28500 and
    advertised by the job CLI — yield the whole stream once and let
    the record walker consume records sequentially by Content-Length
    framing. Stops at the first malformed member (sequential framing
    — bytes after a corrupt member cannot be re-synchronized
    reliably)."""
    if blob.startswith(b"WARC/"):
        yield blob
        return
    rest = blob
    while rest:
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            data = do.decompress(rest)
            data += do.flush()
        except zlib.error:
            return
        if not do.eof:  # truncated trailing member
            return
        yield data
        rest = do.unused_data


def _parse_record(
    data: bytes, pos: int = 0
) -> tuple[str, str, bytes, int] | None:
    """One record starting at `pos` -> (warc_type, target_uri, block,
    next_pos) or None if malformed. next_pos sits past the record's
    trailing CRLF CRLF, so concatenated records (a plain .warc
    stream, or several records in one gzip member) walk by
    Content-Length framing."""
    sep = data.find(CRLF + CRLF, pos)
    if sep < 0 or not data.startswith(b"WARC/", pos):
        return None
    headers: dict[str, str] = {}
    for line in data[pos:sep].split(CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "utf-8", "replace"
        )
    try:
        n = int(headers.get("content-length", ""))
    except ValueError:
        return None
    block = data[sep + 4 : sep + 4 + n]
    if len(block) != n:
        return None
    end = sep + 4 + n
    if data.startswith(CRLF + CRLF, end):
        end += 4
    return (
        headers.get("warc-type", ""),
        headers.get("warc-target-uri", ""),
        block,
        end,
    )


def parse_warc(blob: bytes) -> list[tuple[str, bytes]]:
    """WARC file bytes (gzip-per-record OR plain stream) ->
    [(doc_id, html_payload)] from response records;
    warcinfo/request/metadata records are skipped."""
    out: list[tuple[str, bytes]] = []
    for member in _members(blob):
        pos = 0
        while pos < len(member):
            rec = _parse_record(member, pos)
            if rec is None:
                return out  # malformed: keep prior records only
            warc_type, uri, block, pos = rec
            if warc_type != "response" or not uri.startswith(
                _URI_PREFIX
            ):
                continue
            http_sep = block.find(CRLF + CRLF)
            if http_sep < 0 or not block.startswith(b"HTTP/"):
                continue
            out.append(
                (uri[len(_URI_PREFIX) :], block[http_sep + 4 :])
            )
    return out


# ------------------------------------------------------------ Spark


def pack_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """(doc_id, payload html binary) -> (file_id, data binary): one
    WARC file per Arrow batch (at scale: one file per task output —
    the crawl-archive write granularity)."""
    for batch in batches:
        if batch.num_rows == 0:
            continue
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        blob = write_warc(list(zip(ids, payloads)))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([f"warc-{min(ids)}"], type=pa.string()),
                pa.array([blob], type=pa.binary()),
            ],
            names=["file_id", "data"],
        )


def unpack_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """(file_id, data binary) -> (doc_id, payload binary) response
    rows, ready for html_io.parse_table."""
    for batch in batches:
        ids: list[str] = []
        payloads: list[bytes] = []
        for blob in batch.column("data").to_pylist():
            for doc_id, html in parse_warc(blob):
                ids.append(doc_id)
                payloads.append(html)
        if ids:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["doc_id", "payload"],
            )


def pack_table(bin_df):
    """(doc_id, payload) HTML rows -> (file_id, data) WARC files."""
    return bin_df.select("doc_id", "payload").mapInArrow(
        pack_batches, "file_id string, data binary"
    )


def unpack_table(warc_df):
    """(file_id, data) WARC files -> (doc_id, payload) HTML rows."""
    return warc_df.select("file_id", "data").mapInArrow(
        unpack_batches, "doc_id string, payload binary"
    )
