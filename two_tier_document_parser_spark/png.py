"""Minimal from-scratch PNG codec (pure stdlib: struct + zlib).

The reference's most visible output is the base64 PNG crop on every
ImageData (accurate/service.py:135-139,172-186, via PIL). No imaging
library exists in this sandbox, but PNG itself is a public, simple
container — signature, IHDR, zlib IDAT, IEND, each chunk CRC32'd —
so the engine writes REAL 8-bit grayscale PNGs for its artifact
payloads and reads real dimensions back out of IHDR, replacing the
round-1 hash stub for the image path.

Without rasterized page pixels (SURVEY §2.1 O9: box geometry replaces
pixels by design), the "crop" content is a deterministic procedural
raster seeded by (asset ref, bbox): stable across runs, partitions,
and machines — the same determinism contract as every other output.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
MAX_CROP_SIDE = 64


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 array -> 8-bit grayscale PNG bytes."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # raw scanlines, filter type 0 per row
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from IHDR — a REAL header decode — or None if
    the payload is not a PNG."""
    if len(data) < 24 or data[:8] != PNG_SIG or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def decode_png_gray(data: bytes) -> np.ndarray | None:
    """8-bit grayscale PNG bytes -> (h, w) uint8 array, or None when
    the payload is not such a PNG. Full scanline unfiltering (types
    0-4) so foreign rasters decode, not just this module's own
    filter-0 output."""
    if not isinstance(data, (bytes, bytearray)) or data[:8] != PNG_SIG:
        return None
    i, w, h = 8, None, None
    idat = bytearray()
    n = len(data)
    while i + 8 <= n:
        ln = int.from_bytes(data[i : i + 4], "big")
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            if len(payload) < 10:
                return None
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                return None  # only the engine's grayscale subset
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if not w or not h:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w + 1
    if len(raw) < h * stride:
        return None
    out = np.zeros((h, w), np.uint8)
    prev = np.zeros(w, np.int32)
    for r in range(h):
        ft = raw[r * stride]
        row = np.frombuffer(
            raw[r * stride + 1 : (r + 1) * stride], np.uint8
        ).astype(np.int32)
        if ft == 1:  # Sub: prefix sum (bpp=1)
            row = np.cumsum(row) & 0xFF
        elif ft == 2:  # Up
            row = (row + prev) & 0xFF
        elif ft == 3:  # Average (left depends on current row: loop)
            for j in range(w):
                left = row[j - 1] if j else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(w):
                a = row[j - 1] if j else 0
                b = prev[j]
                c = prev[j - 1] if j else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out[r] = row.astype(np.uint8)
        prev = row
    return out


# default page geometry for bbox -> raster coordinate scaling (the
# writer's MediaBox, pdf_io/render_pdf: 612x792 points)
PAGE_W_PT = 612
PAGE_H_PT = 792


def crop_from_raster(
    raster: bytes, bbox: list[int] | None
) -> bytes | None:
    """Pixel-TRUE crop (reference accurate/service.py:177): slice the
    decoded page raster by the bbox (page points -> raster pixels,
    y-flip from PDF bottom-left origin to image top-left), re-encode
    as PNG. None when the raster doesn't decode or bbox is absent —
    the caller falls back to the procedural artifact_png."""
    if not bbox or len(bbox) != 4:
        return None
    page = decode_png_gray(raster)
    if page is None:
        return None
    ph, pw = page.shape
    x0 = max(0, min(pw - 1, int(bbox[0]) * pw // PAGE_W_PT))
    x1 = max(x0 + 1, min(pw, -(-int(bbox[2]) * pw // PAGE_W_PT)))
    # PDF y grows upward; image rows grow downward
    y_top = max(0, min(ph - 1, (PAGE_H_PT - int(bbox[3])) * ph // PAGE_H_PT))
    y_bot = max(
        y_top + 1, min(ph, -(-(PAGE_H_PT - int(bbox[1])) * ph // PAGE_H_PT))
    )
    return encode_png_gray(np.ascontiguousarray(page[y_top:y_bot, x0:x1]))


def crop_size(bbox: list[int] | None) -> tuple[int, int]:
    """Pixel size of a bbox crop, clamped to [1, MAX_CROP_SIDE] (the
    reference caps crops by page raster scale; we cap by side)."""
    if not bbox or len(bbox) != 4:
        return 16, 16
    w = max(1, min(int(bbox[2]) - int(bbox[0]), MAX_CROP_SIDE))
    h = max(1, min(int(bbox[3]) - int(bbox[1]), MAX_CROP_SIDE))
    return w, h


def render_crop(seed: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w) uint8 raster from a string seed: a
    hash-seeded affine gradient — pure function of (seed, w, h)."""
    d = hashlib.sha256(seed.encode("utf-8")).digest()
    a, b, c = d[0] | 1, d[1] | 1, d[2]
    y, x = np.mgrid[0:h, 0:w]
    return ((x * a + y * b + c) % 251).astype(np.uint8)


def artifact_png(seed: str, bbox: list[int] | None) -> bytes:
    """The engine's 'crop': deterministic PNG for an image artifact."""
    w, h = crop_size(bbox)
    return encode_png_gray(render_crop(seed, w, h))
