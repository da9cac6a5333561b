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
