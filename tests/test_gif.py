"""GIF codec tests: encoder/decoder roundtrip (the encoder builds
LZW from a byte-string dict, the decoder from prefix/suffix tables —
two independent implementations), a hand-assembled RGB-palette +
transparency + extension fixture whose LZW codes are bit-packed by a
third, local packer, interlace reordering, and fuzz safety."""

from __future__ import annotations

import numpy as np
import pytest

from two_tier_document_parser_spark.gif import (
    decode_gif_gray,
    encode_gif_gray,
    gif_dims,
)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize(
    "shape", [(1, 1), (3, 5), (8, 8), (17, 31), (64, 64), (200, 137), (1, 300)]
)
def test_roundtrip(shape, interlace):
    rng = np.random.default_rng(hash(shape) % 2**31)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_gif_gray(px, interlace=interlace)
    assert gif_dims(data) == (shape[1], shape[0])
    out = decode_gif_gray(data)
    assert out is not None and np.array_equal(out, px)


def test_lzw_long_runs_and_table_reset():
    # low-entropy: long LZW chains; 256x256 random: 4096-entry reset
    px = np.zeros((300, 300), np.uint8)
    px[::3] = 17
    assert np.array_equal(decode_gif_gray(encode_gif_gray(px)), px)
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    assert np.array_equal(decode_gif_gray(encode_gif_gray(px)), px)


def test_gradient_interlace():
    px = (np.add.outer(np.arange(100), np.arange(211)) % 256).astype(np.uint8)
    for il in (False, True):
        assert np.array_equal(decode_gif_gray(encode_gif_gray(px, il)), px)


def _pack_codes(codes_and_widths):
    """Independent LSB-first GIF bit packer for the hand fixture."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_and_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_hand_fixture_rgb_palette_transparency_extensions():
    """2x2 GIF89a, 4-entry RGB palette, GCE transparency on index 3,
    a comment extension before the image, codes hand-derived from the
    spec: clear(4), 0, 1, 2 at 3 bits; 3, eoi(5) at 4 bits."""
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (8, 8, 8)]
    lzw = _pack_codes([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    data = (
        b"GIF89a"
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x91, 0, 0])  # GCT, 4 entries
        + b"".join(bytes(c) for c in palette)
        + bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])  # comment ext
        + bytes([0x21, 0xF9, 4, 0x01, 0, 0, 3, 0])  # GCE: transparent idx 3
        + bytes([0x2C, 0, 0, 0, 0])
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x00])  # no LCT, no interlace
        + bytes([2])  # LZW min code size
        + bytes([len(lzw)]) + lzw + bytes([0])
        + bytes([0x3B])
    )
    assert gif_dims(data) == (2, 2)
    out = decode_gif_gray(data)
    # BT.601 luma: red 76, green 149, blue 29; index 3 transparent -> 255
    assert np.array_equal(out, np.array([[76, 149], [29, 255]], np.uint8))


def test_interlace_row_order():
    """9-row interlaced image: rows arrive in pass order
    0,8 / 4 / 2,6 / 1,3,5,7 and must be reassembled by display row."""
    px = (np.arange(9, dtype=np.uint8)[:, None] * np.ones(4, np.uint8))
    data = encode_gif_gray(px, interlace=True)
    out = decode_gif_gray(data)
    assert np.array_equal(out, px)
    # the non-interlaced encoding of the same pixels differs on the wire
    assert data != encode_gif_gray(px, interlace=False)


def test_garbage_and_truncation_safety():
    assert decode_gif_gray(b"") is None
    assert decode_gif_gray(b"GIF89a") is None
    assert decode_gif_gray(b"NOTGIF" + bytes(100)) is None
    assert gif_dims(b"\x89PNG\r\n\x1a\n") is None
    full = encode_gif_gray(np.full((10, 10), 77, np.uint8))
    for cut in (7, 10, 13, 20, len(full) // 2, len(full) - 2):
        r = decode_gif_gray(full[:cut])
        assert r is None or r.shape == (10, 10)
    # bit-flip fuzz: decoder never raises
    rng = np.random.default_rng(1)
    buf = bytearray(full)
    for _ in range(200):
        i = int(rng.integers(6, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        r = decode_gif_gray(bytes(buf))
        assert r is None or isinstance(r, np.ndarray)
        buf = bytearray(full)
