"""VP8L (lossless WebP) decoder tests against a local, independent
test-side encoder: literal streams through normal code-length-coded
prefix trees, simple trees, LZ77 backrefs (close-neighborhood map
head AND plain >120 distance codes), the color cache, all four
transforms (predictor modes incl. Select/ClampAddSubtract,
cross-color with signed 3.5 deltas, subtract-green, color-indexing
at every packing width with a transparent palette entry), meta-prefix
group selection, VP8X containers, lossy-VP8 dimension sniffing, and
fuzz safety."""

from __future__ import annotations

import numpy as np
import pytest

from two_tier_document_parser_spark.webp import (
    _DIST_MAP,
    decode_webp_gray,
    webp_dims,
)


class _W:
    """LSB-first bit writer; prefix codes emitted MSB-first."""

    def __init__(self):
        self.bits = []

    def b(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def mb(self, code, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                v |= bit << j
            out.append(v)
        return bytes(out)


def _simple1(w, sym):
    w.b(1, 1)
    w.b(0, 1)
    if sym <= 1:
        w.b(0, 1)
        w.b(sym, 1)
    else:
        w.b(1, 1)
        w.b(sym, 8)


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _cl_header(w, present):
    w.b(0, 1)
    w.b(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        w.b(present.get(s, 0), 3)
    w.b(0, 1)  # no max_symbol


def _cl_codes(present):
    used = sorted((ln, s) for s, ln in present.items() if ln)
    code, prev = 0, used[0][0]
    out = {}
    for ln, s in used:
        code <<= ln - prev
        prev = ln
        out[s] = (code, ln)
        code += 1
    return out


def _uniform_green(w, cache_syms=0, length_syms=0):
    if not cache_syms and not length_syms:
        present = {0: 1, 8: 1}
        _cl_header(w, present)
        c = _cl_codes(present)
        for _ in range(256):
            w.mb(*c[8])
        for _ in range(24):
            w.mb(*c[0])
        return
    if length_syms:
        assert length_syms == 4
        present = {0: 1, 3: 2, 9: 2}
        _cl_header(w, present)
        c = _cl_codes(present)
        for _ in range(256):
            w.mb(*c[9])
        for _ in range(4):
            w.mb(*c[3])
        for _ in range(20):
            w.mb(*c[0])
        return
    assert cache_syms == 16
    present = {0: 1, 5: 2, 9: 2}
    _cl_header(w, present)
    c = _cl_codes(present)
    for _ in range(256):
        w.mb(*c[9])
    for _ in range(24):
        w.mb(*c[0])
    for _ in range(16):
        w.mb(*c[5])


def _uniform256(w):
    present = {0: 1, 8: 1}
    _cl_header(w, present)
    c = _cl_codes(present)
    for _ in range(256):
        w.mb(*c[8])


def _riff(body):
    if len(body) % 2:
        body += b"\x00"
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _header(w, width, height):
    w.b(0x2F, 8)
    w.b(width - 1, 14)
    w.b(height - 1, 14)
    w.b(0, 1)
    w.b(0, 3)


def encode_plain(argb):
    h, wd = argb.shape[:2]
    w = _W()
    _header(w, wd, h)
    w.b(0, 1)  # no transforms
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    _simple1(w, 0)
    for y in range(h):
        for x in range(wd):
            a, r, g, b = (int(v) for v in argb[y, x])
            w.mb(g, 8)
            w.mb(r, 8)
            w.mb(b, 8)
            assert a == 255
    return _riff(w.bytes())


def encode_backref(argb, length_runs):
    h, wd = argb.shape[:2]
    w = _W()
    _header(w, wd, h)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _uniform_green(w, length_syms=4)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    w.b(1, 1)  # distance tree: simple, 2 symbols (0 and 13)
    w.b(1, 1)
    w.b(1, 1)
    w.b(0, 8)
    w.b(13, 8)
    runs = {p: (l, d) for p, l, d in length_runs}
    pos, n = 0, h * wd
    flat = argb.reshape(n, 4)
    while pos < n:
        if pos in runs:
            length, d = runs[pos]
            w.mb(length - 1, 3)  # length code 256+l-1: canonical 3-bit
            if d == wd:
                w.mb(0, 1)  # symbol 0 -> dcode 1 -> (0,1) -> dist=w
            else:
                dcode = d + 120
                assert 97 <= dcode <= 128  # symbol 13 + 5 extra bits
                w.mb(1, 1)
                w.b(dcode - 97, 5)
            pos += length
        else:
            a, r, g, b = (int(v) for v in flat[pos])
            w.mb(0x100 | g, 9)
            w.mb(r, 8)
            w.mb(b, 8)
            pos += 1
    return _riff(w.bytes())


def encode_cache(argb, refs):
    h, wd = argb.shape[:2]
    w = _W()
    _header(w, wd, h)
    w.b(0, 1)
    w.b(1, 1)
    w.b(4, 4)  # cache_bits=4
    w.b(0, 1)
    _uniform_green(w, cache_syms=16)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    _simple1(w, 0)
    n = h * wd
    flat = argb.reshape(n, 4)
    cache = [None] * 16
    for pos in range(n):
        a, r, g, b = (int(v) for v in flat[pos])
        px = (a << 24) | (r << 16) | (g << 8) | b
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 28
        if pos in refs:
            assert cache[idx] == px, "fixture bug: pixel not in cache"
            w.mb(idx, 5)
        else:
            w.mb(0x100 | g, 9)
            w.mb(r, 8)
            w.mb(b, 8)
        cache[idx] = px
    return _riff(w.bytes())


def encode_subtract_green(argb):
    h, wd = argb.shape[:2]
    w = _W()
    _header(w, wd, h)
    w.b(1, 1)
    w.b(2, 2)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    _simple1(w, 0)
    for y in range(h):
        for x in range(wd):
            a, r, g, b = (int(v) for v in argb[y, x])
            w.mb(g, 8)
            w.mb((r - g) & 255, 8)
            w.mb((b - g) & 255, 8)
    return _riff(w.bytes())


def _pred_residuals(argb, mode, sb):
    h, wd = argb.shape[:2]
    res = np.zeros_like(argb)

    def px(y, x):
        return argb[y, x].astype(np.int64)

    def avg2(a, b):
        return (a + b) >> 1

    for y in range(h):
        for x in range(wd):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                L, T, TL = px(y, x - 1), px(y - 1, x), px(y - 1, x - 1)
                TR = px(y, 0) if x == wd - 1 else px(y - 1, x + 1)
                if mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pred = (
                        L
                        if int(np.abs(p - L).sum()) < int(np.abs(p - T).sum())
                        else T
                    )
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    a2 = avg2(L, T)
                    d = a2 - TL
                    pred = np.clip(a2 + np.sign(d) * (np.abs(d) >> 1), 0, 255)
                else:
                    raise ValueError(mode)
            res[y, x] = (argb[y, x] - pred) & 255
    return res


def encode_predictor(argb, mode, sb=2):
    h, wd = argb.shape[:2]
    w = _W()
    _header(w, wd, h)
    w.b(1, 1)
    w.b(0, 2)
    w.b(sb - 2, 3)
    w.b(0, 1)  # block image: no cache
    _simple1(w, mode)  # green = predictor id, zero bits per block px
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 255)
    _simple1(w, 0)
    w.b(0, 1)  # end transforms
    w.b(0, 1)
    w.b(0, 1)
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 0)  # alpha residual is always 0 here
    _simple1(w, 0)
    res = _pred_residuals(argb, mode, sb)
    for y in range(h):
        for x in range(wd):
            a, r, g, b = (int(v) for v in res[y, x])
            assert a == 0
            w.mb(g, 8)
            w.mb(r, 8)
            w.mb(b, 8)
    return _riff(w.bytes())


def encode_palette(idx, palette, wb):
    h, wd = idx.shape
    w = _W()
    _header(w, wd, h)
    w.b(1, 1)
    w.b(3, 2)
    w.b(len(palette) - 1, 8)
    w.b(0, 1)  # palette subimage: no cache
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _uniform256(w)  # delta-coded alpha varies
    _simple1(w, 0)
    prev = (0, 0, 0, 0)
    for (a, r, g, b) in palette:
        da = (a - prev[0]) & 255
        dr = (r - prev[1]) & 255
        dg = (g - prev[2]) & 255
        db = (b - prev[3]) & 255
        w.mb(dg, 8)
        w.mb(dr, 8)
        w.mb(db, 8)
        w.mb(da, 8)
        prev = (a, r, g, b)
    w.b(0, 1)  # end transforms
    w.b(0, 1)
    w.b(0, 1)
    per = 1 << wb
    bits = 8 >> wb
    pw = (wd + per - 1) >> wb if wb else wd
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    _simple1(w, 0)
    for y in range(h):
        for xx in range(pw):
            packed = 0
            for k in range(per):
                x = (xx << wb) + k
                if x < wd:
                    packed |= int(idx[y, x]) << (k * bits)
            w.mb(packed, 8)
            w.mb(0, 8)
            w.mb(0, 8)
    return _riff(w.bytes())


def encode_cross_color(argb, g2r, g2b, r2b, sb=3):
    h, wd = argb.shape[:2]

    def delta(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5

    w = _W()
    _header(w, wd, h)
    w.b(1, 1)
    w.b(1, 2)
    w.b(sb - 2, 3)
    w.b(0, 1)
    _simple1(w, g2b)  # green channel of the transform element
    _simple1(w, r2b)  # red channel
    _simple1(w, g2r)  # blue channel
    _simple1(w, 255)
    _simple1(w, 0)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _uniform_green(w)
    _uniform256(w)
    _uniform256(w)
    _simple1(w, 255)
    _simple1(w, 0)
    for y in range(h):
        for x in range(wd):
            a, r, g, b = (int(v) for v in argb[y, x])
            rr = (r - delta(g2r, g)) & 255
            bb = (b - delta(g2b, g) - delta(r2b, r)) & 255
            w.mb(g, 8)
            w.mb(rr, 8)
            w.mb(bb, 8)
    return _riff(w.bytes())


def encode_meta(argb, meta_bits=2):
    h, wd = argb.shape[:2]
    bs = 1 << meta_bits
    mw = (wd + bs - 1) >> meta_bits
    mh = (h + bs - 1) >> meta_bits
    w = _W()
    _header(w, wd, h)
    w.b(0, 1)
    w.b(0, 1)
    w.b(1, 1)  # meta-prefix present
    w.b(meta_bits - 2, 3)
    w.b(0, 1)  # entropy image: no cache
    w.b(1, 1)  # green: simple 2-symbol {0,1}
    w.b(1, 1)
    w.b(0, 1)
    w.b(0, 1)
    w.b(1, 8)
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 255)
    _simple1(w, 0)
    for by in range(mh):
        for bx in range(mw):
            w.mb((bx + by) % 2, 1)
    for gid in (0, 1):
        _uniform_green(w)
        _uniform256(w)
        _uniform256(w)
        _simple1(w, 255 if gid == 0 else 254)
        _simple1(w, 0)
    for y in range(h):
        for x in range(wd):
            a, r, g, b = (int(v) for v in argb[y, x])
            w.mb(g, 8)
            w.mb(r, 8)
            w.mb(b, 8)
    return _riff(w.bytes())


def _riff_vp8x(body_vp8l, w, h):
    vp8x = bytes(4) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")

    def chunk(tag, b):
        if len(b) % 2:
            b += b"\x00"
        return tag + len(b).to_bytes(4, "little") + b

    payload = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"VP8L", body_vp8l)
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def _gray_exp(argb):
    g = (
        299 * argb[..., 1].astype(np.int64)
        + 587 * argb[..., 2]
        + 114 * argb[..., 3]
    ) // 1000
    a = argb[..., 0].astype(np.int64)
    return ((a * g + (255 - a) * 255 + 127) // 255).astype(np.uint8)


def _rand_argb(rng, h, w, alpha=255):
    argb = np.zeros((h, w, 4), np.int64)
    argb[..., 0] = alpha
    argb[..., 1:] = rng.integers(0, 256, (h, w, 3))
    return argb


def test_distance_map_head():
    """The spec's close-neighborhood map starts (0,1),(1,0),(1,1),
    (-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1) and has 120 rows."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:10] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    ]
    assert all(-8 <= x <= 8 and 0 <= y <= 8 for x, y in _DIST_MAP)


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (16, 16), (21, 13)])
def test_plain_literals(shape):
    rng = np.random.default_rng(sum(shape))
    argb = _rand_argb(rng, *shape)
    data = encode_plain(argb)
    assert webp_dims(data) == (shape[1], shape[0])
    assert np.array_equal(decode_webp_gray(data), _gray_exp(argb))


def test_backref_map_and_plain_distance():
    rng = np.random.default_rng(5)
    argb = _rand_argb(rng, 3, 4)
    argb[1] = argb[0]
    argb[2] = argb[1]
    out = decode_webp_gray(encode_backref(argb, [(4, 4, 4), (8, 4, 4)]))
    assert np.array_equal(out, _gray_exp(argb))
    argb2 = _rand_argb(rng, 1, 8)
    argb2[0, 5:8] = argb2[0, 2:5]
    out = decode_webp_gray(encode_backref(argb2, [(5, 3, 3)]))
    assert np.array_equal(out, _gray_exp(argb2))


def test_color_cache():
    rng = np.random.default_rng(6)
    argb = _rand_argb(rng, 2, 6)
    argb[1] = argb[0][::-1]
    refs = set()
    cache = [None] * 16
    flat = argb.reshape(-1, 4)
    for pos in range(12):
        a, r, g, b = (int(v) for v in flat[pos])
        px = (a << 24) | (r << 16) | (g << 8) | b
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 28
        if pos >= 6 and cache[idx] == px:
            refs.add(pos)
        cache[idx] = px
    assert refs, "fixture must exercise at least one cache hit"
    out = decode_webp_gray(encode_cache(argb, refs))
    assert np.array_equal(out, _gray_exp(argb))


def test_subtract_green():
    rng = np.random.default_rng(7)
    argb = _rand_argb(rng, 5, 5)
    out = decode_webp_gray(encode_subtract_green(argb))
    assert np.array_equal(out, _gray_exp(argb))


@pytest.mark.parametrize("mode", list(range(1, 14)))
def test_predictor_modes(mode):
    rng = np.random.default_rng(mode)
    argb = _rand_argb(rng, 9, 11)
    out = decode_webp_gray(encode_predictor(argb, mode, sb=2))
    assert np.array_equal(out, _gray_exp(argb))


@pytest.mark.parametrize("n,wb", [(2, 3), (4, 2), (16, 1), (200, 0)])
def test_palette_packing_widths(n, wb):
    rng = np.random.default_rng(n)
    pal = [(255, int(r), int(g), int(b)) for r, g, b in rng.integers(0, 256, (n, 3))]
    idx = rng.integers(0, n, (7, 13))
    out = decode_webp_gray(encode_palette(idx, pal, wb))
    exp = np.array(
        [
            [(299 * pal[i][1] + 587 * pal[i][2] + 114 * pal[i][3]) // 1000 for i in row]
            for row in idx
        ],
        np.uint8,
    )
    assert np.array_equal(out, exp)


def test_palette_transparent_entry():
    pal = [(255, 10, 20, 30), (0, 1, 2, 3)]
    idx = np.array([[0, 1], [1, 0]])
    out = decode_webp_gray(encode_palette(idx, pal, 3))
    l0 = (299 * 10 + 587 * 20 + 114 * 30) // 1000
    assert np.array_equal(out, np.array([[l0, 255], [255, l0]], np.uint8))


@pytest.mark.parametrize("cte", [(0, 0, 0), (34, 200, 7), (255, 1, 128)])
def test_cross_color(cte):
    rng = np.random.default_rng(sum(cte))
    argb = _rand_argb(rng, 6, 10)
    out = decode_webp_gray(encode_cross_color(argb, *cte))
    assert np.array_equal(out, _gray_exp(argb))


def test_meta_prefix_groups():
    rng = np.random.default_rng(9)
    argb = np.zeros((9, 9, 4), np.int64)
    argb[..., 1:] = rng.integers(0, 256, (9, 9, 3))
    for y in range(9):
        for x in range(9):
            argb[y, x, 0] = 255 if ((x >> 2) + (y >> 2)) % 2 == 0 else 254
    out = decode_webp_gray(encode_meta(argb, meta_bits=2))
    assert np.array_equal(out, _gray_exp(argb))


def test_vp8x_container_and_vp8_sniff():
    rng = np.random.default_rng(10)
    argb = _rand_argb(rng, 4, 5)
    plain = encode_plain(argb)
    body = plain[20:]  # strip RIFF(12) + VP8L tag/len(8)
    x = _riff_vp8x(body, 5, 4)
    assert webp_dims(x) == (5, 4)
    assert np.array_equal(decode_webp_gray(x), _gray_exp(argb))
    vp8 = (
        b"RIFF" + (30).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (12).to_bytes(4, "little")
        + bytes(3) + b"\x9d\x01\x2a"
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little") + bytes(2)
    )
    assert webp_dims(vp8) == (320, 240)
    assert decode_webp_gray(vp8) is None  # lossy: honest fallback


def test_garbage_safety():
    assert decode_webp_gray(b"") is None
    assert decode_webp_gray(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert webp_dims(b"GIF89a" + bytes(20)) is None
    rng = np.random.default_rng(11)
    full = encode_plain(_rand_argb(rng, 6, 6))
    for cut in (13, 21, len(full) // 2, len(full) - 2):
        r = decode_webp_gray(full[:cut])
        assert r is None or isinstance(r, np.ndarray)
    buf = bytearray(full)
    for _ in range(200):
        i = int(rng.integers(12, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        r = decode_webp_gray(bytes(buf))
        assert r is None or isinstance(r, np.ndarray)
        buf = bytearray(full)


def test_package_encoder_roundtrip():
    """The in-package minimal encoder (synth payloads) roundtrips
    through the decoder bit-exactly."""
    from two_tier_document_parser_spark.webp import encode_webp_gray

    rng = np.random.default_rng(12)
    for shape in [(1, 1), (8, 8), (33, 21), (100, 3)]:
        px = rng.integers(0, 256, shape, np.uint8)
        d = encode_webp_gray(px)
        assert webp_dims(d) == (shape[1], shape[0])
        assert np.array_equal(decode_webp_gray(d), px)
