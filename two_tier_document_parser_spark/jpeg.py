"""Baseline JPEG (SOF0) decoder built from the public ITU-T T.81
spec — no PIL/libjpeg in this sandbox, and the reference's image
crops are overwhelmingly JPEG (accurate/service.py:177 via PyMuPDF).
Round-3 verdict task #4: DCT payloads get real dimensions and real
pixels instead of the hash stub.

Scope (the baseline process, §8 + Annex F):
- SOF0 (baseline sequential huffman), 8-bit samples,
- grayscale (1 component) and YCbCr (3 components) with arbitrary
  sampling factors (4:4:4, 4:2:0, 4:2:2 all fall out of the general
  Hi/Vi handling),
- DQT (8/16-bit), DHT, DRI/RSTn restart intervals, APPn/COM skip.
Progressive (SOF2), arithmetic coding, and 12-bit are out of scope
and return None (callers keep their documented fallback).

Shape of the work: marker/header parse and the entropy decode are a
per-symbol Python loop fed by a 16-bit-peek huffman lookup table
(one dict build per DHT, O(1) per symbol); everything after entropy
decode — dequantization, dezigzag, the 2-D IDCT (orthonormal DCT-II
basis, two einsums over ALL blocks at once), level shift, chroma
upsample, YCbCr->RGB — is vectorized numpy over the whole image.
"""

from __future__ import annotations

import numpy as np

# zigzag order (T.81 Figure A.6): zz[i] = raster index of the i-th
# zigzag-scanned coefficient
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal DCT-II basis: C[k, n] = s_k cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16)


class _Huff:
    """Canonical huffman table with a 16-bit-peek fast path."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], vals: bytes) -> None:
        # canonical code assignment (T.81 Annex C)
        self.lut: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                # index by the code left-aligned in 16 bits; decode
                # peeks 16 bits and probes lengths 1..16
                self.lut[(length << 16) | (code << (16 - length))] = (
                    vals[k], length,
                )
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_Bits") -> int:
        peek = br.peek16()
        lut = self.lut
        for length in range(1, 17):
            mask = ~((1 << (16 - length)) - 1) & 0xFFFF
            hit = lut.get((length << 16) | (peek & mask))
            if hit is not None:
                br.skip(length)
                return hit[0]
        raise ValueError("bad huffman code")


class _Bits:
    """MSB-first bit reader over the UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def peek16(self) -> int:
        while self.n < 16 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        return (self.acc << (16 - self.n)) & 0xFFFF

    def skip(self, k: int) -> None:
        if self.n < k:  # force refill via peek
            self.peek16()
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        v = self.peek16() >> (16 - k)
        self.skip(k)
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed
    value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn header, or None — the
    cheap metadata path (no entropy decode)."""
    if data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            return None
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return (w, h)
            return None
        i += 2 + seglen
    return None


_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
_J2K_SOC_SIZ = b"\xff\x4f\xff\x51"


def jp2_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG-2000 payload header (the honest
    dimension path for JPXDecode streams until a full wavelet decoder
    exists — r04 verdict task #8). Two layouts, both magic-gated so
    arbitrary binaries can never sniff as JP2:

    - JP2 box container (ISO/IEC 15444-1 §I.5): the 12-byte signature
      box, then the jp2h superbox's ihdr box — HEIGHT then WIDTH,
      4 bytes big-endian each (§I.5.3.1, note the order).
    - Raw codestream (§A.5.1): SOC (FF4F) + SIZ (FF51), where the
      image grid is Xsiz/Ysiz minus the XOsiz/YOsiz reference-grid
      offsets.
    """
    if data.startswith(_JP2_SIG):
        i = data.find(b"ihdr")
        if i >= 0 and len(data) >= i + 12:
            h = int.from_bytes(data[i + 4 : i + 8], "big")
            w = int.from_bytes(data[i + 8 : i + 12], "big")
            if w and h:
                return w, h
        return None
    if data.startswith(_J2K_SOC_SIZ) and len(data) >= 24:
        xs = int.from_bytes(data[8:12], "big")
        ys = int.from_bytes(data[12:16], "big")
        xo = int.from_bytes(data[16:20], "big")
        yo = int.from_bytes(data[20:24], "big")
        if xs > xo and ys > yo:
            return xs - xo, ys - yo
    return None


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline JPEG -> uint8 array (h, w) for grayscale or
    (h, w, 3) RGB for YCbCr. None when not a decodable baseline
    file (caller falls back)."""
    try:
        return _decode_jpeg_inner(data)
    except Exception:
        return None


def decode_jpeg_gray(data: bytes) -> np.ndarray | None:
    """decode_jpeg collapsed to one grayscale plane (BT.601 luma for
    color images) — the engine's crop/resize unit."""
    px = decode_jpeg(data)
    if px is None:
        return None
    if px.ndim == 2:
        return px
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def _decode_jpeg_inner(data: bytes) -> np.ndarray | None:
    if data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    i = 2
    n = len(data)
    scan: bytes | None = None
    scan_map: list[tuple[int, int]] = []  # (dc table, ac table) per comp

    while i + 4 <= n and scan is None:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = seg[j + 17 : j + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, vals)
                j += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                return None  # 12-bit out of scope
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                return None
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "q": tq}
                )
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps):
                return None
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    k for k, cc in enumerate(comps) if cc["id"] == cid
                )
                scan_map.append((tt >> 4, tt & 0xF))
                if idx != c:
                    return None  # reordered scan: out of scope
            scan = data[i + 2 + seglen :]
        i += 2 + seglen

    if scan is None or not comps or not w or not h:
        return None

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # un-stuff the entropy segment, splitting at RST markers
    segments: list[bytes] = []
    cur = bytearray()
    j = 0
    sn = len(scan)
    while j < sn:
        b = scan[j]
        if b == 0xFF:
            nxt = scan[j + 1] if j + 1 < sn else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        j += 1
    segments.append(bytes(cur))

    # entropy-decode every block's zigzag coefficients
    nblk = [mcux * mcuy * c["h"] * c["v"] for c in comps]
    coefs = [np.zeros((k, 64), dtype=np.int32) for k in nblk]
    counters = [0] * len(comps)
    pred = [0] * len(comps)
    br = _Bits(segments[0])
    seg_idx = 0
    mcu_count = mcux * mcuy
    for mcu in range(mcu_count):
        if restart and mcu and mcu % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            br = _Bits(segments[seg_idx])
            pred = [0] * len(comps)
        for ci, c in enumerate(comps):
            hdc = huff_dc[scan_map[ci][0]]
            hac = huff_ac[scan_map[ci][1]]
            for _ in range(c["h"] * c["v"]):
                row = coefs[ci][counters[ci]]
                counters[ci] += 1
                s = hdc.decode(br)
                pred[ci] += _extend(br.get(s), s)
                row[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = hac.decode(br)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    row[k] = _extend(br.get(s), s)
                    k += 1

    # vectorized: dequant + dezigzag + IDCT + level shift per plane
    planes: list[np.ndarray] = []
    for ci, c in enumerate(comps):
        q = qt[c["q"]]
        blocks = np.zeros((nblk[ci], 64), dtype=np.float64)
        blocks[:, _ZZ] = coefs[ci] * q[np.newaxis, :]
        blocks = blocks.reshape(-1, 8, 8)
        # 2-D IDCT: C^T @ F @ C over all blocks at once
        spatial = np.einsum(
            "kK,nKL,Ll->nkl", _C.T, blocks, _C, optimize=True
        )
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        # blocks are MCU-ordered: reassemble the component plane
        bw, bh = c["h"], c["v"]
        pw, ph = mcux * bw * 8, mcuy * bh * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        idx = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(bh):
                    for bx in range(bw):
                        y0 = (my * bh + by) * 8
                        x0 = (mx * bw + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[idx]
                        idx += 1
        # crop to this component's true extent, then upsample to full
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
