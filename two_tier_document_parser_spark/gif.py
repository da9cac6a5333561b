"""GIF (GIF87a/GIF89a) decoder + minimal encoder — the palette-LZW
web-image leg of the codec suite. Reference crops real pixels for
every embedded image via PyMuPDF (accurate/service.py:177); this is
the from-scratch equivalent for GIF payloads, like jpeg.py / png.py /
ccitt.py / jbig2.py / jpeg2000.py for theirs. Built from the public
GIF89a specification (CompuServe, 1990) and ISO/IEC 11544's LZW
ancestry; no external codec exists in this sandbox.

Scope (honest, like the other codecs):
- GIF87a and GIF89a signatures; logical screen descriptor; global
  and local color tables (any 2..256 size).
- Variable-code-size LZW decompression (the GIF flavor: clear/EOI
  codes, code width grows 3..12 bits, deferred clear).
- Row interlacing (the 4-pass 8/8-8/4-2 scheme).
- Graphic Control Extension: transparency index — transparent pixels
  composite over white (255), matching the engine's document
  convention (white page background, like ccitt/jbig2 map 0=black).
- Animation: the FIRST image descriptor decodes (the still-image
  identity of the asset); later frames are skipped structurally.
- Extensions (comment/plain-text/application) are skipped by their
  sub-block chain, never parsed.

Output is grayscale uint8 (h, w) via integer ITU-R BT.601 luma
((299 R + 587 G + 114 B) // 1000), so GIF payloads compose with
png.encode_png_gray in the resize/dhash paths exactly like the other
codecs' outputs.

Shape of the work: LZW code emission is inherently sequential (each
code extends the dictionary the next code indexes), so the symbol
loop is Python; palette application and luma are numpy-vectorized.
The codec runs inside the existing Arrow-batched mapInPandas media
kernels: Spark-side parallelism is per-payload, never a shuffle.
"""

from __future__ import annotations

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")

# decompression-bomb guard: header dims are attacker-controlled and a
# tiny LZW stream can legally expand to w*h pixels plus zero-padding —
# bound the output buffer like the PDF stream caps (spec.py) do.
MAX_PIXELS = 1 << 26

# interlace pass layout: (first row, row step) per the GIF89a spec
# appendix E — pass 1 rows 0,8,16..., pass 2 rows 4,12..., pass 3
# rows 2,6,10..., pass 4 rows 1,3,5...
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor — a REAL
    header decode — or None if the payload is not a GIF."""
    if len(data) < 10 or data[:6] not in _SIGS:
        return None
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    if not w or not h:
        return None
    return w, h


def _skip_subblocks(data: bytes, i: int) -> int:
    """Advance past a sub-block chain (len-prefixed blocks, 0 ends)."""
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1 + ln
        if ln == 0:
            return i
    return n


def _lzw_decode(data: bytes, min_code: int, npix: int) -> bytearray | None:
    """GIF-flavor LZW: variable width min_code+1..12 bits, LSB-first
    bit packing, CLEAR resets the table, EOI ends. Returns exactly
    `npix` indices (truncated streams pad with 0 — lenient, like
    browser decoders) or None on a structurally broken stream."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()

    # dictionary as (prefix_code, suffix_byte); roots are implicit
    prefix = np.zeros(4096, np.int16)
    suffix = np.zeros(4096, np.uint8)

    def reset() -> tuple[int, int]:
        return eoi + 1, min_code + 1

    next_code, width = reset()
    acc = 0
    nbits = 0
    prev = -1
    i = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if i >= n:
                out.extend(b"\x00" * (npix - len(out)))
                return out
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            out.extend(b"\x00" * (npix - len(out)))
            return out
        if prev < 0:
            if code >= clear:
                return None  # first code must be a root
            out.append(code)
            prev = code
            continue
        if code > next_code or (code == next_code and next_code >= 4096):
            return None
        # expand `code` (or the KwK case when code == next_code)
        probe = prev if code == next_code else code
        stack = bytearray()
        while probe >= clear + 2:
            stack.append(suffix[probe])
            probe = int(prefix[probe])
        stack.append(probe)  # root
        first = probe
        if code == next_code:
            stack.insert(0, first)
        out.extend(reversed(stack))
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out[:npix]


def _frame_luma_and_alpha(
    arr: np.ndarray, palette: np.ndarray, transparent: int
) -> tuple[np.ndarray, np.ndarray]:
    """Index array -> (luma uint8, opaque-mask bool)."""
    pal = np.clip(arr, 0, len(palette) - 1)
    rgb = palette[pal].astype(np.int32)
    gray = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    opaque = (
        arr != transparent
        if 0 <= transparent < len(palette)
        else np.ones(arr.shape, bool)
    )
    return gray.astype(np.uint8), opaque


def decode_gif_frames(
    data: bytes, max_frames: int = 64
) -> list[np.ndarray] | None:
    """GIF bytes -> list of (sh, sw) uint8 grayscale CANVAS snapshots,
    one per animation frame (up to `max_frames`), or None when the
    payload is not a decodable GIF.

    Real animation semantics per the GIF89a spec: each frame's rect
    (left, top, w, h) composites onto the logical-screen canvas with
    its transparency mask; the Graphic Control disposal method then
    decides what the NEXT frame draws over — 0/1 leave in place,
    2 restore the rect to background (white, the engine's document
    convention), 3 restore the previous canvas. This is the real
    frame-sampling path for the one animated format the sandbox can
    decode; multimodal.sample_frames uses it before falling back to
    the byte-chunk stub for undecodable media."""
    if not isinstance(data, (bytes, bytearray)) or bytes(data[:6]) not in _SIGS:
        return None
    data = bytes(data)
    n = len(data)
    if n < 13:
        return None
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    if not sw or not sh or sw * sh > MAX_PIXELS:
        return None
    gct_flag = data[10] & 0x80
    gct_size = 2 << (data[10] & 0x07)
    i = 13
    gct = None
    if gct_flag:
        if i + 3 * gct_size > n:
            return None
        gct = np.frombuffer(data[i : i + 3 * gct_size], np.uint8).reshape(-1, 3)
        i += 3 * gct_size
    canvas = np.full((sh, sw), 255, np.uint8)
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while i < n and len(frames) < max_frames:
        b0 = data[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            if i + 2 > n:
                break
            label = data[i + 1]
            j = i + 2
            if label == 0xF9 and j < n and data[j] >= 4 and j + 5 <= n:
                packed = data[j + 1]
                disposal = (packed >> 2) & 0x07
                transparent = data[j + 4] if packed & 0x01 else -1
            i = _skip_subblocks(data, j)
            continue
        if b0 != 0x2C:
            break
        if i + 10 > n:
            break
        left = int.from_bytes(data[i + 1 : i + 3], "little")
        top = int.from_bytes(data[i + 3 : i + 5], "little")
        w = int.from_bytes(data[i + 5 : i + 7], "little")
        h = int.from_bytes(data[i + 7 : i + 9], "little")
        flags = data[i + 9]
        i += 10
        lct = None
        if flags & 0x80:
            sz = 2 << (flags & 0x07)
            if i + 3 * sz > n:
                break
            lct = np.frombuffer(data[i : i + 3 * sz], np.uint8).reshape(-1, 3)
            i += 3 * sz
        palette = lct if lct is not None else gct
        if palette is None or not w or not h or i >= n or w * h > MAX_PIXELS:
            break
        min_code = data[i]
        i += 1
        chunks = []
        while i < n:
            ln = data[i]
            i += 1
            if ln == 0:
                break
            chunks.append(data[i : i + ln])
            i += ln
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if idx is None:
            break
        arr = np.frombuffer(bytes(idx), np.uint8).reshape(h, w)
        if flags & 0x40:  # interlaced
            out_rows = np.empty(h, np.int32)
            r = 0
            for first, step in _INTERLACE:
                for y in range(first, h, step):
                    out_rows[y] = r
                    r += 1
            arr = arr[out_rows]
        gray, opaque = _frame_luma_and_alpha(arr, palette, transparent)
        # clip the frame rect to the canvas
        y1 = min(top + h, sh)
        x1 = min(left + w, sw)
        if top < sh and left < sw:
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top:y1, left:x1]
            m = opaque[: y1 - top, : x1 - left]
            region[m] = gray[: y1 - top, : x1 - left][m]
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top:y1, left:x1] = 255
            elif disposal == 3 and prev is not None:
                canvas = prev
        else:
            frames.append(canvas.copy())
        transparent = -1
        disposal = 0
    return frames if frames else None


def decode_gif_gray(data: bytes) -> np.ndarray | None:
    """GIF bytes -> (h, w) uint8 grayscale, or None when the payload
    is not a decodable GIF. First frame only; transparency composites
    over white; interlaced rows are re-ordered per the spec."""
    if not isinstance(data, (bytes, bytearray)) or bytes(data[:6]) not in _SIGS:
        return None
    data = bytes(data)
    n = len(data)
    if n < 13:
        return None
    gct_flag = data[10] & 0x80
    gct_size = 2 << (data[10] & 0x07)
    i = 13
    gct = None
    if gct_flag:
        if i + 3 * gct_size > n:
            return None
        gct = np.frombuffer(data[i : i + 3 * gct_size], np.uint8).reshape(-1, 3)
        i += 3 * gct_size

    transparent = -1
    while i < n:
        b0 = data[i]
        if b0 == 0x3B:  # trailer
            return None
        if b0 == 0x21:  # extension
            if i + 2 > n:
                return None
            label = data[i + 1]
            j = i + 2
            if label == 0xF9 and j < n and data[j] >= 4 and j + 5 <= n:
                # graphic control: transparency flag + index
                if data[j + 1] & 0x01:
                    transparent = data[j + 4]
            i = _skip_subblocks(data, j)
            continue
        if b0 != 0x2C:  # not an image descriptor
            return None
        if i + 10 > n:
            return None
        w = int.from_bytes(data[i + 5 : i + 7], "little")
        h = int.from_bytes(data[i + 7 : i + 9], "little")
        flags = data[i + 9]
        i += 10
        lct = None
        if flags & 0x80:
            sz = 2 << (flags & 0x07)
            if i + 3 * sz > n:
                return None
            lct = np.frombuffer(data[i : i + 3 * sz], np.uint8).reshape(-1, 3)
            i += 3 * sz
        palette = lct if lct is not None else gct
        if palette is None or not w or not h or i >= n:
            return None
        if w * h > MAX_PIXELS:
            return None
        min_code = data[i]
        i += 1
        # gather the LZW sub-block chain
        chunks = []
        while i < n:
            ln = data[i]
            i += 1
            if ln == 0:
                break
            chunks.append(data[i : i + ln])
            i += ln
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if idx is None:
            return None
        arr = np.frombuffer(bytes(idx), np.uint8).reshape(h, w)
        if flags & 0x40:  # interlaced: rows were emitted in pass order
            out_rows = np.empty(h, np.int32)
            r = 0
            for first, step in _INTERLACE:
                for y in range(first, h, step):
                    out_rows[y] = r
                    r += 1
            arr = arr[out_rows]
        pal = np.clip(arr, 0, len(palette) - 1)
        rgb = palette[pal].astype(np.int32)
        gray = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
        if 0 <= transparent < len(palette):
            gray = np.where(arr == transparent, 255, gray)
        return gray.astype(np.uint8)
    return None


# ---------------------------------------------------------------------------
# minimal encoder — fixture generation + synth payloads (grayscale
# palette, optional interlace). Independent of the decoder's tables:
# it builds LZW codes from a dict keyed by byte strings, so
# decode(encode(x)) == x is a real two-implementation check.
# ---------------------------------------------------------------------------


def encode_gif_gray(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) uint8 grayscale -> GIF89a bytes with a 256-entry gray
    palette (index i -> rgb(i,i,i)), single frame."""
    pixels = np.asarray(pixels, np.uint8)
    h, w = pixels.shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries, 8-bit
    for v in range(256):
        out += bytes([v, v, v])
    out += bytes([0x2C, 0, 0, 0, 0])  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        rows = []
        for first, step in _INTERLACE:
            rows.extend(range(first, h, step))
        src = pixels[np.asarray(rows, np.int32)].tobytes()
    else:
        src = pixels.tobytes()

    min_code = 8
    out += bytes([min_code])
    clear = 1 << min_code
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([v]): v for v in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for byte in src:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([v]): v for v in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        run = bytes([byte])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)
    i = 0
    while i < len(bits):
        blk = bits[i : i + 255]
        out += bytes([len(blk)]) + blk
        i += 255
    out += bytes([0, 0x3B])
    return bytes(out)
