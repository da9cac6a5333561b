"""Simple-font character mapping for PDFs WITHOUT a ToUnicode CMap.

Round-3 verdict task #6: custom-encoded text silently defaulted to
WinAnsi. Two public-spec mechanisms close the gap:

- /Encoding dictionaries with a /Differences array (ISO 32000
  §9.6.6.3): a base encoding (WinAnsi / MacRoman / Standard) patched
  per character code with Adobe glyph NAMES. Names resolve to text
  via the Adobe Glyph List conventions — a curated table here plus
  the algorithmic ``uniXXXX`` / ``uXXXXXX`` / ligature / suffix
  rules from Adobe's public "Unicode and Glyph Names" note.
- Embedded TrueType font programs (/FontFile2) for SYMBOLIC fonts
  (FontDescriptor /Flags bit 3): the sfnt ``cmap`` table ((3,0)
  symbol / (1,0) mac / (3,1) BMP subtables, formats 0/4/6/12) maps
  character codes to glyph ids, and the ``post`` table (format 2.0,
  standard Macintosh order + Pascal-string names) gives glyph names
  — AGL turns those into text. When the font carries a (3,1)
  Unicode subtable but no usable ``post`` names, its inverse
  (gid -> unicode) is the fallback.

Everything here is built from the public specs (ISO 32000-1,
Apple/Microsoft TrueType ``cmap``/``post`` references, Adobe AGL);
reference parity: the reference engine gets this breadth from
PyMuPDF's font machinery (reference fast/service.py:42).

The AGL table is DERIVED, not transcribed: the standard Macintosh
glyph order (the 258-name ``post`` format-2.0 index space) pairs
names with mac-roman character codes, so Python's own ``mac_roman``
codec supplies the Unicode values; the 32 non-mac extras and a few
post-Mac-OS-8.5 divergences are explicit.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# standard Macintosh glyph order (TrueType `post` format 2.0,
# indices 0-257). Indices 3..97 are mac-roman 0x20..0x7E, indices
# 98..225 are mac-roman 0x80..0xFF, 226..257 are the 32 extras.
# ---------------------------------------------------------------------------

_ASCII_NAMES = (
    "space exclam quotedbl numbersign dollar percent ampersand "
    "quotesingle parenleft parenright asterisk plus comma hyphen "
    "period slash zero one two three four five six seven eight nine "
    "colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore grave "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
).split()

_MAC_HIGH_NAMES = (
    "Adieresis Aring Ccedilla Eacute Ntilde Odieresis Udieresis "
    "aacute agrave acircumflex adieresis atilde aring ccedilla "
    "eacute egrave ecircumflex edieresis iacute igrave icircumflex "
    "idieresis ntilde oacute ograve ocircumflex odieresis otilde "
    "uacute ugrave ucircumflex udieresis dagger degree cent sterling "
    "section bullet paragraph germandbls registered copyright "
    "trademark acute dieresis notequal AE Oslash infinity plusminus "
    "lessequal greaterequal yen mu partialdiff summation product pi "
    "integral ordfeminine ordmasculine Omega ae oslash questiondown "
    "exclamdown logicalnot radical florin approxequal Delta "
    "guillemotleft guillemotright ellipsis nonbreakingspace Agrave "
    "Atilde Otilde OE oe endash emdash quotedblleft quotedblright "
    "quoteleft quoteright divide lozenge ydieresis Ydieresis "
    "fraction currency guilsinglleft guilsinglright fi fl daggerdbl "
    "periodcentered quotesinglbase quotedblbase perthousand "
    "Acircumflex Ecircumflex Aacute Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Oacute Ocircumflex apple Ograve "
    "Uacute Ucircumflex Ugrave dotlessi circumflex tilde macron "
    "breve dotaccent ring cedilla hungarumlaut ogonek caron"
).split()

_EXTRA_NAMES = {  # indices 226-257: not in mac-roman
    "Lslash": "Ł", "lslash": "ł", "Scaron": "Š",
    "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "brokenbar": "¦", "Eth": "Ð", "eth": "ð",
    "Yacute": "Ý", "yacute": "ý", "Thorn": "Þ",
    "thorn": "þ", "minus": "−", "multiply": "×",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onehalf": "½",
    "onequarter": "¼", "threequarters": "¾",
    "franc": "₣", "Gbreve": "Ğ", "gbreve": "ğ",
    "Idotaccent": "İ", "Scedilla": "Ş",
    "scedilla": "ş", "Cacute": "Ć", "cacute": "ć",
    "Ccaron": "Č", "ccaron": "č", "dcroat": "đ",
}

STANDARD_MAC_GLYPHS: list[str] = (
    [".notdef", ".null", "nonmarkingreturn"]
    + _ASCII_NAMES
    + _MAC_HIGH_NAMES
    + list(_EXTRA_NAMES)
)
assert len(STANDARD_MAC_GLYPHS) == 258


def _build_agl() -> dict[str, str]:
    agl: dict[str, str] = {}
    mac_codes = list(range(0x20, 0x7F)) + list(range(0x80, 0x100))
    for name, code in zip(_ASCII_NAMES + _MAC_HIGH_NAMES, mac_codes):
        agl[name] = bytes([code]).decode("mac_roman")
    agl.update(_EXTRA_NAMES)
    # post-Mac-OS-8.5 divergences in Python's codec + AGL names the
    # mac set lacks but Differences arrays use in the wild
    agl.update({
        "currency": "¤",        # codec has Euro at 0xDB
        "Euro": "€",
        "quotedbl": '"',
        "softhyphen": "­",
        "middot": "·",          # non-AGL alias seen in the wild
        "nbspace": " ",
        "sfthyphen": "­",
        "ffi": "ﬃ", "ffl": "ﬄ", "ff": "ﬀ",
        "dotlessj": "ȷ",
        "Zdotaccent": "Ż", "zdotaccent": "ż",
        "Aogonek": "Ą", "aogonek": "ą",
        "Eogonek": "Ę", "eogonek": "ę",
        "Nacute": "Ń", "nacute": "ń",
        "Sacute": "Ś", "sacute": "ś",
        "Zacute": "Ź", "zacute": "ź",
    })
    # Greek (Symbol-font Differences): lower + upper via the Unicode
    # contiguous blocks; AGL uses the English letter names
    greek = (
        "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa "
        "Lambda Mu Nu Xi Omicron Pi Rho sigmafinal Sigma Tau Upsilon "
        "Phi Chi Psi Omega"
    ).split()
    for i, nm in enumerate(greek):
        cp = 0x0391 + i  # 'sigmafinal' holds the reserved U+03A2 slot
        if nm == "sigmafinal":
            continue
        agl.setdefault(nm, chr(cp))
        agl.setdefault(nm.lower(), chr(cp + 0x20))
    agl["sigma1"] = "ς"
    # AGL quirks: in Adobe's list Delta/Omega/mu map to the GREEK
    # letters via the mac-roman math symbols above (U+2206/U+2126/
    # U+00B5) — keep the mac-derived values (they round-trip the
    # Symbol uses the engine meets) and expose the Greek codepoints
    # under the two-name forms
    agl["Deltagreek"] = "Δ"
    agl["Omegagreek"] = "Ω"
    agl["mugreek"] = "μ"
    return agl


AGL: dict[str, str] = _build_agl()


def glyph_to_char(name: str) -> str | None:
    """Adobe Glyph List resolution incl. the algorithmic rules from
    Adobe's public note: drop the first '.'-suffix, split '_'
    ligature components, `uniXXXX[YYYY...]` UTF-16 groups, and
    `uXXXX`..`uXXXXXX` direct codepoints. None when unmappable."""
    if not name or name == ".notdef":
        return None
    name = name.split(".")[0]
    if "_" in name:
        parts = [glyph_to_char(p) for p in name.split("_")]
        return None if any(p is None for p in parts) else "".join(parts)
    if name in AGL:
        return AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        hexpart = name[3:]
        if len(hexpart) % 4 == 0:
            try:
                units = [
                    int(hexpart[i : i + 4], 16)
                    for i in range(0, len(hexpart), 4)
                ]
                return b"".join(
                    u.to_bytes(2, "big") for u in units
                ).decode("utf-16-be")
            except (ValueError, UnicodeDecodeError):
                return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
                return chr(cp)
        except ValueError:
            return None
    return None


# ---------------------------------------------------------------------------
# base encodings (ISO 32000 Annex D) — code -> char maps. WinAnsi
# and MacRoman ride Python's cp1252 / mac_roman codecs; Standard is
# ASCII plus its §D.2 divergences.
# ---------------------------------------------------------------------------

def _codec_map(codec: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for c in range(0x20, 0x100):
        try:
            ch = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            continue
        if ch.isprintable() or ch in " ­":
            out[c] = ch
    return out


_STANDARD_DIVERGENCES = {
    0x27: "’", 0x60: "‘",  # quoteright / quoteleft
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ", 0xB1: "–",
    0xB2: "†", 0xB3: "‡", 0xB4: "·", 0xB6: "¶",
    0xB7: "•", 0xB8: "‚", 0xB9: "„", 0xBA: "”",
    0xBB: "»", 0xBC: "…", 0xBD: "‰", 0xBF: "¿",
    0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜",
    0xC5: "¯", 0xC6: "˘", 0xC7: "˙", 0xC8: "¨",
    0xCA: "˚", 0xCB: "¸", 0xCD: "˝", 0xCE: "˛",
    0xCF: "ˇ", 0xD0: "—", 0xE1: "Æ", 0xE3: "ª",
    0xE8: "Ł", 0xE9: "Ø", 0xEA: "Œ", 0xEB: "º",
    0xF1: "æ", 0xF5: "ı", 0xF8: "ł", 0xF9: "ø",
    0xFA: "œ", 0xFB: "ß",
}


def base_encoding_map(name: str) -> dict[int, str] | None:
    if name == "WinAnsiEncoding":
        return _codec_map("cp1252")
    if name == "MacRomanEncoding":
        return _codec_map("mac_roman")
    if name == "StandardEncoding":
        out = {c: chr(c) for c in range(0x20, 0x7F)}
        out.update(_STANDARD_DIVERGENCES)
        return out
    return None


def encoding_cmap(enc) -> dict[int, str] | None:
    """/Encoding entry (name string or dict, refs pre-resolved) ->
    code->char map, or None when the engine's WinAnsi default is
    already correct (plain /WinAnsiEncoding, or nothing usable).
    Differences codes whose glyph name is unmappable are DROPPED
    from the map (decode skips them) — the documented behavior for
    partial custom encodings; whole-font quarantine is reserved for
    symbolic fonts with no mapping at all."""
    if isinstance(enc, str):
        if enc == "WinAnsiEncoding":
            return None
        return base_encoding_map(enc)
    if not isinstance(enc, dict):
        return None
    base_name = enc.get("BaseEncoding")
    diffs = enc.get("Differences")
    if not isinstance(diffs, list) or not diffs:
        if isinstance(base_name, str) and base_name != "WinAnsiEncoding":
            return base_encoding_map(base_name)
        return None
    base = (
        base_encoding_map(base_name)
        if isinstance(base_name, str)
        else None
    ) or _codec_map("cp1252")
    out = dict(base)
    code = 0
    for item in diffs:
        if isinstance(item, (int, float)):
            code = int(item)
            continue
        ch = glyph_to_char(str(item))
        if ch is not None:
            out[code] = ch
        else:
            out.pop(code, None)
        code += 1
    return out


# ---------------------------------------------------------------------------
# embedded TrueType (sfnt) parsing: cmap + post
# ---------------------------------------------------------------------------

def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from(">H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def sfnt_tables(data: bytes) -> dict[bytes, bytes] | None:
    if len(data) < 12:
        return None
    tag = data[:4]
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
        return None
    if tag == b"ttcf":  # collection: first font
        if len(data) < 16:
            return None
        return sfnt_tables_at(data, _u32(data, 12))
    return sfnt_tables_at(data, 0)


def sfnt_tables_at(data: bytes, base: int) -> dict[bytes, bytes] | None:
    try:
        n = _u16(data, base + 4)
        out: dict[bytes, bytes] = {}
        for i in range(n):
            o = base + 12 + 16 * i
            tg = data[o : o + 4]
            off, ln = _u32(data, o + 8), _u32(data, o + 12)
            if off + ln <= len(data):
                out[tg] = data[off : off + ln]
        return out
    except struct.error:
        return None


def _cmap_subtable(b: bytes) -> dict[int, int] | None:
    """One cmap subtable -> {char code: glyph id}. Formats 0/4/6/12."""
    try:
        fmt = _u16(b, 0)
        if fmt == 0:
            return {c: b[6 + c] for c in range(256) if b[6 + c]}
        if fmt == 6:
            first, count = _u16(b, 6), _u16(b, 8)
            return {
                first + i: g
                for i in range(count)
                if (g := _u16(b, 10 + 2 * i))
            }
        if fmt == 4:
            seg2 = _u16(b, 6)
            nseg = seg2 // 2
            ends = [_u16(b, 14 + 2 * i) for i in range(nseg)]
            starts = [_u16(b, 16 + seg2 + 2 * i) for i in range(nseg)]
            deltas = [_u16(b, 16 + 2 * seg2 + 2 * i) for i in range(nseg)]
            ro_base = 16 + 3 * seg2
            out: dict[int, int] = {}
            for i in range(nseg):
                ro = _u16(b, ro_base + 2 * i)
                for c in range(starts[i], min(ends[i], 0xFFFE) + 1):
                    if ro == 0:
                        g = (c + deltas[i]) & 0xFFFF
                    else:
                        gi = ro_base + 2 * i + ro + 2 * (c - starts[i])
                        if gi + 2 > len(b):
                            continue
                        g = _u16(b, gi)
                        if g:
                            g = (g + deltas[i]) & 0xFFFF
                    if g:
                        out[c] = g
            return out
        if fmt == 12:
            ngroups = _u32(b, 12)
            out = {}
            for i in range(min(ngroups, 10000)):
                o = 16 + 12 * i
                s, e, g0 = _u32(b, o), _u32(b, o + 4), _u32(b, o + 8)
                for c in range(s, min(e, s + 0xFFFF) + 1):
                    out[c] = g0 + (c - s)
            return out
    except (struct.error, IndexError):
        return None
    return None


def _post_names(b: bytes) -> dict[int, str] | None:
    """post table format 2.0 -> {glyph id: glyph name}."""
    try:
        if _u32(b, 0) != 0x00020000:
            return None
        n = _u16(b, 32)
        idx = [_u16(b, 34 + 2 * i) for i in range(n)]
        names: list[str] = []
        o = 34 + 2 * n
        while o < len(b):
            ln = b[o]
            names.append(b[o + 1 : o + 1 + ln].decode("latin-1"))
            o += 1 + ln
        out: dict[int, str] = {}
        for gid, ix in enumerate(idx):
            if ix < 258:
                out[gid] = STANDARD_MAC_GLYPHS[ix]
            elif ix - 258 < len(names):
                out[gid] = names[ix - 258]
        return out
    except (struct.error, IndexError):
        return None


def truetype_code_map(data: bytes) -> dict[int, str] | None:
    """Embedded TrueType program -> {single-byte char code: text},
    or None when the font carries no recoverable mapping. Symbol
    cmaps ((3,0)) look codes up at 0xF0xx then raw; glyph names come
    from `post` 2.0, with an inverted (3,1)/(0,x) Unicode subtable
    as the nameless fallback."""
    tables = sfnt_tables(data)
    if not tables or b"cmap" not in tables:
        return None
    cm = tables[b"cmap"]
    try:
        ntab = _u16(cm, 2)
        subs: dict[tuple[int, int], dict[int, int]] = {}
        for i in range(ntab):
            o = 4 + 8 * i
            plat, enc, off = _u16(cm, o), _u16(cm, o + 2), _u32(cm, o + 4)
            parsed = _cmap_subtable(cm[off:])
            if parsed:
                subs[(plat, enc)] = parsed
    except (struct.error, IndexError):
        return None
    if not subs:
        return None
    gid_name = _post_names(tables[b"post"]) if b"post" in tables else None
    uni_sub = subs.get((3, 1)) or subs.get((0, 3)) or subs.get((0, 4))
    gid_uni: dict[int, str] = {}
    if uni_sub:
        for cp, gid in sorted(uni_sub.items()):
            gid_uni.setdefault(gid, chr(cp))

    def code_gid(code: int) -> int | None:
        if (3, 0) in subs:
            s = subs[(3, 0)]
            return s.get(0xF000 | code) or s.get(code)
        if (1, 0) in subs:
            return subs[(1, 0)].get(code)
        if uni_sub:
            return uni_sub.get(code)
        return None

    out: dict[int, str] = {}
    for code in range(256):
        gid = code_gid(code)
        if not gid:
            continue
        ch = glyph_to_char(gid_name[gid]) if gid_name and gid in gid_name else None
        if ch is None:
            ch = gid_uni.get(gid)
        if ch is not None:
            out[code] = ch
    return out or None


#: sentinel: a symbolic font whose embedded program yields NO
#: mapping — text shown with it is unrecoverable; the interpreter
#: quarantines the document instead of emitting WinAnsi mojibake.
UNMAPPABLE = object()
