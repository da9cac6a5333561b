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
- Round-5 (r04 verdict task #4): embedded CFF programs (/FontFile3,
  bare Type1C or OpenType-wrapped) — the charset table gives
  glyph -> SID -> name and the built-in Encoding gives code ->
  glyph, no charstring interpretation needed — and bare Type 1
  programs (/FontFile), whose /Encoding array is cleartext
  ("dup <code> /<name> put") ahead of the eexec section.

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


# ---------------------------------------------------------------------------
# embedded CFF (/FontFile3, Subtype Type1C/OpenType) parsing — r04
# verdict task #4: charstring-packaged fonts with custom built-in
# encodings and no ToUnicode//Differences defaulted to WinAnsi. The
# text mapping needs NO charstring interpretation: the CFF charset
# table gives glyph -> SID -> name and the built-in Encoding gives
# code -> glyph; AGL turns names into text. Built from the public
# Adobe CFF spec (Tech Note #5176 §§5-13, 16-19).
# ---------------------------------------------------------------------------

# CFF standard strings, SIDs 0-228 (Tech Note #5176 Appendix A) —
# the Latin text set. SIDs 229-390 are the Expert-set names
# (small caps, oldstyle figures, fraction pieces, weight words):
# none of them resolves to text under the Adobe Glyph List, so they
# are represented by unmappable placeholders; only their COUNT
# matters (custom strings index from SID 391).
_CFF_STD = (
    ".notdef space exclam quotedbl numbersign dollar percent "
    "ampersand quoteright parenleft parenright asterisk plus comma "
    "hyphen period slash zero one two three four five six seven "
    "eight nine colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore "
    "quoteleft a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde exclamdown cent sterling "
    "fraction yen florin section currency quotesingle quotedblleft "
    "guillemotleft guilsinglleft guilsinglright fi fl endash dagger "
    "daggerdbl periodcentered paragraph bullet quotesinglbase "
    "quotedblbase quotedblright guillemotright ellipsis perthousand "
    "questiondown grave acute circumflex tilde macron breve "
    "dotaccent dieresis ring cedilla hungarumlaut ogonek caron "
    "emdash AE ordfeminine Lslash Oslash OE ordmasculine ae "
    "dotlessi lslash oslash oe germandbls onesuperior logicalnot mu "
    "trademark Eth onehalf plusminus Thorn onequarter divide "
    "brokenbar degree thorn threequarters twosuperior registered "
    "minus eth multiply threesuperior copyright Aacute Acircumflex "
    "Adieresis Agrave Aring Atilde Ccedilla Eacute Ecircumflex "
    "Edieresis Egrave Iacute Icircumflex Idieresis Igrave Ntilde "
    "Oacute Ocircumflex Odieresis Ograve Otilde Scaron Uacute "
    "Ucircumflex Udieresis Ugrave Yacute Ydieresis Zcaron aacute "
    "acircumflex adieresis agrave aring atilde ccedilla eacute "
    "ecircumflex edieresis egrave iacute icircumflex idieresis "
    "igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis "
    "zcaron"
).split()
assert len(_CFF_STD) == 229

CFF_STANDARD_STRINGS: list[str] = _CFF_STD + [
    f"expertsid{i}" for i in range(229, 391)
]


def _cff_index(b: bytes, p: int) -> tuple[list[bytes], int]:
    """CFF INDEX at offset p -> (items, offset past the INDEX)."""
    count = _u16(b, p)
    if count == 0:
        return [], p + 2
    off_size = b[p + 2]
    if not 1 <= off_size <= 4:
        raise ValueError("bad CFF offSize")
    q = p + 3
    offs = []
    for _ in range(count + 1):
        offs.append(int.from_bytes(b[q : q + off_size], "big"))
        q += off_size
    base = q - 1  # offsets are 1-based from the byte before the data
    items = [b[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _cff_dict(b: bytes) -> dict[int, list]:
    """CFF DICT -> {operator: operands}; two-byte operators are keyed
    1200+op2. Reals are parsed structurally but returned as 0.0 (no
    text-mapping operator takes a real we need)."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    n = len(b)
    while i < n:
        b0 = b[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + b[i]
                i += 1
            out[op] = operands
            operands = []
        elif b0 == 28:
            operands.append(int.from_bytes(b[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b0 == 29:
            operands.append(int.from_bytes(b[i + 1 : i + 5], "big", signed=True))
            i += 5
        elif b0 == 30:  # real: nibbles until an 0xF terminator
            i += 1
            while i < n:
                v = b[i]
                i += 1
                if (v & 0x0F) == 0x0F or (v >> 4) == 0x0F:
                    break
            operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + b[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - b[i + 1] - 108)
            i += 2
        else:
            i += 1  # reserved byte: skip
    return out


def cff_code_map(data: bytes) -> dict[int, str] | None:
    """Embedded CFF (bare Type1C or OpenType-wrapped) ->
    {single-byte char code: text} from the font's BUILT-IN encoding
    and charset, or None when nothing is recoverable."""
    try:
        return _cff_code_map_inner(data)
    except Exception:
        return None


def _cff_code_map_inner(data: bytes) -> dict[int, str] | None:
    tables = sfnt_tables(data)
    if tables is not None:
        data = tables.get(b"CFF ", b"")
    if len(data) < 4 or data[0] != 1:
        return None
    p = data[2]  # hdrSize
    _names, p = _cff_index(data, p)
    tops, p = _cff_index(data, p)
    strings, p = _cff_index(data, p)
    if not tops:
        return None
    top = _cff_dict(tops[0])
    if 1230 in top:
        return None  # CIDFont (ROS): composite, handled by CMaps
    cs = top.get(17)
    if not cs or not isinstance(cs[0], int):
        return None
    nglyphs = _u16(data, cs[0])
    if not nglyphs:
        return None

    # charset: gid -> SID (predefined 0 = ISOAdobe, sid == gid)
    charset_off = top.get(15, [0])[0]
    sids = list(range(nglyphs))
    if charset_off in (1, 2):
        return None  # Expert charsets carry no AGL text
    if charset_off not in (0, 1, 2):
        fmt = data[charset_off]
        q = charset_off + 1
        sids = [0] * nglyphs
        gid = 1
        if fmt == 0:
            while gid < nglyphs:
                sids[gid] = _u16(data, q)
                q += 2
                gid += 1
        elif fmt in (1, 2):
            while gid < nglyphs:
                first = _u16(data, q)
                q += 2
                if fmt == 1:
                    nleft = data[q]
                    q += 1
                else:
                    nleft = _u16(data, q)
                    q += 2
                for k in range(nleft + 1):
                    if gid < nglyphs:
                        sids[gid] = first + k
                        gid += 1
        else:
            return None

    def sid_name(sid: int) -> str | None:
        if sid < 391:
            return CFF_STANDARD_STRINGS[sid]
        ix = sid - 391
        if ix < len(strings):
            return strings[ix].decode("latin-1")
        return None

    # encoding: code -> gid. Predefined 0 = Standard (code->char is
    # the Annex D Standard map), 1 = Expert (no text semantics).
    enc_off = top.get(16, [0])[0]
    if enc_off == 0:
        return base_encoding_map("StandardEncoding")
    if enc_off == 1:
        return None
    fmt = data[enc_off]
    q = enc_off + 1
    code_gid: dict[int, int] = {}
    base_fmt = fmt & 0x7F
    if base_fmt == 0:
        ncodes = data[q]
        q += 1
        for gid in range(1, min(ncodes, nglyphs - 1) + 1):
            code_gid[data[q]] = gid
            q += 1
        # a stale subset encoding may declare more codes than glyphs:
        # the cursor must still skip the FULL code array or a
        # following supplement block parses from the wrong offset
        # (garbage mappings -> silent mojibake)
        q += max(0, ncodes - (nglyphs - 1))
    elif base_fmt == 1:
        nranges = data[q]
        q += 1
        gid = 1
        for _ in range(nranges):
            first, nleft = data[q], data[q + 1]
            q += 2
            for k in range(nleft + 1):
                if gid < nglyphs and first + k <= 0xFF:
                    code_gid[first + k] = gid
                gid += 1
    else:
        return None
    if fmt & 0x80:  # supplements: (code, SID) pairs
        nsup = data[q]
        q += 1
        sid_to_gid = {s: g for g, s in enumerate(sids)}
        for _ in range(nsup):
            code, sid = data[q], _u16(data, q + 1)
            q += 3
            g = sid_to_gid.get(sid)
            if g:
                code_gid[code] = g

    out: dict[int, str] = {}
    for code, gid in code_gid.items():
        nm = sid_name(sids[gid]) if gid < nglyphs else None
        ch = glyph_to_char(nm) if nm else None
        if ch is not None:
            out[code] = ch
    return out or None


# ---------------------------------------------------------------------------
# bare Type1 (/FontFile, PFA/PFB) — the built-in /Encoding array is
# CLEARTEXT ("dup <code> /<glyphname> put"), so code -> name -> AGL
# needs no eexec decryption (Adobe Type 1 Font Format §2.3).
# ---------------------------------------------------------------------------

import re as _re

_T1_DUP_RE = _re.compile(rb"dup\s+(\d+)\s*/([^\s/{}()<>\[\]]+)\s+put")
_T1_STD_RE = _re.compile(rb"/Encoding\s+StandardEncoding\s+def")


def type1_code_map(data: bytes) -> dict[int, str] | None:
    """Embedded Type 1 program -> {char code: text} from its
    cleartext /Encoding array, or None. PFB segment headers
    (0x80 0x01/0x02 + little-endian length) are unwrapped; only the
    ASCII segments are scanned."""
    try:
        if data[:1] == b"\x80":
            parts = []
            i = 0
            while i + 6 <= len(data) and data[i] == 0x80:
                t = data[i + 1]
                ln = int.from_bytes(data[i + 2 : i + 6], "little")
                if t == 1:
                    parts.append(data[i + 6 : i + 6 + ln])
                if t == 3:
                    break
                i += 6 + ln
            text = b"".join(parts)
        else:
            # scan only the cleartext header (up to eexec)
            cut = data.find(b"eexec")
            text = data[: cut if cut >= 0 else len(data)]
        if b"/Encoding" not in text:
            return None
        if _T1_STD_RE.search(text):
            return base_encoding_map("StandardEncoding")
        out: dict[int, str] = {}
        for m in _T1_DUP_RE.finditer(text):
            code = int(m.group(1))
            if not 0 <= code <= 0xFF:
                continue
            ch = glyph_to_char(m.group(2).decode("latin-1"))
            if ch is not None:
                out[code] = ch
        return out or None
    except Exception:
        return None


#: sentinel: a symbolic font whose embedded program yields NO
#: mapping — text shown with it is unrecoverable; the interpreter
#: quarantines the document instead of emitting WinAnsi mojibake.
UNMAPPABLE = object()
