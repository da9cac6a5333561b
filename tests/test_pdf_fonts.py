"""Simple-font decoding WITHOUT ToUnicode (round-3 verdict task #6):
/Encoding + /Differences arrays resolved through the Adobe Glyph
List, embedded symbolic-TrueType cmap/post mapping, and the
quarantine rule for truly unmappable symbolic fonts. Fixtures are
hand-built from ISO 32000 + the TrueType spec — including an
independent sfnt builder — never from the module's own writer."""

from __future__ import annotations

import struct

from test_pdf15_io import build_pdf15


def build_sfnt(tables: dict[bytes, bytes]) -> bytes:
    """Minimal TrueType container: offset table + directory + data."""
    n = len(tables)
    out = bytearray(struct.pack(">IHHHH", 0x00010000, n, 0, 0, 0))
    off = 12 + 16 * n
    dir_, blobs = bytearray(), bytearray()
    for tag, data in sorted(tables.items()):
        dir_ += tag + struct.pack(">III", 0, off, len(data))
        pad = (4 - len(data) % 4) % 4
        blobs += data + b"\0" * pad
        off += len(data) + pad
    return bytes(out + dir_ + blobs)


def symbol_cmap_fmt6(first: int, gids: list[int]) -> bytes:
    """cmap table with one (3,0) Microsoft-Symbol format-6 subtable."""
    sub = struct.pack(
        ">HHHHH", 6, 10 + 2 * len(gids), 0, first, len(gids)
    ) + struct.pack(">%dH" % len(gids), *gids)
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 0, 12) + sub


def post_v2(names: list[str | int]) -> bytes:
    """post format 2.0; entries are standard-order indices (int) or
    custom names (str, allocated from index 258 up)."""
    idx, pascal = [], bytearray()
    custom = 258
    for nm in names:
        if isinstance(nm, int):
            idx.append(nm)
        else:
            idx.append(custom)
            custom += 1
            pascal += bytes([len(nm)]) + nm.encode("ascii")
    head = struct.pack(">IIhhIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
    return head + struct.pack(">H", len(idx)) + struct.pack(
        ">%dH" % len(idx), *idx
    ) + bytes(pascal)


def _font_page(font_obj: bytes, content: bytes,
               extra: dict[int, bytes] | None = None) -> bytes:
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ),
        4: b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(content), content),
        5: font_obj,
    }
    objects.update(extra or {})
    return build_pdf15(objects, root=1)


def _texts(doc):
    return [(s["kind"], s["text"]) for s in doc["spans"]]


# ---------------------------------------------------------------------------
# /Differences
# ---------------------------------------------------------------------------

def test_differences_encoding_decodes():
    """ISO 32000 §9.6.6.3: /Differences patches the base encoding
    per code with AGL glyph names, including algorithmic uniXXXX."""
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
        b" /Encoding << /BaseEncoding /WinAnsiEncoding"
        b" /Differences [ 65 /eacute /bullet 71 /uni0393 ] >> >>"
    )
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (AB G) Tj ET"))
    assert doc is not None
    assert _texts(doc) == [("text", "é• Γ")]


def test_differences_base_untouched_codes_keep_winansi():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = (
        b"<< /Type /Font /Subtype /Type1"
        b" /Encoding << /Differences [ 90 /emdash ] >> >>"
    )
    # 0x93/0x94 are WinAnsi curly quotes (base survives); Z remapped
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (\x93Z\x94) Tj ET"))
    assert _texts(doc) == [("text", "“—”")]


def test_differences_unmappable_name_drops_only_that_code():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = (
        b"<< /Type /Font /Subtype /Type1"
        b" /Encoding << /Differences [ 66 /g999 ] >> >>"
    )
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (aBc) Tj ET"))
    assert _texts(doc) == [("text", "ac")]


def test_macroman_base_encoding_name():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = (
        b"<< /Type /Font /Subtype /Type1"
        b" /Encoding /MacRomanEncoding >>"
    )
    # MacRoman 0x8E = eacute, 0xA5 = bullet (≠ WinAnsi where they
    # are Ž and ¥) — hex string keeps the raw bytes explicit
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td <8E 41 A5> Tj ET"))
    assert _texts(doc) == [("text", "éA•")]


def test_encoding_dict_via_indirect_ref():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = b"<< /Type /Font /Subtype /Type1 /Encoding 6 0 R >>"
    extra = {6: b"<< /Differences [ 65 /Omega ] >>"}
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (A) Tj ET", extra))
    assert _texts(doc) == [("text", "Ω")]


def test_tounicode_wins_over_differences():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    cmap = (
        b"begincodespacerange <00> <FF> endcodespacerange\n"
        b"beginbfchar <41> <0042> endbfchar\n"
    )
    font = (
        b"<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R"
        b" /Encoding << /Differences [ 65 /eacute ] >> >>"
    )
    extra = {
        6: b"<< /Length %d >>\nstream\n%sendstream" % (len(cmap), cmap)
    }
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (A) Tj ET", extra))
    assert _texts(doc) == [("text", "B")]


# ---------------------------------------------------------------------------
# embedded symbolic TrueType
# ---------------------------------------------------------------------------

def _tt_font_objs(sfnt: bytes, flags: int = 4):
    font = (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Sym"
        b" /FontDescriptor 6 0 R >>"
    )
    extra = {
        6: b"<< /Type /FontDescriptor /FontName /Sym /Flags %d"
        b" /FontFile2 7 0 R >>" % flags,
        7: b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(sfnt), sfnt),
    }
    return font, extra


def test_symbolic_truetype_cmap_post_decodes():
    """(3,0) symbol cmap at 0xF0xx + post 2.0 names (one standard-
    order index, one custom uniXXXX Pascal name) -> real text."""
    from two_tier_document_parser_spark.pdf_fonts import (
        STANDARD_MAC_GLYPHS,
    )
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    sfnt = build_sfnt({
        b"cmap": symbol_cmap_fmt6(0xF041, [1, 2]),
        b"post": post_v2([0, STANDARD_MAC_GLYPHS.index("eacute"),
                          "uni0393"]),
    })
    font, extra = _tt_font_objs(sfnt)
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (AB) Tj ET", extra))
    assert doc is not None
    assert _texts(doc) == [("text", "éΓ")]


def test_symbolic_truetype_unicode_subtable_fallback():
    """No post names: the inverted (3,1) Unicode subtable supplies
    gid -> char."""
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    sub30 = symbol_cmap_fmt6(0xF041, [1])[12:]
    sub31 = struct.pack(">HHHHH", 6, 12, 0, 0x00C9, 1) + struct.pack(
        ">H", 1
    )  # U+00C9 -> gid 1
    cmap = (
        struct.pack(">HH", 0, 2)
        + struct.pack(">HHI", 3, 0, 20)
        + struct.pack(">HHI", 3, 1, 20 + len(sub30))
        + sub30
        + sub31
    )
    font, extra = _tt_font_objs(build_sfnt({b"cmap": cmap}))
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (A) Tj ET", extra))
    assert _texts(doc) == [("text", "É")]


def test_unmappable_symbolic_font_quarantines_only_when_shown():
    """A symbolic font with no recoverable mapping: the document
    quarantines IF text is shown with it (WinAnsi there would be
    silent mojibake), but parses fine when the font is never used."""
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    # cmap table with zero subtables -> no mapping at all
    font, extra = _tt_font_objs(build_sfnt({b"cmap": struct.pack(">HH", 0, 0)}))
    assert parse_pdf(
        _font_page(font, b"BT /F1 12 Tf 72 700 Td (secret) Tj ET", extra)
    ) is None
    ok = parse_pdf(
        _font_page(font, b"BT /F2 12 Tf 72 700 Td (plain) Tj ET", extra)
    )
    assert ok is not None and _texts(ok) == [("text", "plain")]


def test_nonsymbolic_truetype_without_program_keeps_default():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    font = (
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial"
        b" /FontDescriptor 6 0 R >>"
    )
    extra = {6: b"<< /Type /FontDescriptor /Flags 32 >>"}  # nonsymbolic
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (caf\xe9) Tj ET", extra))
    assert _texts(doc) == [("text", "café")]


# ---------------------------------------------------------------------------
# AGL resolution unit checks (facts independent of the table build)
# ---------------------------------------------------------------------------

def test_agl_spot_values():
    from two_tier_document_parser_spark.pdf_fonts import (
        AGL,
        glyph_to_char,
    )

    for name, want in {
        "eacute": "é", "bullet": "•", "Euro": "€",
        "emdash": "—", "germandbls": "ß", "fi": "ﬁ",
        "Lslash": "Ł", "alpha": "α", "Gamma": "Γ",
        "quotesingle": "'", "currency": "¤", "thorn": "þ",
        "Scaron": "Š", "dcroat": "đ",
    }.items():
        assert AGL[name] == want, name
    assert glyph_to_char("uni0041") == "A"
    assert glyph_to_char("uni00480065") == "He"
    assert glyph_to_char("u1F600") == "\U0001f600"
    assert glyph_to_char("f_l") == "fl"  # ligature composition
    assert glyph_to_char("eacute.sc") == "é"
    assert glyph_to_char("gid42") is None
    assert glyph_to_char(".notdef") is None


def test_standard_mac_glyph_order_shape():
    from two_tier_document_parser_spark.pdf_fonts import (
        STANDARD_MAC_GLYPHS,
    )

    assert len(STANDARD_MAC_GLYPHS) == 258
    assert STANDARD_MAC_GLYPHS[0] == ".notdef"
    assert STANDARD_MAC_GLYPHS[3] == "space"
    assert STANDARD_MAC_GLYPHS[36] == "A"  # 3 + (0x41 - 0x20)
    assert STANDARD_MAC_GLYPHS[257] == "dcroat"


# ---------------------------------------------------------------------------
# embedded CFF (/FontFile3) — r04 verdict task #4. The builder below
# is an independent minimal CFF writer from Tech Note #5176 (INDEX
# layout, fixed-width op-29 offsets in the Top DICT, charset format
# 0, encoding format 0); the SID values for standard names are taken
# straight from Appendix A, not from the module's table.
# ---------------------------------------------------------------------------

CFF_TEST_SIDS = {"space": 1, "A": 34, "a": 66, "bullet": 116,
                 "eacute": 207}


def _cff_index_bytes(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    return (
        struct.pack(">HB", len(items), 2)
        + b"".join(struct.pack(">H", o) for o in offs)
        + b"".join(items)
    )


def build_cff(glyphs: list[str], codes_by_gid: list[int]) -> bytes:
    """Bare Type1C: gid 0 is .notdef; `glyphs[i]` names gid i+1;
    encoding format 0 assigns codes_by_gid[i] to gid i+1."""
    custom: list[bytes] = []
    sids = []
    for nm in glyphs:
        if nm in CFF_TEST_SIDS:
            sids.append(CFF_TEST_SIDS[nm])
        else:
            sids.append(391 + len(custom))
            custom.append(nm.encode("ascii"))
    header = bytes([1, 0, 4, 2])
    name_idx = _cff_index_bytes([b"TestFont"])
    string_idx = _cff_index_bytes(custom)
    gsubr_idx = _cff_index_bytes([])
    nglyphs = len(glyphs) + 1
    charstrings = _cff_index_bytes([b"\x0e"] * nglyphs)  # endchar
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    encoding = bytes([0, len(codes_by_gid)]) + bytes(codes_by_gid)
    top_dict_len = 18  # three ops, op-29 fixed 4-byte operands
    top_idx_len = len(_cff_index_bytes([b"\x00" * top_dict_len]))
    base = (
        len(header) + len(name_idx) + top_idx_len + len(string_idx)
        + len(gsubr_idx)
    )
    charset_off = base
    enc_off = charset_off + len(charset)
    cs_off = enc_off + len(encoding)
    top = (
        bytes([29]) + struct.pack(">i", charset_off) + bytes([15])
        + bytes([29]) + struct.pack(">i", enc_off) + bytes([16])
        + bytes([29]) + struct.pack(">i", cs_off) + bytes([17])
    )
    assert len(top) == top_dict_len
    return (
        header + name_idx + _cff_index_bytes([top]) + string_idx
        + gsubr_idx + charset + encoding + charstrings
    )


def _cff_font_objs(cff: bytes, flags: int = 4):
    return (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF"
        b" /FontDescriptor 6 0 R >>",
        {
            6: b"<< /Type /FontDescriptor /FontName /TestCFF"
               b" /Flags %d /FontFile3 7 0 R >>" % flags,
            7: b"<< /Length %d /Subtype /Type1C >>\nstream\n%s\nendstream"
               % (len(cff), cff),
        },
    )


def test_cff_unit_custom_encoding_and_charset():
    from two_tier_document_parser_spark.pdf_fonts import cff_code_map

    cff = build_cff(
        ["eacute", "uni0394", "bullet", "space"], [65, 66, 67, 32]
    )
    got = cff_code_map(cff)
    assert got == {65: "é", 66: "Δ", 67: "•", 32: " "}


def test_cff_unit_standard_encoding_and_junk():
    from two_tier_document_parser_spark.pdf_fonts import cff_code_map

    # predefined encoding 0 -> the Annex D Standard map
    custom: list[bytes] = []
    header = bytes([1, 0, 4, 2])
    name_idx = _cff_index_bytes([b"T"])
    string_idx = _cff_index_bytes(custom)
    gsubr_idx = _cff_index_bytes([])
    charstrings = _cff_index_bytes([b"\x0e"] * 2)
    base = None  # layout: charset fmt0 with one SID then charstrings
    charset = b"\x00" + struct.pack(">H", 34)  # gid1 = 'A'
    top_len = 18
    top_idx_len = len(_cff_index_bytes([b"\x00" * top_len]))
    base = (len(header) + len(name_idx) + top_idx_len
            + len(string_idx) + len(gsubr_idx))
    top = (
        bytes([29]) + struct.pack(">i", base) + bytes([15])
        + bytes([29]) + struct.pack(">i", 0) + bytes([16])
        + bytes([29]) + struct.pack(">i", base + len(charset)) + bytes([17])
    )
    cff = (header + name_idx + _cff_index_bytes([top]) + string_idx
           + gsubr_idx + charset + charstrings)
    got = cff_code_map(cff)
    assert got is not None and got[0x41] == "A" and got[0x27] == "’"
    # junk never raises
    assert cff_code_map(b"") is None
    assert cff_code_map(b"\x01\x00\x04\x02junkjunk") is None
    assert cff_code_map(b"not a font at all") is None


def test_cff_fontfile3_decodes_custom_encoded_text():
    """A symbolic font whose ONLY mapping lives in the embedded CFF
    program (no ToUnicode, no /Differences) must decode through the
    charset + built-in encoding instead of WinAnsi mojibake or
    quarantine."""
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    cff = build_cff(["eacute", "uni0394", "bullet"], [65, 66, 67])
    font, extra = _cff_font_objs(cff, flags=4)
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (ABC) Tj ET",
                               extra))
    assert doc is not None
    assert _texts(doc) == [("text", "éΔ•")]


def test_cff_truly_unmappable_glyphs_quarantine():
    """A symbolic CFF whose glyph names resolve to NOTHING under AGL
    keeps the quarantine rule — only truly unmappable fonts do."""
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    cff = build_cff(["glyphx1", "glyphx2"], [65, 66])
    font, extra = _cff_font_objs(cff, flags=4)
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (AB) Tj ET",
                               extra))
    assert doc is None  # shown text with no mapping -> quarantined


# ---------------------------------------------------------------------------
# bare Type 1 (/FontFile): cleartext /Encoding array
# ---------------------------------------------------------------------------

def _type1_program(pairs: dict[int, str]) -> bytes:
    body = b"%!PS-AdobeFont-1.0: TestT1 001.001\n"
    body += b"/FontName /TestT1 def\n/Encoding 256 array\n"
    body += b"0 1 255 {1 index exch /.notdef put} for\n"
    for code, name in pairs.items():
        body += b"dup %d /%s put\n" % (code, name.encode("ascii"))
    body += b"readonly def\ncurrentdict end\ncurrentfile eexec\n"
    body += b"\xa5\x13" * 40  # fake encrypted section
    return body


def test_type1_fontfile_cleartext_encoding_decodes():
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    t1 = _type1_program({65: "eacute", 66: "bullet", 67: "uni0416"})
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /TestT1"
        b" /FontDescriptor 6 0 R >>"
    )
    extra = {
        6: b"<< /Type /FontDescriptor /FontName /TestT1 /Flags 4"
           b" /FontFile 7 0 R >>",
        7: b"<< /Length %d /Length1 %d /Length2 0 /Length3 0 >>\n"
           b"stream\n%s\nendstream" % (len(t1), len(t1), t1),
    }
    doc = parse_pdf(_font_page(font, b"BT /F1 12 Tf 72 700 Td (ABC) Tj ET",
                               extra))
    assert doc is not None
    assert _texts(doc) == [("text", "é•Ж")]


def test_type1_pfb_segments_and_standard_encoding():
    from two_tier_document_parser_spark.pdf_fonts import type1_code_map

    ascii_part = (b"%!PS-AdobeFont-1.0\n"
                  b"/Encoding StandardEncoding def\n")
    pfb = (b"\x80\x01" + len(ascii_part).to_bytes(4, "little")
           + ascii_part
           + b"\x80\x02" + (8).to_bytes(4, "little") + b"\x00" * 8
           + b"\x80\x03")
    got = type1_code_map(pfb)
    assert got is not None and got[0x41] == "A" and got[0xA1] == "¡"
    assert type1_code_map(b"no encoding here") is None


def test_cff_stale_encoding_with_supplement_cursor():
    """Encoding format 0 with nCodes > nGlyphs-1 plus a supplement
    block: the cursor must skip the FULL code array so the
    supplement's (code, SID) pairs parse from the right offset
    (round-5 review finding — a stale subset encoding otherwise
    yields garbage mappings)."""
    import struct

    from two_tier_document_parser_spark.pdf_fonts import cff_code_map

    # hand-build: 2 real glyphs (gid 1 'space', gid 2 'bullet'),
    # encoding declares THREE codes (one stale), then a supplement
    # mapping code 90 -> SID of 'bullet'
    glyphs = ["space", "bullet"]
    sids = [CFF_TEST_SIDS["space"], CFF_TEST_SIDS["bullet"]]
    header = bytes([1, 0, 4, 2])
    name_idx = _cff_index_bytes([b"TestFont"])
    string_idx = _cff_index_bytes([])
    gsubr_idx = _cff_index_bytes([])
    nglyphs = len(glyphs) + 1
    charstrings = _cff_index_bytes([b"\x0e"] * nglyphs)
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    encoding = (
        bytes([0x80, 3])          # fmt 0 + supplement flag; nCodes=3
        + bytes([32, 67, 99])     # codes: gid1<-32, (gid2<-67), stale 99
        + bytes([1])              # nSups = 1
        + bytes([90]) + struct.pack(">H", CFF_TEST_SIDS["bullet"])
    )
    top_dict_len = 18
    top_idx_len = len(_cff_index_bytes([b"\x00" * top_dict_len]))
    base = (
        len(header) + len(name_idx) + top_idx_len + len(string_idx)
        + len(gsubr_idx)
    )
    charset_off = base
    enc_off = charset_off + len(charset)
    cs_off = enc_off + len(encoding)
    top = (
        bytes([29]) + struct.pack(">i", charset_off) + bytes([15])
        + bytes([29]) + struct.pack(">i", enc_off) + bytes([16])
        + bytes([29]) + struct.pack(">i", cs_off) + bytes([17])
    )
    cff = (
        header + name_idx + _cff_index_bytes([top]) + string_idx
        + gsubr_idx + charset + encoding + charstrings
    )
    got = cff_code_map(cff)
    # code 32 -> gid1 'space'; code 67 -> gid2 'bullet' (in-range);
    # stale code 99 has no glyph; supplement maps 90 -> 'bullet'
    assert got.get(32) == " "
    assert got.get(67) == "•"
    assert got.get(90) == "•"
    assert 99 not in got
