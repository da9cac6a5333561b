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
