"""HTML ingestion (html_io): from-scratch DOM lift of raw HTML bytes
into the producer span vocabulary, plus the render inverse.

Covers: exact render->parse round trip over the full synthetic corpus
(every IN_KIND, poison cells, empty formulas, page breaks, boxes),
hand-written sloppy real-world HTML (entities, unquoted/single-quoted
attrs, implied closes, script/style/head dropping, whitespace
collapse, chrome containers), the quarantine path, the Spark
mapInArrow table operators, and the full extraction cascade over
parsed HTML bytes."""

from __future__ import annotations

from pathlib import Path

import pytest

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not Path(SF).exists(), reason="driver testdata not present"
)


def _doc(spans, doc_class="html", n_pages=1):
    return {
        "doc_id": "t0",
        "doc_class": doc_class,
        "n_pages": n_pages,
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": i}
            for i, (k, t, r) in enumerate(spans)
        ],
    }


def test_roundtrip_synth_corpus_exact():
    """parse(render(doc)) reproduces every synthetic document's
    (doc_class, n_pages, span sequence) bit-exactly — all kinds,
    poison markers, empty formulas, giant docs included."""
    from two_tier_document_parser_spark.html_io import (
        parse_html,
        render_html,
    )
    from two_tier_document_parser_spark.synth import synth_docs

    for doc in synth_docs(0, 500):
        got = parse_html(render_html(doc))
        assert got == {
            "doc_class": doc["doc_class"],
            "n_pages": doc["n_pages"],
            "spans": doc["spans"],
        }, doc["doc_id"]


def test_charset_sniffing():
    """WHATWG-style sniffing (round-2 verdict gap #2): BOMs, <meta
    charset> prescan, windows-1252 fallback for legacy bytes that are
    not valid UTF-8 — none of these quarantine any longer."""
    from two_tier_document_parser_spark.html_io import parse_html

    body = "<html><body><p>café — naïve</p></body></html>"

    def texts(doc):
        return [s["text"] for s in doc["spans"]]

    # utf-8 BOM
    got = parse_html(b"\xef\xbb\xbf" + body.encode("utf-8"))
    assert texts(got) == ["café — naïve"]
    # utf-16 LE / BE with BOM (codec emits the BOM for 'utf-16';
    # explicit-endian + hand BOM for BE)
    got = parse_html(body.encode("utf-16"))
    assert texts(got) == ["café — naïve"]
    got = parse_html(b"\xfe\xff" + body.encode("utf-16-be"))
    assert texts(got) == ["café — naïve"]
    # declared windows-1252: 0xE9 e-acute, 0x97 em-dash (cp1252-only)
    raw = (
        b'<html><head><meta charset="windows-1252"></head>'
        b"<body><p>caf\xe9 \x97 ok</p></body></html>"
    )
    assert texts(parse_html(raw)) == ["caf\xe9 — ok"]
    # http-equiv form, iso-8859-1 label resolves to windows-1252
    raw = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1"></head>'
        b"<body><p>caf\xe9</p></body></html>"
    )
    assert texts(parse_html(raw)) == ["caf\xe9"]
    # declared shift_jis
    raw = (
        b'<html><head><meta charset="shift_jis"></head><body><p>'
        + "日本語".encode("shift_jis")
        + b"</p></body></html>"
    )
    assert texts(parse_html(raw)) == ["日本語"]
    # UNLABELED legacy bytes: invalid UTF-8 falls back to
    # windows-1252 instead of quarantining
    raw = b"<html><body><p>r\xe9sum\xe9</p></body></html>"
    assert texts(parse_html(raw)) == ["r\xe9sum\xe9"]
    # WHATWG w1252 hole byte 0x81 maps to C1 control, not an error
    assert parse_html(b"<html><body><p>a\x81b</p></body></html>") is not None
    # mislabeled (claims utf-8, bytes are cp1252): decodes via
    # fallback rather than quarantining
    raw = (
        b'<html><head><meta charset="utf-8"></head>'
        b"<body><p>caf\xe9</p></body></html>"
    )
    assert texts(parse_html(raw)) == ["caf\xe9"]
    # truly undecodable: utf-16 BOM + odd byte count still quarantines
    assert parse_html(b"\xfe\xff\x00a\x00b\x41") is None
    # NUL-bearing junk still quarantines after decode
    assert parse_html(b"<p>a</p>\x00junk") is None


def test_tokenless_doc_roundtrips_empty_text_span():
    """A token-less document chunks to ONE empty text span
    (adapter.documents_to_raw: greatest(ceil(n/w), 1)); render_html
    writes it as <p></p> and parse_html must emit it back — round-2
    advice: without this, html_ingest's token-less oracle union
    mismatches on any corpus containing an empty document."""
    from two_tier_document_parser_spark.html_io import (
        parse_html,
        render_html,
    )

    doc = _doc([("text", "", "")])
    got = parse_html(render_html(doc))
    assert got["spans"] == doc["spans"]
    # direct foreign form too, and only content-context <p> emits
    got2 = parse_html(b"<html><body><p></p></body></html>")
    assert [(s["kind"], s["text"]) for s in got2["spans"]] == [("text", "")]
    got3 = parse_html(b"<html><body><nav><p></p></nav></body></html>")
    assert got3["spans"] == []


def test_sloppy_real_world_html():
    from two_tier_document_parser_spark.html_io import parse_html

    h = (
        b"<!DOCTYPE html><html><head><title>T</title>"
        b'<script>var x="<p>no</p>";</script><style>p{}</style></head>'
        b"<body>\n<H1>Big &amp; Bold</H1>\n"
        b"<p>Hello <b>world</b>, this is &lt;fine&gt;.</p>\n"
        b"<nav><ul><li>Home</li></ul><p>chrome text</p></nav>\n"
        b"<ul><li>Item <a href='/x?a=1&amp;b=2'>link</a> tail</li></ul>\n"
        b"<table><tr><td><p>cell para</p> extra</td><td></td>"
        b"<tr><td>c</td></table>\n"
        b"<img src=pic.png alt='A pic'><math></math>\n"
        b"<p>Unclosed paragraph\n</body></html>"
    )
    got = [
        (s["kind"], s["text"], s["media_ref"])
        for s in parse_html(h)["spans"]
    ]
    assert got == [
        ("heading", "Big & Bold", ""),          # head content dropped
        ("text", "Hello world, this is <fine>.", ""),  # one block
        ("list_item", "Home", ""),
        ("boilerplate", "chrome text", ""),     # <nav> context
        ("link_text", "link", "/x?a=1&b=2"),    # entity-decoded href
        ("list_item", "Item tail", ""),         # text around the <a>
        ("table_cell", "cell para extra", ""),  # <p> passes through
        ("table_cell", "", ""),                 # empty cell emits
        ("table_cell", "c", ""),                # implied </tr>: no row_end
        ("image", "A pic", "pic.png"),          # unquoted src attr
        ("formula", "", ""),                    # empty math emits
        ("text", "Unclosed paragraph", ""),     # implied close at </body>
    ]


def test_quarantine_on_bad_bytes():
    from two_tier_document_parser_spark.html_io import parse_html

    # utf-16 BOM + odd payload length is truly undecodable; an EVEN
    # length now decodes as (mojibake) utf-16 instead of quarantining
    # since the charset sniffer landed
    assert parse_html(b"\xff\xfe\x00 not utf8 \x80\x41") is None
    deep = b"<div>" * 2000
    assert parse_html(deep) is None
    # plain text without any tags is still a (trivial) document
    assert parse_html(b"just words")["spans"][0]["kind"] == "text"


def test_row_end_only_on_explicit_tr_close():
    from two_tier_document_parser_spark.html_io import (
        parse_html,
        render_html,
    )

    # lone unterminated cell (the poison shape): no table_row_end
    doc = _doc([("table_cell", "", ""), ("text", "after", "")])
    got = parse_html(render_html(doc))
    assert [s["kind"] for s in got["spans"]] == ["table_cell", "text"]
    # explicitly terminated row keeps its row_end
    doc2 = _doc(
        [("table_cell", "a", ""), ("table_row_end", "", ""),
         ("text", "after", "")]
    )
    got2 = parse_html(render_html(doc2))
    assert [s["kind"] for s in got2["spans"]] == [
        "table_cell", "table_row_end", "text",
    ]


def test_spark_roundtrip_and_cascade(spark):
    """Table-level: synth corpus -> HTML bytes -> parsed spans equals
    the original rows, and the parsed table drives the full two-tier
    cascade (routing + extraction run on HTML-borne documents)."""
    from pyspark.sql import functions as F

    from two_tier_document_parser_spark.html_io import (
        parse_table,
        render_table,
    )
    from two_tier_document_parser_spark.pipeline import (
        extract,
        ship_package,
    )
    from two_tier_document_parser_spark.synth import synth_spark

    ship_package(spark)
    raw = synth_spark(spark, 200, partitions=4)
    back = parse_table(render_table(raw))
    a = {r["doc_id"]: r.asDict(recursive=True) for r in raw.collect()}
    b = {r["doc_id"]: r.asDict(recursive=True) for r in back.collect()}
    assert a == b
    out = extract(spark, back, persist=False)
    tiers = {
        r["tier"]: r["n"]
        for r in out.groupBy("tier").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert tiers.get("fast", 0) > 0 and tiers.get("deep", 0) > 0
    assert sum(tiers.values()) == 200


def test_spark_quarantine_rows(spark):
    from two_tier_document_parser_spark.html_io import parse_table
    from two_tier_document_parser_spark.pipeline import ship_package

    ship_package(spark)
    bad = spark.createDataFrame(
        # utf-16 BOM + odd byte count: undecodable even after the
        # charset sniffer (plain invalid-utf-8 now w1252-decodes)
        [("b0", bytearray(b"\xfe\xff\x41")), ("b1", bytearray(b"<p>ok</p>"))],
        "doc_id string, payload binary",
    )
    rows = {r["doc_id"]: r for r in parse_table(bad).collect()}
    assert rows["b0"]["doc_class"] == "" and rows["b0"]["spans"] == []
    assert rows["b1"]["spans"][0]["kind"] == "text"


def test_html5_sibling_implied_closes_and_rawtext():
    """Review-finding regressions: unclosed <li>/<td> siblings close in
    document order (HTML5 optional end tags), script/style content is
    raw text until the FIRST close tag (markup inside a JS string does
    not nest), a raw '<' before a non-letter is character data, and
    data-box* attribute prefixes don't fabricate box spans."""
    from two_tier_document_parser_spark.html_io import parse_html

    k = lambda h: [(s["kind"], s["text"]) for s in parse_html(h)["spans"]]
    assert k(b"<ul><li>one<li>two</ul>") == [
        ("list_item", "one"), ("list_item", "two"),
    ]
    assert k(b"<table><tr><td>a<td>b</tr></table>") == [
        ("table_cell", "a"), ("table_cell", "b"), ("table_row_end", ""),
    ]
    assert k(b'<script>var s="<script>";</script><p>hello</p>') == [
        ("text", "hello"),
    ]
    assert k(b"<p>5 < 6 and x > y</p>") == [("text", "5 < 6 and x > y")]
    assert k(b'<div data-boxed="1">t</div>') == [("text", "t")]
    assert k(b"<p>one<p>two") == [("text", "one"), ("text", "two")]


def test_binary_junk_quarantines_without_nul():
    """Round-3 advice: the total w1252 fallback must not turn NUL-free
    binary fragments into mojibake 'html' documents. C0/C1 control
    density gates the unlabeled fallback; real legacy text (sparse or
    zero controls) still decodes."""
    from two_tier_document_parser_spark.html_io import (
        decode_html_bytes,
        parse_html,
    )

    # JPEG-ish header + dense low bytes, no NUL anywhere
    junk = b"\xff\xd8\xff\xe0" + bytes(range(1, 9)) * 40 + b"\xff\x80?"
    assert b"\x00" not in junk
    assert parse_html(junk) is None
    # the original round-2 weakened case now quarantines again
    assert decode_html_bytes(b"\x01\x02\x03\x04\x05\x06\x07\x08" * 16) is None
    # legacy cp1252 text with curly quotes and an accented char still
    # decodes through the fallback (no control density)
    legacy = b"<p>caf\xe9 \x93quoted\x94 \x97 dash</p>"
    got = parse_html(b"<html><body>" + legacy + b"</body></html>")
    assert got is not None
    assert "caf\xe9" in got["spans"][0]["text"]
    # a lone stray control char in otherwise-real text stays below
    # the threshold
    mostly_text = b"<p>" + b"real words here " * 40 + b"\x01</p>"
    assert decode_html_bytes(mostly_text) is not None
