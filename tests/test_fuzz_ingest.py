"""Property-based fuzzing of the raw-bytes ingestion parsers
(hypothesis). Two properties:

1. **Crash safety (O19)**: parse_html / parse_pdf / TTDP decode must
   return a row-or-quarantine for ANY byte string — arbitrary junk,
   or valid payloads corrupted by truncation/bit-flips — and never
   raise. A single malformed document must not kill a 10^12-doc job.
2. **Round-trip totality**: parse(render(x)) == x on the whole
   well-formed span domain, not just the synthetic corpus's
   distribution — arbitrary unicode text (entities-worthy chars,
   CJK, quotes), any kind mix, any page structure.

The well-formed domain (documented in html_io/pdf_io): span text is
whitespace-normalized (no leading/trailing/duplicate whitespace, no
control chars), and plain `text` spans don't begin with the PDF
bullet glyph (that prefix IS the list-item encoding)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

_norm = lambda t: re.sub(r"\s+", " ", t).strip()

# visible unicode incl. HTML/PDF-special chars and CJK
_text = st.text(
    alphabet=st.sampled_from(
        list("abc ABC&<>\"'()\\{}/%#;=") + list("éüñ数据文档αβ–—…")
    ),
    max_size=40,
).map(_norm).filter(lambda t: not t.startswith("• "))

_ref = st.one_of(
    st.just(""), st.from_regex(r"[a-z0-9_/:.?=&-]{1,20}", fullmatch=True)
)


@st.composite
def _span(draw):
    kind = draw(
        st.sampled_from(
            ["text", "heading", "list_item", "table_cell", "table_row_end",
             "image", "formula", "link_text", "boilerplate", "box"]
        )
    )
    if kind == "table_row_end":
        return (kind, "", "")
    if kind == "image":
        return (kind, draw(_text), draw(_ref))
    if kind == "link_text":
        t = draw(_text.filter(bool))  # empty links don't round-trip
        return (kind, t, draw(_ref))
    if kind in ("heading", "list_item", "boilerplate"):
        return (kind, draw(_text.filter(bool)), "")
    if kind == "box":
        return (kind, draw(_text), "")
    return (kind, draw(_text), "")  # text / table_cell / formula


@st.composite
def _doc(draw):
    n_pages = draw(st.integers(1, 3))
    spans: list[tuple[str, str, str]] = []
    for p in range(n_pages):
        if p:
            spans.append(("page_break", "", ""))
        for s in draw(st.lists(_span(), max_size=8)):
            # empty plain-text/boilerplate-ish spans are not emitted by
            # either parser; keep the stream in the well-formed domain
            if s[0] in ("text", "boilerplate") and not s[1]:
                continue
            spans.append(s)
    return {
        "doc_id": "f0",
        "doc_class": draw(st.sampled_from(["html", "pdfish"])),
        "n_pages": n_pages,
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": i}
            for i, (k, t, r) in enumerate(spans)
        ],
    }


@settings(max_examples=200, deadline=None)
@given(_doc())
def test_html_roundtrip_on_generated_domain(doc):
    from two_tier_document_parser_spark.html_io import parse_html, render_html

    got = parse_html(render_html(doc))
    assert got == {
        "doc_class": doc["doc_class"],
        "n_pages": doc["n_pages"],
        "spans": doc["spans"],
    }


@settings(max_examples=200, deadline=None)
@given(_doc())
def test_pdf_roundtrip_on_generated_domain(doc):
    from two_tier_document_parser_spark.pdf_io import parse_pdf, render_pdf

    got = parse_pdf(render_pdf(doc))
    assert got == {
        "doc_class": doc["doc_class"],
        "n_pages": doc["n_pages"],
        "spans": doc["spans"],
    }


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_parsers_never_raise_on_junk(payload):
    from two_tier_document_parser_spark.html_io import parse_html
    from two_tier_document_parser_spark.pdf_io import parse_pdf

    for fn in (parse_html, parse_pdf):
        out = fn(payload)
        assert out is None or isinstance(out, dict)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 10_000),      # corruption offset seed
    st.integers(0, 255),         # replacement byte
    st.sampled_from(["pdf", "html", "truncate_pdf", "truncate_html"]),
)
def test_parsers_never_raise_on_corrupted_valid_payloads(off, b, mode):
    """Bit-flip or truncate a VALID payload: the parser may quarantine
    or may still produce a partial row, but must never raise."""
    from two_tier_document_parser_spark.html_io import parse_html, render_html
    from two_tier_document_parser_spark.pdf_io import parse_pdf, render_pdf
    from two_tier_document_parser_spark.synth import make_doc

    doc = make_doc(5)
    if "pdf" in mode:
        payload, fn = render_pdf(doc), parse_pdf
    else:
        payload, fn = render_html(doc), parse_html
    if mode.startswith("truncate"):
        payload = payload[: off % (len(payload) + 1)]
    else:
        i = off % len(payload)
        payload = payload[:i] + bytes([b]) + payload[i + 1 :]
    out = fn(payload)
    assert out is None or isinstance(out, dict)
