"""Span -> markdown serialization (shared by oracle and engine).

Mirrors the reference's markdown emission: the fast tier returns the
whole document as one markdown string with page parts joined by
"\\n\\n" (reference fast/service.py:71), and the accurate tier
serializes the resolved span stream in multimodal-markdown mode
(union_make(pdf_info, MakeMode.MM_MD, "") — reference
accurate/service.py:125-133). Markdown is a pure function of the
output span sequence plus skipped-page placeholders, so it is defined
once here; snapshot tests (tests/fixtures/golden_markdown/) freeze the
results.
"""

from __future__ import annotations

from .spec import BLOCK_JOIN, PAGE_JOIN


def render_block(kind: str, text: str, media_ref: str) -> str:
    """One output span -> one markdown block."""
    if kind == "heading":
        return f"## {text}"
    if kind == "list_item":
        return f"- {text}"
    if kind == "table":
        return text  # already markdown (built by the table assembler)
    if kind == "image":
        # alt = upstream asset reference carried in `text`, target = the
        # engine-assigned artifact id (reference ImageData carries the
        # payload as base64 + positional id, accurate/service.py:179-184).
        return f"![{text}]({media_ref})"
    if kind == "formula":
        return f"$${text}$$"
    return text  # plain paragraph


def join_page(blocks: list[str]) -> str:
    return BLOCK_JOIN.join(blocks)


def join_pages(page_parts: list[str]) -> str:
    return PAGE_JOIN.join(page_parts)


def table_markdown(rows: list[list[str]]) -> str:
    """Rows of cells -> GitHub-style markdown table. The first row is
    the header; the separator width follows the header. Rows keep their
    own cell counts (no padding — deterministic and lossless)."""
    if not rows:
        return ""
    def line(cells: list[str]) -> str:
        return "| " + " | ".join(cells) + " |"
    sep = "| " + " | ".join(["---"] * len(rows[0])) + " |"
    return "\n".join([line(rows[0]), sep] + [line(r) for r in rows[1:]])
