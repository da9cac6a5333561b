"""Oracle tier-2 "deep" extractor (scalar, per-document).

Semantics mirror the reference accurate service
(accurate/service.py:119-238):

- per-page processing in page order (accurate/service.py:160);
- reading order within a page resolved over layout boxes by recursive
  XY-cut (our from-scratch analogue of MinerU's layout stage; content
  before the first box forms an implicit leading region);
- artifact ids `page_{p}_img_{i}` / `page_{p}_table_{i}` /
  `page_{p}_formula_{i}` where `i` is a per-document first-seen
  counter exactly as the reference's `len(images)` etc.
  (accurate/service.py:180,200,212);
- tables: cells grouped into rows by `table_row_end`; a table region
  with no cells falls back to its raw text (the content-else-html
  preference, accurate/service.py:190-196); empty -> no table emitted
  (:198);
- formulas with empty content are dropped (accurate/service.py:210);
- no boilerplate stripping (the deep tier is a full-fidelity layout
  parser, not a main-content heuristic).
"""

from __future__ import annotations

from two_tier_document_parser_spark.layout import parse_box, xycut
from two_tier_document_parser_spark.markdown_ser import (
    join_page,
    join_pages,
    render_block,
    table_markdown,
)
from .tier1 import split_pages


class _Emitter:
    """Accumulates output spans and per-document artifact counters.

    Every span carries the bbox of the layout region it was emitted
    from ([x0, y0, x1, y1] ints), or [] for content outside any box
    (implicit leading regions) — reference parity: artifacts carry the
    block bbox (accurate/models.py:8-29, accurate/service.py:177-216).
    """

    def __init__(self) -> None:
        self.spans: list[tuple[str, str, str, list[int]]] = []
        self.n_img = 0
        self.n_tab = 0
        self.n_form = 0
        self.bbox: list[int] = []

    def emit(self, kind: str, text: str, media_ref: str = "") -> None:
        self.spans.append((kind, text, media_ref, self.bbox))

    def emit_image(self, page: int, asset_ref: str) -> None:
        self.emit("image", asset_ref, f"page_{page}_img_{self.n_img}")
        self.n_img += 1

    def emit_formula(self, page: int, latex: str) -> None:
        if not latex:  # drop-if-empty, reference accurate/service.py:210
            return
        self.emit("formula", latex, f"page_{page}_formula_{self.n_form}")
        self.n_form += 1

    def emit_table(self, page: int, md: str) -> None:
        if not md:
            return
        self.emit("table", md, f"page_{page}_table_{self.n_tab}")
        self.n_tab += 1


def _process_text_region(content: list[dict], page: int, em: _Emitter) -> None:
    pieces: list[str] = []

    def flush() -> None:
        nonlocal pieces
        if pieces:
            em.emit("text", " ".join(pieces))
        pieces = []

    for s in content:
        kind, text = s["kind"], s["text"]
        if kind in ("text", "link_text", "boilerplate", "table_cell"):
            if text:
                pieces.append(text)
        elif kind == "heading":
            flush()
            if text:
                em.emit("heading", text)
        elif kind == "list_item":
            flush()
            if text:
                em.emit("list_item", text)
        elif kind == "image":
            flush()
            em.emit_image(page, s["media_ref"])
        elif kind == "formula":
            flush()
            em.emit_formula(page, text)
        # table_row_end: no-op in a text region
    flush()


def _process_table_region(content: list[dict], page: int, em: _Emitter) -> None:
    rows: list[list[str]] = []
    cur: list[str] = []
    fallback: list[str] = []
    extras: list[dict] = []
    for s in content:
        kind, text = s["kind"], s["text"]
        if kind == "table_cell":
            cur.append(text)
        elif kind == "table_row_end":
            if cur:
                rows.append(cur)
            cur = []
        elif kind in ("image", "formula"):
            extras.append(s)
        elif text:  # any text-ish span becomes the fallback rendering
            fallback.append(text)
    if cur:
        rows.append(cur)
    if rows:
        em.emit_table(page, table_markdown(rows))
    elif fallback:
        em.emit_table(page, " ".join(fallback))
    for s in extras:
        if s["kind"] == "image":
            em.emit_image(page, s["media_ref"])
        else:
            em.emit_formula(page, s["text"])


def tier2_extract(doc: dict) -> dict:
    pages = split_pages(doc["spans"])
    em = _Emitter()
    page_parts: list[str] = []
    for p, page in enumerate(pages):
        # segment the stream into box-delimited regions
        regions: list[tuple[tuple[int, int, int, int], str, list[dict]]] = []
        leading: list[dict] = []
        for s in page:
            if s["kind"] == "box":
                x0, y0, x1, y1, rk = parse_box(s["text"])
                regions.append(((x0, y0, x1, y1), rk, []))
            elif regions:
                regions[-1][2].append(s)
            else:
                leading.append(s)

        start = len(em.spans)
        if leading:
            em.bbox = []
            _process_text_region(leading, p, em)
        for i in xycut([r[0] for r in regions]):
            box, rk, content = regions[i]
            em.bbox = list(box)
            if rk == "table":
                _process_table_region(content, p, em)
            else:
                _process_text_region(content, p, em)
        page_parts.append(
            join_page([render_block(k, t, m) for k, t, m, _ in em.spans[start:]])
        )

    return {
        "doc_id": doc["doc_id"],
        "tier": "deep",
        "pages": len(pages),
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "order": o, "bbox": b}
            for o, (k, t, m, b) in enumerate(em.spans)
        ],
        "markdown": join_pages(page_parts),
        "n_images": em.n_img,
        "n_tables": em.n_tab,
        "n_formulas": em.n_form,
        "skipped_pages": [],
        "error": "",
    }
