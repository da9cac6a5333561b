"""Vectorized tier-1 "fast" extractor.

Engine counterpart of oracle/tier1.py — same semantics (reference
fast/service.py:11-97: whole-doc parse, poison-triggered per-page
fallback with 1-indexed skipped_pages and the verbatim placeholder,
jusText-style block classification), but implemented as batch
dataflow: `DataFrame.mapInArrow` receives Arrow record batches, the
span arrays are flattened zero-copy via the ListArray offsets, and all
per-span/per-block work happens in numpy/pandas column operations.
The only Python-level loops are over *blocks that survive
classification* (string join per block) — never per input row at the
Spark level (input_hint mandate: vectorized Arrow UDFs only).

Scale notes (100 TB): no shuffle — this is a map-only stage; one
Arrow batch is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
(set by pipeline.py) so giant docs cannot blow the Python worker heap;
skew is handled upstream by salting/repartition + page pre-split
(presplit.py), not here.
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import OUT_SCHEMA
from .spec import (
    STOP_UNION,
    T1_MAX_LINK_DENSITY,
    T1_MIN_BLOCK_CHARS,
    T1_MIN_STOP_DENSITY,
)

# span-class codes
PARA, CHROME, EMIT_H, EMIT_L, DROP, PB = 0, 1, 2, 3, 4, 5
_KIND_TO_CLS = {
    "text": PARA,
    "link_text": PARA,
    "table_cell": PARA,
    "boilerplate": CHROME,
    "heading": EMIT_H,
    "list_item": EMIT_L,
    "image": DROP,
    "formula": DROP,
    "box": DROP,
    "table_row_end": DROP,
    "page_break": PB,
}
_VOCAB = list(_KIND_TO_CLS)
_CLS_OF = np.array([_KIND_TO_CLS[k] for k in _VOCAB], dtype=np.int8)
# resolved block classes
GOOD, BAD, SHORT = 0, 1, 2

def _flatten_spans(batch: pa.RecordBatch):
    """ListArray of struct -> (counts per doc, flat kind/text/media)."""
    lst = batch.column("spans")
    if isinstance(lst, pa.ChunkedArray):  # defensive; batches are single-chunk
        lst = lst.combine_chunks()
    counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lst.flatten()
    return counts, flat.field("kind"), flat.field("text"), flat.field("media_ref")


def tier1_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        t0 = time.time()
        n_docs = batch.num_rows
        if n_docs == 0:
            continue
        doc_ids = batch.column("doc_id").to_pandas()
        counts, kind_a, text_a, _ = _flatten_spans(batch)
        total = int(counts.sum())

        kcode = pc.index_in(kind_a, value_set=pa.array(_VOCAB)).to_numpy(
            zero_copy_only=False
        )
        cls = _CLS_OF[kcode.astype(np.int64)] if total else np.empty(0, np.int8)
        texts = text_a.to_pandas()  # object-dtype strings
        doc_of = np.repeat(np.arange(n_docs), counts)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1][counts > 0]

        # page index = page_breaks strictly before span, per doc
        pb = (cls == PB).astype(np.int64)
        cs = np.cumsum(pb)
        ex = cs - pb
        base = np.repeat(ex[starts], counts[counts > 0]) if total else ex
        page = ex - base

        pages_per_doc = np.ones(n_docs, dtype=np.int64)
        if total:
            np.add.at(pages_per_doc, doc_of, pb)

        # poison detection (empty table_cell) -> per-(doc,page), per-doc
        empty_text = pc.equal(text_a, "").to_numpy(zero_copy_only=False)
        poison_row = (
            (kcode == _VOCAB.index("table_cell")) & empty_text
            if total
            else np.empty(0, bool)
        )
        fallback_doc = np.zeros(n_docs, dtype=bool)
        if total:
            np.logical_or.at(fallback_doc, doc_of[poison_row], True)

        # rows to drop: page_breaks always; all rows of poisoned pages in
        # fallback docs (the reference skips those pages entirely,
        # fast/service.py:60-67)
        poisoned_page_key: set[tuple[int, int]] = set()
        skipped_lists: list[list[int]] = [[] for _ in range(n_docs)]
        if poison_row.any():
            pp = pd.DataFrame(
                {"d": doc_of[poison_row], "p": page[poison_row]}
            ).drop_duplicates()
            for d, p in zip(pp["d"].to_numpy(), pp["p"].to_numpy()):
                poisoned_page_key.add((int(d), int(p)))
                skipped_lists[int(d)].append(int(p) + 1)
            for lst_ in skipped_lists:
                lst_.sort()
            drop_page = np.zeros(total, dtype=bool)
            # vectorized membership: key = d * BIG + p
            keys = doc_of * (page.max() + 1 if total else 1) + page
            bad_keys = np.array(
                [d * (page.max() + 1) + p for d, p in poisoned_page_key],
                dtype=np.int64,
            )
            drop_page = np.isin(keys, bad_keys) & fallback_doc[doc_of]
        else:
            drop_page = np.zeros(total, dtype=bool)

        keep = (cls != PB) & ~drop_page
        k_doc = doc_of[keep]
        k_page = page[keep]
        k_cls = cls[keep]
        k_text = texts[keep].reset_index(drop=True)
        k_link = (kcode[keep] == _VOCAB.index("link_text"))

        # block segmentation over kept rows
        nk = len(k_doc)
        if nk:
            same_prev = np.zeros(nk, dtype=bool)
            same_prev[1:] = (
                (k_doc[1:] == k_doc[:-1])
                & (k_page[1:] == k_page[:-1])
                & (k_cls[1:] == k_cls[:-1])
            )
            boundary = ~same_prev | np.isin(k_cls, (EMIT_H, EMIT_L))
            block_id = np.cumsum(boundary) - 1
        else:
            block_id = np.empty(0, dtype=np.int64)

        # per-row stats (only PARA/CHROME rows matter; EMIT rows pass through)
        is_para = np.isin(k_cls, (PARA, CHROME))
        nonempty = k_text.str.len().fillna(0).to_numpy() > 0
        stat_rows = is_para & nonempty
        char_len = np.where(stat_rows, k_text.str.len().fillna(0).to_numpy(), 0)
        link_len = np.where(stat_rows & k_link, char_len, 0)

        # token / stopword counts per row (for stop-density)
        tok_n = np.zeros(nk, dtype=np.int64)
        stop_n = np.zeros(nk, dtype=np.int64)
        if stat_rows.any():
            st = k_text[stat_rows].str.lower().str.split()
            ex_tok = st.explode()
            grp = ex_tok.groupby(level=0)
            tn = grp.size()
            sn = ex_tok.isin(STOP_UNION).groupby(level=0).sum()
            tok_n[tn.index.to_numpy()] = tn.to_numpy()
            stop_n[sn.index.to_numpy()] = sn.to_numpy()

        # per-block aggregation
        bf = pd.DataFrame(
            {
                "block": block_id,
                "doc": k_doc,
                "page": k_page,
                "cls": k_cls,
                "text": k_text,
                "chars": char_len,
                "link": link_len,
                "tok": tok_n,
                "stop": stop_n,
                "pieces": stat_rows.astype(np.int64),
                "emit_keep": (~is_para) | stat_rows,
            }
        )
        # join only the non-empty para pieces; EMIT rows keep their text
        if nk:
            g = bf.groupby("block", sort=True)
            blocks = g.agg(
                doc=("doc", "first"),
                page=("page", "first"),
                cls=("cls", "first"),
                chars=("chars", "sum"),
                link=("link", "sum"),
                tok=("tok", "sum"),
                stop=("stop", "sum"),
                pieces=("pieces", "sum"),
            )
            joined = (
                bf[bf["pieces"] > 0]
                .groupby("block", sort=True)["text"]
                .agg(" ".join)
            )
            blocks["joined"] = joined
            emit_text = bf[np.isin(bf["cls"], (EMIT_H, EMIT_L))].groupby(
                "block", sort=True
            )["text"].first()
            blocks.loc[emit_text.index, "joined"] = emit_text
            blocks["joined"] = blocks["joined"].fillna("")
            # The oracle never materializes blocks for dropped kinds or
            # for para runs whose pieces were all empty — they must not
            # take part in the SHORT-inherit chain either.
            blocks = blocks[
                np.isin(blocks["cls"], (EMIT_H, EMIT_L))
                | (blocks["pieces"].to_numpy(np.int64) > 0)
            ]
        else:
            blocks = pd.DataFrame(
                columns="doc page cls chars link tok stop pieces joined".split()
            )

        if len(blocks):
            is_emit = np.isin(blocks["cls"], (EMIT_H, EMIT_L))
            chars = blocks["chars"].to_numpy(np.float64)
            link = blocks["link"].to_numpy(np.float64)
            pieces = blocks["pieces"].to_numpy(np.int64)
            joined_len = blocks["joined"].str.len().to_numpy(np.int64)
            tok = blocks["tok"].to_numpy(np.float64)
            stop = blocks["stop"].to_numpy(np.float64)

            raw = np.full(len(blocks), BAD, dtype=np.int8)
            with np.errstate(invalid="ignore", divide="ignore"):
                ld = np.where(chars > 0, link / np.maximum(chars, 1), 0.0)
                sd = np.where(tok > 0, stop / np.maximum(tok, 1), 0.0)
            raw = np.where(ld > T1_MAX_LINK_DENSITY, BAD, GOOD).astype(np.int8)
            raw = np.where(
                (raw == GOOD) & (joined_len < T1_MIN_BLOCK_CHARS), SHORT, raw
            )
            raw = np.where(
                (raw == GOOD)
                & (joined_len >= T1_MIN_BLOCK_CHARS)
                & (sd < T1_MIN_STOP_DENSITY),
                BAD,
                raw,
            )
            raw = np.where(pieces == 0, BAD, raw)  # no pieces -> nothing
            raw = np.where(is_emit, GOOD, raw)

            # SHORT blocks inherit the previous non-short block's class
            # within their (doc, page); BAD at page start.
            s = pd.Series(
                np.where(raw == SHORT, np.nan, raw.astype(np.float64)),
                index=blocks.index,
            )
            ff = s.groupby(
                [blocks["doc"].to_numpy(), blocks["page"].to_numpy()]
            ).ffill()
            resolved = np.where(
                raw == SHORT, ff.fillna(BAD).to_numpy(), raw
            ).astype(np.int8)

            keep_block = (resolved == GOOD) & (
                (~is_emit & (pieces > 0)) | (is_emit & (joined_len > 0))
            )
            out_blocks = blocks[keep_block].copy()
            out_is_emit = is_emit[keep_block]
            out_cls = out_blocks["cls"].to_numpy()
            out_kind = np.where(
                out_cls == EMIT_H,
                "heading",
                np.where(out_cls == EMIT_L, "list_item", "text"),
            )
            out_blocks["kind"] = out_kind
        else:
            out_blocks = blocks.iloc[0:0].copy()
            out_blocks["kind"] = []

        # ---------------- output spans assembly ----------------
        ob_doc = out_blocks["doc"].to_numpy(np.int64) if len(out_blocks) else np.empty(0, np.int64)
        span_counts = np.zeros(n_docs, dtype=np.int64)
        if len(ob_doc):
            np.add.at(span_counts, ob_doc, 1)
        order = (
            np.arange(len(ob_doc))
            - np.repeat(
                np.concatenate([[0], np.cumsum(span_counts)])[:-1], span_counts
            )
            if len(ob_doc)
            else np.empty(0, np.int64)
        )

        # ---------------- markdown assembly ----------------
        if len(out_blocks):
            k = out_blocks["kind"].to_numpy()
            t = out_blocks["joined"].to_numpy()
            rendered = np.where(
                k == "heading", "## " + t.astype(object),
                np.where(k == "list_item", "- " + t.astype(object), t),
            )
            parts = (
                pd.DataFrame(
                    {
                        "doc": ob_doc,
                        "page": out_blocks["page"].to_numpy(np.int64),
                        "r": rendered,
                    }
                )
                .groupby(["doc", "page"], sort=True)["r"]
                .agg("\n\n".join)
            )
            parts_map = parts.to_dict()
        else:
            parts_map = {}

        markdowns = []
        for d in range(n_docs):
            np_d = int(pages_per_doc[d])
            skipped = set(skipped_lists[d])
            page_parts = []
            for p in range(np_d):
                if (p + 1) in skipped:
                    page_parts.append(
                        f"\n\n---\n**[Page {p + 1} skipped due to parsing error]**\n---\n\n"
                    )
                else:
                    page_parts.append(parts_map.get((d, p), ""))
            markdowns.append("\n\n".join(page_parts))

        # ---------------- build the Arrow output ----------------
        wall_ms = int((time.time() - t0) * 1000)
        span_offsets = np.concatenate([[0], np.cumsum(span_counts)]).astype(np.int32)
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(out_blocks["kind"].to_numpy() if len(out_blocks) else [], type=pa.string()),
                pa.array(out_blocks["joined"].to_numpy() if len(out_blocks) else [], type=pa.string()),
                pa.array([""] * len(out_blocks), type=pa.string()),
                pa.array(order.astype(np.int32), type=pa.int32()),
            ],
            names=["kind", "text", "media_ref", "order"],
        )
        spans_col = pa.ListArray.from_arrays(pa.array(span_offsets, type=pa.int32()), span_struct)
        skipped_col = pa.array(skipped_lists, type=pa.list_(pa.int32()))

        yield pa.RecordBatch.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(["fast"] * n_docs, type=pa.string()),
                pa.array(pages_per_doc.astype(np.int32), type=pa.int32()),
                spans_col,
                pa.array(markdowns, type=pa.string()),
                pa.array(np.zeros(n_docs, np.int32), type=pa.int32()),
                pa.array(np.zeros(n_docs, np.int32), type=pa.int32()),
                pa.array(np.zeros(n_docs, np.int32), type=pa.int32()),
                skipped_col,
                pa.array(np.full(n_docs, wall_ms, np.int64), type=pa.int64()),
                pa.array([""] * n_docs, type=pa.string()),
            ],
            names=[f.name for f in OUT_SCHEMA.fields],
        )


def tier1_map(df):
    """documents_raw (fast-routed) -> documents_out rows."""
    return df.select("doc_id", "spans").mapInArrow(tier1_batches, OUT_SCHEMA)
