"""Differential testing beyond the frozen corpus: generate fresh
corpora from seeds the fixtures never saw and require the vectorized
kernels to match the scalar oracle exactly (spans, markdown,
metadata). Runs the kernels directly (no Spark session) so it's cheap
enough to sweep many seeds."""

from __future__ import annotations

import pyarrow as pa
import pytest

from oracle import extract_doc, route_doc
from two_tier_document_parser_spark.synth import synth_docs
from two_tier_document_parser_spark.tier1 import tier1_batches
from two_tier_document_parser_spark.tier2 import tier2_batches


def _run_kernel(fn, docs):
    if not docs:
        return {}
    batch = pa.RecordBatch.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs]
    )
    out = {}
    for ob in fn(iter([batch])):
        for row in ob.to_pylist():
            out[row["doc_id"]] = row
    return out


def _mk_adv_doc(spans_spec, doc_class):
    return {
        "doc_id": "adv0",
        "doc_class": doc_class,
        "n_pages": 1,
        "spans": [
            {"kind": k, "text": t, "media_ref": "", "offset": i}
            for i, (k, t) in enumerate(spans_spec)
        ],
    }


def test_adversarial_spans_match_or_error():
    """Hypothesis fuzz beyond the synth distribution: arbitrary span
    sequences (all producer kinds, arbitrary unicode text, valid and
    MALFORMED box payloads). Contract: the vectorized kernel output
    equals the oracle whenever the oracle accepts the document, and a
    document the oracle rejects becomes a quarantined tier='error' row
    with zero spans — never an exception (poison-doc rule; reference
    accurate/service.py:240-246)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    kinds = st.sampled_from(
        [
            "text", "heading", "list_item", "table_cell", "table_row_end",
            "image", "formula", "link_text", "boilerplate", "page_break",
            "box",
        ]
    )
    free_text = st.text(max_size=24)
    box_text = st.one_of(
        st.tuples(
            st.integers(0, 90), st.integers(0, 90),
            st.integers(1, 20), st.integers(1, 20),
            st.sampled_from(["text", "table", "figure", "formula"]),
        ).map(lambda t: f"{t[0]},{t[1]},{t[0]+t[2]},{t[1]+t[3]},{t[4]}"),
        free_text,  # malformed payloads exercise the error channel
    )
    span_spec = kinds.flatmap(
        lambda k: st.tuples(st.just(k), box_text if k == "box" else free_text)
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(span_spec, min_size=1, max_size=30),
        st.sampled_from(["html", "pdf", "scan", "mixed", "unknown"]),
    )
    def check(spans_spec, doc_class):
        doc = _mk_adv_doc(spans_spec, doc_class)
        tier = route_doc(doc)
        fn = tier1_batches if tier == "fast" else tier2_batches
        got = _run_kernel(fn, [doc])[doc["doc_id"]]
        try:
            exp = extract_doc(doc)
        except Exception:
            assert got["tier"] == "error", got
            assert len(got["spans"]) == 0
            return
        assert [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in got["spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in exp["spans"]
        ]
        assert got["markdown"] == exp["markdown"]

    check()


def test_facade_bit_identical_to_batch_kernels():
    """api.parse_document runs the engine's own kernels on a one-row
    batch: its markdown and artifact lists must equal the batch
    output row for the same document (the facade's 'switching is
    mechanical' contract)."""
    from two_tier_document_parser_spark.api import parse_document

    docs = synth_docs(0, 60, 2024)
    fast = [d for d in docs if route_doc(d) == "fast"]
    deep = [d for d in docs if route_doc(d) == "deep"]
    batch_out = _run_kernel(tier1_batches, fast) | _run_kernel(
        tier2_batches, deep
    )
    for d in docs:
        row = batch_out[d["doc_id"]]
        resp = parse_document(d)
        assert resp["markdown"] == row["markdown"], d["doc_id"]
        assert resp["metadata"]["pages"] == row["pages"]
        if route_doc(d) == "deep":
            assert len(resp["images"]) == row["n_images"]
            assert len(resp["tables"]) == row["n_tables"]
            assert len(resp["formulas"]) == row["n_formulas"]
            got_ids = [i["image_id"] for i in resp["images"]]
            exp_ids = [
                s["media_ref"] for s in row["spans"] if s["kind"] == "image"
            ]
            assert got_ids == exp_ids
            # bbox surfaces from the span geometry
            for img, s in zip(
                resp["images"],
                [s for s in row["spans"] if s["kind"] == "image"],
            ):
                assert img["bbox"] == (list(s["bbox"]) or None)


@pytest.mark.parametrize("seed", [7, 123, 999, 31337, 271828])
def test_kernels_match_oracle_fresh_seeds(seed):
    docs = synth_docs(0, 120, seed)
    fast = [d for d in docs if route_doc(d) == "fast"]
    deep = [d for d in docs if route_doc(d) == "deep"]
    got = _run_kernel(tier1_batches, fast) | _run_kernel(tier2_batches, deep)
    assert len(got) == len(docs)
    for d in docs:
        exp = extract_doc(d)
        g = got[d["doc_id"]]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in exp["spans"]
        ], d["doc_id"]
        assert g["markdown"] == exp["markdown"], d["doc_id"]
        assert g["pages"] == exp["pages"]
        assert list(g["skipped_pages"]) == exp["skipped_pages"]
        assert (g["n_images"], g["n_tables"], g["n_formulas"]) == (
            exp["n_images"], exp["n_tables"], exp["n_formulas"],
        )
