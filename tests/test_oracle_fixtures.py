"""Frozen-fixture guard: synth + oracle must reproduce the committed
goldens exactly (any semantic drift must be a deliberate fixture
regeneration, reviewed in the diff)."""

from __future__ import annotations

import json

from conftest import FIXTURES
from oracle import extract_doc, route_doc
from two_tier_document_parser_spark.synth import synth_docs
from make_fixtures import N_DOCS, SEED, bbox_key, md_key, spans_key


def test_oracle_matches_frozen_goldens():
    golden = json.loads((FIXTURES / "golden_hashes.json").read_text())
    routing = json.loads((FIXTURES / "routing_expected.json").read_text())
    sample = json.loads(
        (FIXTURES / "golden_spans_sample.json").read_text(encoding="utf-8")
    )
    snap_ids = set(json.loads((FIXTURES / "md_snapshot_ids.json").read_text()))

    docs = synth_docs(0, N_DOCS, SEED)
    assert len(docs) == len(golden) == N_DOCS
    for doc in docs:
        out = extract_doc(doc)
        g = golden[doc["doc_id"]]
        assert route_doc(doc) == routing[doc["doc_id"]]
        assert out["tier"] == g["tier"]
        assert out["pages"] == g["pages"]
        assert out["skipped_pages"] == g["skipped_pages"]
        assert (out["n_images"], out["n_tables"], out["n_formulas"]) == (
            g["n_images"], g["n_tables"], g["n_formulas"],
        )
        assert spans_key(out["spans"]) == g["spans_sha"], doc["doc_id"]
        assert bbox_key(out["spans"]) == g["bbox_sha"], doc["doc_id"]
        assert md_key(out["markdown"]) == g["md_sha"], doc["doc_id"]
        if doc["doc_id"] in sample:
            assert [
                [s["kind"], s["text"], s["media_ref"], s["order"], s["bbox"]]
                for s in out["spans"]
            ] == sample[doc["doc_id"]]
        if doc["doc_id"] in snap_ids:
            frozen = (
                FIXTURES / "golden_markdown" / f"{doc['doc_id']}.md"
            ).read_text(encoding="utf-8")
            assert out["markdown"] == frozen, doc["doc_id"]


def test_corpus_shape():
    """The corpus exercises every extraction path (FIXTURES.md §1)."""
    docs = synth_docs(0, N_DOCS, SEED)
    sizes = sorted(len(d["spans"]) for d in docs)
    median = sizes[len(sizes) // 2]
    assert sizes[-1] >= 100 * median  # giant docs present (skew driver)
    classes = {d["doc_class"] for d in docs}
    assert classes == {"html", "pdfish"}
    outs = [extract_doc(d) for d in docs]
    assert any(o["skipped_pages"] for o in outs)  # fallback path hit
    assert any(o["n_tables"] > 0 for o in outs)
    assert any(o["n_images"] > 0 for o in outs)
    assert any(o["n_formulas"] > 0 for o in outs)
    tiers = {o["tier"] for o in outs}
    assert tiers == {"fast", "deep"}
