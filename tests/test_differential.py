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
