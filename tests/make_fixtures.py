"""Regenerate golden fixtures from the oracle (SURVEY §5.2.1).

Run: python tests/make_fixtures.py
Writes tests/fixtures/ — committed to the repo and treated as frozen;
any change to synth/oracle semantics shows up as a fixture diff that
must be reviewed deliberately.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle import extract_doc, route_doc  # noqa: E402
from two_tier_document_parser_spark.synth import synth_docs  # noqa: E402

N_DOCS = 500
SEED = 42
FIX = Path(__file__).parent / "fixtures"


def spans_key(spans: list[dict]) -> str:
    canon = json.dumps(
        [[s["kind"], s["text"], s["media_ref"], s["order"]] for s in spans],
        ensure_ascii=False,
        separators=(",", ":"),
    )
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def bbox_key(spans: list[dict]) -> str:
    """Geometry hash, separate from the (kind, text, media_ref, order)
    equality invariant: bboxes are exact ints but the north-rule
    invariant deliberately excludes geometry (SURVEY §7.7.4)."""
    canon = json.dumps(
        [list(s["bbox"]) for s in spans], separators=(",", ":")
    )
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def md_key(md: str) -> str:
    return hashlib.sha256(md.encode("utf-8")).hexdigest()


def main() -> None:
    FIX.mkdir(exist_ok=True)
    (FIX / "golden_markdown").mkdir(exist_ok=True)
    docs = synth_docs(0, N_DOCS, SEED)
    hashes: dict[str, dict] = {}
    sample: dict[str, list] = {}
    routing: dict[str, str] = {}
    md_snapshot_ids: list[str] = []

    for idx, doc in enumerate(docs):
        out = extract_doc(doc)
        routing[doc["doc_id"]] = route_doc(doc)
        hashes[doc["doc_id"]] = {
            "tier": out["tier"],
            "pages": out["pages"],
            "n_spans": len(out["spans"]),
            "n_images": out["n_images"],
            "n_tables": out["n_tables"],
            "n_formulas": out["n_formulas"],
            "skipped_pages": out["skipped_pages"],
            "spans_sha": spans_key(out["spans"]),
            "bbox_sha": bbox_key(out["spans"]),
            "md_sha": md_key(out["markdown"]),
        }
        if idx < 40:
            sample[doc["doc_id"]] = [
                [s["kind"], s["text"], s["media_ref"], s["order"], s["bbox"]]
                for s in out["spans"]
            ]
        # markdown snapshots: a diverse dozen small docs
        want = (
            (out["tier"] == "fast" and out["skipped_pages"] and len(md_snapshot_ids) < 4)
            or (out["tier"] == "deep" and out["n_tables"] > 0 and out["n_formulas"] > 0
                and out["pages"] <= 3 and 4 <= len(md_snapshot_ids) < 9)
            or (out["tier"] == "fast" and not out["skipped_pages"] and out["pages"] <= 2
                and 9 <= len(md_snapshot_ids) < 12)
        )
        if want:
            md_snapshot_ids.append(doc["doc_id"])
            (FIX / "golden_markdown" / f"{doc['doc_id']}.md").write_text(
                out["markdown"], encoding="utf-8"
            )

    (FIX / "golden_hashes.json").write_text(
        json.dumps(hashes, indent=0, sort_keys=True), encoding="utf-8"
    )
    (FIX / "golden_spans_sample.json").write_text(
        json.dumps(sample, ensure_ascii=False, sort_keys=True), encoding="utf-8"
    )
    (FIX / "routing_expected.json").write_text(
        json.dumps(routing, indent=0, sort_keys=True), encoding="utf-8"
    )
    (FIX / "md_snapshot_ids.json").write_text(
        json.dumps(md_snapshot_ids), encoding="utf-8"
    )
    print(f"wrote fixtures for {N_DOCS} docs; {len(md_snapshot_ids)} md snapshots")


if __name__ == "__main__":
    main()
