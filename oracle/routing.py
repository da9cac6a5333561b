"""Tier routing: pure function of row content (SURVEY §7.7.2).

The reference leaves tier choice to the caller (port 8004 vs 8005,
examples/demo_client.py:25; README.md:303-306 recommends "fast for
filtering, accurate for complex docs"). The engine makes that decision
data-driven: a per-doc_class threshold model over structural features.
"""

from __future__ import annotations

from two_tier_document_parser_spark.spec import (
    MEDIA_KINDS,
    ROUTING_DEFAULT,
    ROUTING_MODEL,
    T1_MAX_SPANS,
    T2_MAX_SPANS,
)


def route_doc(doc: dict) -> str:
    spans = doc["spans"]
    n = len(spans)
    if n == 0:
        return "error"
    n_box = sum(1 for s in spans if s["kind"] == "box")
    n_media = sum(1 for s in spans if s["kind"] in MEDIA_KINDS)
    box_t, media_t = ROUTING_MODEL.get(doc["doc_class"], ROUTING_DEFAULT)
    # deep when layout boxes are present beyond the threshold fraction,
    # or the doc is media-rich enough to need the deep artifact pass;
    # oversize for the routed tier -> quarantine (reference 413
    # semantics, fast/app.py:71-73, accurate/app.py:125-127)
    if n_box / n > box_t or n_media >= media_t:
        return "error" if n > T2_MAX_SPANS else "deep"
    return "error" if n > T1_MAX_SPANS else "fast"
