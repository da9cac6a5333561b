"""Exactness tests for dedup.cdc_chunks / cdc_dup_chunks (content-
defined chunking) and events.retention_cohorts; oracle equivalence is
covered by parity_harness."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _cdc_ref(text: str, w: int = 8, mask_mod: int = 64):
    """Independent Python reference: same boundary rule."""
    s = text.lower()
    n = len(s)
    cuts = [
        e
        for e in range(w, n + 1)
        if int(_md5(s[e - w : e])[:8], 16) % mask_mod == 0
    ]
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [n]
    out = []
    idx = 0
    for st, en in zip(starts, ends):
        if st <= en:
            out.append((idx, en - st + 1, _md5(s[st - 1 : en])))
            idx += 1
    return out


def test_cdc_matches_python_reference(spark):
    from two_tier_document_parser_spark.dedup import cdc_chunks

    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "spark table merge join window hash scan " * 10),
        (3, "short"),          # below window size -> one chunk
        (4, "x" * 7),          # exactly w-1
        (5, "y" * 64),         # uniform content
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(d).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_len, r.chunk_hash)
        )
    for doc_id, text in texts:
        exp = _cdc_ref(text)
        assert sorted(got.get(doc_id, [])) == exp, doc_id
        # chunks tile the document exactly
        assert sum(ln for _, ln, _ in exp) == len(text)


def test_cdc_is_shift_resistant(spark):
    """Inserting a prefix must leave the downstream chunk hashes
    intact — the property fixed-block dedup lacks."""
    from two_tier_document_parser_spark.dedup import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog " * 20
    d = spark.createDataFrame(
        [(1, base), (2, "INSERTED PREFIX!! " + base)],
        "doc_id long, text string",
    )
    by_doc: dict = {1: set(), 2: set()}
    for r in cdc_chunks(d).collect():
        by_doc[r.doc_id].add(r.chunk_hash)
    shared = by_doc[1] & by_doc[2]
    # all but the first chunk (which absorbs the insertion) survive
    assert len(shared) >= len(by_doc[1]) - 2
    assert shared, "no shared chunks"


def test_cdc_dup_chunks_detects_planted_dup(spark):
    from two_tier_document_parser_spark.dedup import cdc_dup_chunks

    base = "spark table merge join window hash scan " * 10
    d = spark.createDataFrame(
        [(1, base), (2, "PREFIX " + base), (3, "unrelated text here")],
        "doc_id long, text string",
    )
    dups = cdc_dup_chunks(d).collect()
    assert dups, "expected shared chunks between 1 and 2"
    assert all(r.n_docs >= 2 for r in dups)


def test_cdc_empty_doc_produces_no_chunks(spark):
    from two_tier_document_parser_spark.dedup import cdc_chunks

    d = spark.createDataFrame([(1, ""), (2, "ok")], "doc_id long, text string")
    assert {r.doc_id for r in cdc_chunks(d).collect()} == {2}


def test_retention_cohorts_hand_computed(spark):
    from two_tier_document_parser_spark.events import retention_cohorts

    wk = 604800

    def ts(week, off=0):
        return datetime.fromtimestamp(week * wk + off, tz=timezone.utc)

    rows = [
        # user A: first week 100, active weeks 100, 101, 103
        (1, ts(100), "a", "click", 0.0),
        (2, ts(100, 60), "a", "view", 0.0),    # same week dup
        (3, ts(101), "a", "click", 0.0),
        (4, ts(103), "a", "click", 0.0),
        # user B: first week 100, active 100 only
        (5, ts(100, 7), "b", "click", 0.0),
        # user C: first week 101, active 101, 103
        (6, ts(101, 9), "c", "click", 0.0),
        (7, ts(103, 2), "c", "view", 0.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string,"
        " event_type string, value double"
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(e).collect()
    }
    assert got == {
        (100, 0): 2,   # a, b
        (100, 1): 1,   # a
        (100, 3): 1,   # a
        (101, 0): 1,   # c
        (101, 2): 1,   # c
    }
