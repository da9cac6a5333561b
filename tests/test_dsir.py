"""DSIR hashed n-gram importance scores (curation.dsir_weights).

Hand-computed floor-log2 expectations on a corpus small enough that
no two features share a hash bucket (verified in-test), plus the
feature-definition edge cases (bigram formation, sub-2-token docs,
empty docs dropping out). DuckDB value parity runs in
test_driver_contract.py (SUBSET) and tests/parity_harness.py.
"""

from __future__ import annotations

from two_tier_document_parser_spark.curation import dsir_weights

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        schema=SCHEMA,
    )


def test_dsir_hand_computed(spark):
    # feats: d0/d1 -> {aa, bb, "aa bb"}; d2 -> {zz}
    # rfreq: aa 2, bb 2, "aa bb" 2, zz 1; tfreq (src0): 1,1,1,0
    # logratio aa/bb/"aa bb" = flog2(2)-flog2(3) = 1-1 = 0
    # logratio zz            = flog2(1)-flog2(2) = 0-1 = -1
    df = _docs(
        spark,
        [("aa bb", "src0"), ("aa bb", "src1"), ("zz", "src1")],
    )
    got = {r.doc_id: (r.n_feats, r.dsir_score)
           for r in dsir_weights(df).collect()}
    assert got == {0: (3, 0), 1: (3, 0), 2: (1, -1)}


def test_dsir_target_slice_scores_higher(spark):
    # target docs repeat a distinctive vocabulary; raw-only docs use
    # another. Target-vocab features have tfreq ~ rfreq (ratio ~ 0);
    # raw-only features have tfreq 0 (ratio < 0) -> target-like docs
    # outscore raw-only docs.
    rows = [("wiki facts cited", "src0")] * 4
    rows += [("spam click buy", "src1")] * 4
    rows += [("wiki facts cited", "src1")]  # target-LIKE doc in raw
    df = _docs(spark, rows)
    got = {r.doc_id: r.dsir_score for r in dsir_weights(df).collect()}
    target_like = {got[i] for i in (0, 1, 2, 3, 8)}
    raw_only = {got[i] for i in (4, 5, 6, 7)}
    assert len(target_like) == 1 and len(raw_only) == 1
    assert target_like.pop() > raw_only.pop()


def test_dsir_edge_cases(spark):
    # 1-token doc: no bigram, 1 feature; empty doc: drops out;
    # whitespace-only doc: drops out
    df = _docs(
        spark,
        [("solo", "src0"), ("", "src1"), ("   ", "src1"),
         ("a b c", "src0")],
    )
    got = {r.doc_id: r.n_feats for r in dsir_weights(df).collect()}
    # "a b c" -> a, b, c, "a b", "b c" = 5 features
    assert got == {0: 1, 3: 5}
