"""span_dedup: C4 duplicate-span removal as a document rewrite
(Raffel et al. 2020 §2.2, re-expressed at non-overlapping token-block
granularity). Hand corpora pin the semantics the sf-parity check
can't isolate: keep-first global order, the partial-block guard, and
reconstruction when every full block is dropped."""

from __future__ import annotations

from two_tier_document_parser_spark.curation import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {
        r.doc_id: (r.n_blocks, r.n_dropped, r.text_deduped)
        for r in df.collect()
    }


def test_keep_first_by_doc_then_block(spark):
    # the same 4-token block appears in docs 1, 2, and twice in 3;
    # only its first occurrence (doc 1, block 0) survives
    dup = "a b c d"
    rows = [
        (1, dup + " x y z w"),
        (2, dup + " p q r s"),
        (3, dup + " " + dup),
    ]
    got = _out(span_dedup(_docs(spark, rows), block_size=4))
    assert got[1] == (2, 0, "a b c d x y z w")
    assert got[2] == (2, 1, "p q r s")
    assert got[3] == (2, 2, "")


def test_within_doc_keep_first(spark):
    # duplication purely inside one doc: second copy removed
    got = _out(span_dedup(_docs(spark, [(7, "a b a b")]), block_size=2))
    assert got[7] == (2, 1, "a b")


def test_partial_trailing_block_never_deduped(spark):
    # both docs end in the same 2-token partial block; partials are
    # exempt from dedup even when their text repeats corpus-wide
    rows = [(1, "a b c d t u"), (2, "e f g h t u")]
    got = _out(span_dedup(_docs(spark, rows), block_size=4))
    assert got[1] == (2, 0, "a b c d t u")
    assert got[2] == (2, 0, "e f g h t u")


def test_partial_cannot_shadow_full_block(spark):
    # a partial block's text has < block_size tokens, so it can never
    # collide with a full block's text — doc 2's full block "a b" is
    # the first FULL occurrence and is kept, doc 1's partial too
    rows = [(1, "x y a"), (2, "a b a b")]
    got = _out(span_dedup(_docs(spark, rows), block_size=2))
    assert got[1] == (2, 0, "x y a")
    assert got[2] == (2, 1, "a b")


def test_whitespace_normalization_and_empty_doc(spark):
    # multiple spaces collapse in tokenization; an all-whitespace doc
    # yields no output row (nothing to rewrite)
    rows = [(1, "  a   b  "), (2, "   ")]
    got = _out(span_dedup(_docs(spark, rows), block_size=2))
    assert got == {1: (1, 0, "a b")}
