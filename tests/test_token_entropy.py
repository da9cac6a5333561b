"""Exactness tests for textstats.token_entropy on hand-computed bags
(the oracle-equivalence side is covered by parity_harness) plus the
map-only plan pin: zero exchanges over a parquet-backed table."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref(text):
    """Independent Python reference: integer whole-bit entropy."""
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return (0, 0, 0, 0)
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    ent = sum(c * (n // c).bit_length() - c for c in counts.values())
    return (n, len(counts), len(counts) * 1000 // n, ent)


def test_entropy_hand_computed(spark):
    from two_tier_document_parser_spark.textstats import token_entropy

    texts = {
        1: "a b a c  a",       # runs a=3,b=1,c=1: 3*0 + 1*2 + 1*2 = 4
        2: "",                 # empty -> all zeros
        3: "x",                # single token -> 0 bits
        4: "T t T",            # case-folds to one type -> 0 bits
        5: "p q r s",          # uniform over 4: 4 * flog2(4) = 8
        6: "w w x x y y z z",  # uniform over 4, c=2: 8 * flog2(4) = 16
    }
    d = _docs(spark, sorted(texts.items()))
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.ttr_permille, r.entropy_bits)
        for r in token_entropy(d).collect()
    }
    assert got == {i: _ref(t) for i, t in texts.items()}
    assert got[1] == (5, 3, 600, 4)
    assert got[5] == (4, 4, 1000, 8)
    assert got[6] == (8, 4, 500, 16)


def test_entropy_is_floor_envelope_of_float_entropy(spark):
    """entropy_bits <= n*H(float) always, and matches the per-run
    floor exactly — the whole-bit envelope claim in the docstring."""
    from two_tier_document_parser_spark.textstats import token_entropy

    text = "a a a a b b c d d d e"
    r = token_entropy(_docs(spark, [(1, text)])).collect()[0]
    toks = text.split()
    n = len(toks)
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    float_nh = sum(c * math.log2(n / c) for c in counts.values())
    exact = sum(c * math.floor(math.log2(n / c)) for c in counts.values())
    assert r.entropy_bits == exact
    assert r.entropy_bits <= float_nh


def test_entropy_plan_is_map_only(spark):
    """Scale pin: one projection over the scan, NO Exchange — the
    sorted-run-length formulation never leaves the row (vs the
    explode + (doc, token) groupBy classic, which shuffles the full
    token stream)."""
    import os

    from two_tier_document_parser_spark.textstats import token_entropy

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plan = (
        token_entropy(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_host_dup_stats_hand_computed(spark):
    from two_tier_document_parser_spark.urlnorm import host_dup_stats

    rows = [
        (1, "http://h.net/p?id=1"),
        (2, "HTTP://WWW.h.net:80/p/?id=1&utm_s=x"),  # same canon as 1
        (3, "http://h.net/p?id=2"),
        (4, "https://other.org/x"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.host: (r.n_urls, r.n_canonical, r.dup_permille)
        for r in host_dup_stats(d).collect()
    }
    assert got == {
        "h.net": (3, 2, 333),
        "other.org": (1, 1, 0),
    }


def test_null_text_scores_as_empty(spark):
    """A NULL-text document emits the zero row the oracle's LEFT
    JOIN + COALESCE contract produces — never NULL stats (round-5
    review finding: split(NULL) would otherwise propagate)."""
    from two_tier_document_parser_spark.textstats import token_entropy

    d = spark.createDataFrame(
        [(1, None), (2, "a a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in token_entropy(d).collect()}
    assert (
        got[1]["n_tokens"],
        got[1]["n_types"],
        got[1]["ttr_permille"],
        got[1]["entropy_bits"],
    ) == (0, 0, 0, 0)
    assert got[2]["n_tokens"] == 3
