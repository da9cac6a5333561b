"""Distributed OLS fit (regress.py): numpy cross-check, plan shape,
degenerate inputs, and residual top-k determinism.

The Spark-vs-DuckDB bit-equality of the Cramer solve is covered by
tests/parity_harness.py + the driver gate (fit_linear_quality /
residual_outliers oracles share the literal formula strings); these
tests pin the MATH (against numpy's independent lstsq) and the SCALE
SHAPE (one exchange total: the 1-row final aggregate)."""

from __future__ import annotations

import numpy as np
import pytest

from two_tier_document_parser_spark.regress import (
    fit_ols2,
    ols_moments,
    quality_features,
    residuals_topk,
    weights_long,
)

STOP = ["the", "a", "of", "and"]

DOCS = [
    (1, "the cat sat of the mat", 22),
    (2, "a b c d e f g h", 15),
    (3, "", 0),
    (4, "of of of the the a zz", 21),
    (5, "lorem ipsum dolor sit amet xyz", 30),
    (6, "the quick a brown of fox and dog", 32),
    (7, "and and the a of", 16),
    (8, "word " * 40, 200),
]


@pytest.fixture(scope="module")
def feat(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long"
    )
    return quality_features(docs, STOP)


def test_features_map_only_and_keep_empty_docs(spark, feat):
    rows = {r["doc_id"]: r for r in feat.collect()}
    # doc 3 is empty text: a tok-explode formulation would drop it;
    # the higher-order-function formulation must keep it at 0/0
    assert (rows[3]["y"], rows[3]["x1"], rows[3]["x2"]) == (0, 0, 0)
    assert rows[1]["y"] == 3 and rows[1]["x1"] == 6
    assert rows[7]["y"] == 5 and rows[7]["x1"] == 5
    # map-only: no Exchange anywhere in the feature plan
    plan = feat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fit_matches_numpy_lstsq(spark, feat):
    w = {r["feature"]: r["weight"] for r in weights_long(fit_ols2(feat)).collect()}
    pdf = feat.toPandas().sort_values("doc_id")
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.x1.astype(float), pdf.x2.astype(float)]
    )
    ref, *_ = np.linalg.lstsq(X, pdf.y.values.astype(float), rcond=None)
    assert w["intercept"] == pytest.approx(ref[0], abs=1e-9)
    assert w["n_tokens"] == pytest.approx(ref[1], abs=1e-9)
    assert w["n_chars"] == pytest.approx(ref[2], abs=1e-9)


def test_fit_is_one_exchange(spark, feat):
    # scan -> partial agg -> ONE 1-row exchange -> final agg -> solve:
    # the whole corpus-sized stage is a single all-to-one of partial
    # sums (9 decimals per partition), nothing else moves
    plan = fit_ols2(feat)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_moments_exact_decimal(spark, feat):
    m = ols_moments(feat).collect()[0]
    pdf = feat.toPandas()
    assert int(m["s11"]) == int((pdf.x1.astype(object) ** 2).sum())
    assert int(m["s2y"]) == int((pdf.x2.astype(object) * pdf.y).sum())
    # DECIMAL(38,0) accumulator: the docstring's 10^12-doc budget
    # relies on the sum type being exact decimal, not int64/double
    s11_type = dict(ols_moments(feat).dtypes)["s11"]
    assert s11_type.startswith("decimal(38"), s11_type


def test_residual_topk_deterministic_and_correct(spark, feat):
    w = fit_ols2(feat)
    top = residuals_topk(feat, w, k=3).collect()
    assert len(top) == 3
    # recompute residuals in numpy and check the same ranking
    wv = w.collect()[0]
    pdf = feat.toPandas()
    res = pdf.y - (wv["w0"] + wv["w1"] * pdf.x1 + wv["w2"] * pdf.x2)
    order = sorted(
        zip(pdf.doc_id, res), key=lambda t: (-abs(t[1]), t[0])
    )[:3]
    assert [r["doc_id"] for r in top] == [d for d, _ in order]
    for r, (_, rv) in zip(top, order):
        assert r["residual"] == pytest.approx(rv, abs=1e-9)


def test_perfect_fit_zero_residuals(spark):
    # y exactly linear in (x1, x2) -> weights recover the plane and
    # every residual is ~0 (checks the Cramer formulas' signs)
    # x2 = i*i keeps the design matrix full-rank (x2 not affine in x1)
    rows = [(i, 3 + 2 * i, i * i, 3 + 2 * (3 + 2 * i) - 1 * (i * i))
            for i in range(1, 9)]
    feat = (
        spark.createDataFrame(rows, "doc_id long, x1 long, x2 long, y long")
        .select("doc_id", "y", "x1", "x2")
    )
    w = fit_ols2(feat).collect()[0]
    assert w["w0"] == pytest.approx(3.0, abs=1e-8)
    assert w["w1"] == pytest.approx(2.0, abs=1e-8)
    assert w["w2"] == pytest.approx(-1.0, abs=1e-8)


# ------------------------------------------------------------- zipf


def _zipf_ref(texts):
    """Independent reference: vocab counts -> (c desc, tok) rank ->
    whole-bit log coords -> numpy lstsq."""
    counts = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.array([(r + 1).bit_length() - 1 for r in range(len(ordered))],
                 dtype=float)
    y = np.array([c.bit_length() - 1 for _, c in ordered], dtype=float)
    A = np.stack([np.ones_like(x), x], axis=1)
    icept, slope = np.linalg.lstsq(A, y, rcond=None)[0]
    return len(ordered), slope, icept


def test_zipf_fit_matches_numpy_reference(spark):
    from two_tier_document_parser_spark.regress import zipf_fit

    # a genuinely Zipf-ish bag: token k appears ~N/k times
    texts = []
    for k in range(1, 40):
        texts.append(" ".join([f"w{k:02d}"] * (400 // k)))
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = zipf_fit(d, partitions=8).collect()[0]
    n, slope, icept = _zipf_ref(texts)
    assert got.n_types == n
    assert got.slope == pytest.approx(slope, abs=1e-9)
    assert got.intercept == pytest.approx(icept, abs=1e-9)
    # the planted law is f ~ 400/r: slope near -1 in log-log
    assert -1.3 < got.slope < -0.7


def test_zipf_fit_deterministic_across_partitionings(spark):
    from two_tier_document_parser_spark.regress import zipf_fit

    d = spark.createDataFrame(
        [(i, f"a b c{i % 7} d{i % 3} a") for i in range(200)],
        "doc_id long, text string",
    )
    r1 = zipf_fit(d.repartition(1), partitions=2).collect()[0]
    r2 = zipf_fit(d.repartition(13), partitions=9).collect()[0]
    assert (r1.n_types, r1.slope, r1.intercept) == (
        r2.n_types,
        r2.slope,
        r2.intercept,
    )


def test_zipf_fit_rank_phase_has_no_window(spark):
    """The rank phase must be the two-phase range rank: NO Window
    operator anywhere (a naive row_number() would plan Window over
    Exchange SinglePartition carrying the whole vocabulary). The one
    SinglePartition exchange that remains is the 1-row moments fold,
    which carries only per-partition partial sums — the same shape
    ols_moments pins in test_fit_is_one_exchange."""
    from two_tier_document_parser_spark.regress import zipf_fit

    d = spark.createDataFrame(
        [(i, "x y z") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        zipf_fit(d, partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the localCheckpoint pins the ranked partitions, so the visible
    # executed plan starts at the checkpointed scan — the key pin is
    # that NO Window operator exists anywhere downstream (and none
    # upstream either: the pre-checkpoint phase is repartitionByRange
    # + sortWithinPartitions by construction, asserted on the
    # analyzed plan below)
    assert "Window" not in plan
    analyzed = (
        zipf_fit(d, partitions=4)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "window" not in analyzed.lower()
