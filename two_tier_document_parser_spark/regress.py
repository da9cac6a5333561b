"""Distributed closed-form linear-model training (ordinary least
squares via the normal equations) and residual-based label-noise
detection — the LEARN counterpart to ``textstats.hashed_linear_score``
(which only APPLIES a fixed weight table).

Role / provenance: the reference pipeline's extracted text feeds
downstream quality filtering (two_tier_document_parser's output is
curation input; see reference ``README.md`` pipeline description).
Modern curation stacks distill an expensive gold quality scorer into a
cheap feature model that is then scored over every document (the
FineWeb-Edu / DataComp pattern: label a sample with the expensive
judge, fit a cheap regressor/classifier, apply it corpus-wide). This
module trains that distilled model IN Spark:

- The sufficient statistics of OLS (``X^T X`` and ``X^T y``) are
  map-side-combinable sums — ONE aggregate over the corpus, O(d^2)
  numbers shuffled (9 for d=2 features + intercept), then a
  closed-form Cramer solve on the single result row. No iteration, no
  data-row collect: at 10^12 docs this is exactly one all-to-one
  exchange of per-partition partial sums.
- Feature extraction is map-only: token and stopword counts come from
  higher-order array functions on the raw text column (``split`` +
  ``filter`` + ``size``), never an explode→groupBy round trip, so the
  whole fit is scan → partial agg → 1-row final agg.

Exactness contract (what makes the DuckDB oracle hash-exact): features
and target are integer counts; the moment sums are accumulated exactly
in DECIMAL (int64 products can exceed int64 once corpus size ×
feature-square magnitude passes ~9.2e18; DECIMAL(38,0) holds raw
second moments to ~1e38, comfortably past 10^12 docs × 1e8 squared
chars = 1e20). The exact sums are then cast to IEEE double ONCE and
the Cramer determinants are evaluated from ONE shared formula string —
the literal same expression text runs through Spark's parser and
through DuckDB in the oracle — so both engines perform the identical
sequence of double roundings and produce bit-equal weights. Solving in
float from exact integer sums is the numerically standard formulation
(sums exact, solve O(d^3) in floating point); for general d the same
moments feed a driver-side ``numpy.linalg.solve`` — here d=2 keeps the
solve in-plan and oracle-checkable.

Residual outliers (``residuals_topk``) are the confident-learning /
label-noise detection step (Northcutt et al. 2021, JAIR — "Confident
Learning"): documents whose gold label the cheap model most badly
mispredicts are exactly the candidates a curation loop re-judges.
One broadcast of the 1-row weight table, map-side residuals, global
top-k (TakeOrdered, a k-row reduction — not a sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The nine OLS moments for y ~ 1 + x1 + x2, in the order the shared
# Cramer formulas below reference them.
MOMENT_COLS = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")

# Cramer's rule for the 3x3 normal equations
#   [[n,  s1,  s2 ],       [sy ]
#    [s1, s11, s12],  w =  [s1y]
#    [s2, s12, s22]]       [s2y]
# ONE formula string per determinant, shared verbatim by the Spark
# plan (F.expr) and the DuckDB oracle so the IEEE operation sequence
# is identical in both engines (see module docstring).
DET_A = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
DET_A0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y))"
)
DET_A1 = (
    "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2))"
)
DET_A2 = (
    "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2))"
)

# Residual of one row against the solved weights; y/x1/x2 are the
# integer feature columns, w0/w1/w2 the broadcast weights. Shared with
# the oracle exactly like the determinant strings.
RESIDUAL_EXPR = (
    "CAST(y AS DOUBLE)"
    " - (w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE))"
)


def quality_features(docs: DataFrame, stopwords: list[str]) -> DataFrame:
    """documents(doc_id, text, n_chars) -> (doc_id, y, x1, x2).

    y  = stopword count (the "expensive judge" label — in a real
         distillation loop this column comes from the gold scorer),
    x1 = whitespace token count,
    x2 = n_chars (free metadata).

    Map-only: higher-order array functions, no explode, no shuffle —
    and unlike a tok-explode → groupBy, zero-token documents keep a
    row (y = x1 = 0) instead of silently dropping out of the fit.
    """
    toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")
    )
    stops = F.filter(toks, lambda t: F.lower(t).isin(stopwords))
    return docs.select(
        "doc_id",
        F.size(stops).cast("long").alias("y"),
        F.size(toks).cast("long").alias("x1"),
        F.col("n_chars").cast("long").alias("x2"),
    )


def ols_moments(feat: DataFrame) -> DataFrame:
    """One-row exact moment table (all nine OLS sums), DECIMAL-exact.

    The single corpus-sized stage: partial sums per partition, one
    1-row exchange. DECIMAL(18,0) operand casts make every product
    DECIMAL(37,0) and every sum DECIMAL(38,0) — exact far past int64
    (module docstring has the 10^12-doc magnitude budget).
    """

    def d(c: str):
        return F.col(c).cast("decimal(18,0)")

    return feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x1")).alias("s1"),
        F.sum(d("x2")).alias("s2"),
        F.sum(d("x1") * d("x1")).alias("s11"),
        F.sum(d("x1") * d("x2")).alias("s12"),
        F.sum(d("x2") * d("x2")).alias("s22"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x1") * d("y")).alias("s1y"),
        F.sum(d("x2") * d("y")).alias("s2y"),
    )


def fit_ols2(feat: DataFrame) -> DataFrame:
    """(y, x1, x2) rows -> ONE row (w0, w1, w2): least-squares weights
    for y ~ w0 + w1*x1 + w2*x2 via exact moments + Cramer in double."""
    m = ols_moments(feat).select(
        *[F.col(c).cast("double").alias(c) for c in MOMENT_COLS]
    )
    return m.select(
        F.expr(f"{DET_A0} / {DET_A}").alias("w0"),
        F.expr(f"{DET_A1} / {DET_A}").alias("w1"),
        F.expr(f"{DET_A2} / {DET_A}").alias("w2"),
    )


def weights_long(w: DataFrame) -> DataFrame:
    """1-row (w0,w1,w2) -> 3 rows (feature, weight), the driver-query
    shape (one row per learned coefficient)."""
    return w.selectExpr(
        "stack(3, 'intercept', w0, 'n_tokens', w1, 'n_chars', w2)"
        " AS (feature, weight)"
    ).orderBy("feature")


def residuals_topk(feat: DataFrame, weights: DataFrame, k: int = 20) -> DataFrame:
    """Top-k documents by |gold label - linear prediction|: the
    label-noise / re-judge candidates (Northcutt et al. 2021).

    weights is the 1-row fit_ols2 output — broadcast, so the residual
    pass is map-side; the top-k is a TakeOrdered reduction.
    doc_id tiebreak makes the cut deterministic under residual ties.
    """
    j = feat.crossJoin(F.broadcast(weights))
    return (
        j.withColumn("residual", F.expr(RESIDUAL_EXPR))
        .select(
            "doc_id",
            F.col("y").alias("n_stop"),
            F.col("x1").alias("n_tokens"),
            F.col("x2").alias("n_chars"),
            "residual",
        )
        .orderBy(F.abs(F.col("residual")).desc(), "doc_id")
        .limit(k)
    )


# Cramer's rule for the 1-feature fit y ~ b0 + b1*x (the Zipf log-log
# regression). ONE formula string per quantity, shared verbatim with
# the DuckDB oracle (same contract as DET_A*).
ZIPF_DEN = "(n * sxx - sx * sx)"
ZIPF_SLOPE_NUM = "(n * sxy - sx * sy)"
ZIPF_ICEPT_NUM = "(sy * sxx - sx * sxy)"


def zipf_fit(
    docs: DataFrame, text_col: str = "text", partitions: int = 32
) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary — the
    corpus-health diagnostic (Zipf 1949; a natural-language corpus
    fits log f ~ intercept - alpha*log r with alpha ~ 1; boilerplate
    floods or synthetic junk bend the curve). Fits ordinary least
    squares of y = floor(log2(freq)) on x = floor(log2(rank)) over
    all vocabulary types.

    Exactness: coordinates are the repo's integer whole-bit floor-log2
    (length(bin(v)) - 1, exact for v >= 1); the five regression sums
    accumulate in DECIMAL and cast to double ONCE; slope/intercept are
    evaluated from the shared ZIPF_* formula strings, so both engines
    run the identical IEEE sequence (bit-equal, the fit_ols2
    contract).

    Scale shape (10^8-type vocabularies): the corpus-sized token
    stream collapses to vocab size in ONE map-side-partial aggregate;
    the exact global rank by (freq DESC, token ASC) is the proven
    TWO-PHASE range rank (shuffle_rank pattern — sampling range
    exchange + P-row offset collect + narrow Arrow pass), never a
    single-partition row_number window; the regression is then one
    1-row DECIMAL aggregate. No data-sized driver state anywhere.

    Returns ONE row: (n_types, slope, intercept). slope ~ -alpha.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from .curation import range_rank

    ranked = range_rank(
        vocab, [F.col("c").desc(), F.col("tok")], "rank", partitions
    )
    coords = ranked.select(
        (F.length(F.bin("rank")) - F.lit(1)).cast("long").alias("x"),
        (F.length(F.bin("c")) - F.lit(1)).cast("long").alias("y"),
    )

    def d(c: str):
        return F.col(c).cast("decimal(18,0)")

    m = coords.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("x") * d("x")).alias("sxx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
    ).select(
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n", "sx", "sxx", "sy", "sxy")
        ]
    )
    return m.select(
        F.col("n").cast("long").alias("n_types"),
        F.expr(f"{ZIPF_SLOPE_NUM} / {ZIPF_DEN}").alias("slope"),
        F.expr(f"{ZIPF_ICEPT_NUM} / {ZIPF_DEN}").alias("intercept"),
    )
