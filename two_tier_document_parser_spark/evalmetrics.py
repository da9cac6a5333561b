"""Distributed model-quality evaluation for the corpus scorer — the
MEASURE counterpart to ``textstats.hashed_linear_score`` (APPLY) and
``regress.fit_ols2`` (LEARN): rank-based ROC-AUC and a reliability
(calibration) table, both integer-exact so the DuckDB oracle matches
hash-for-hash.

Role / provenance: the reference's extracted text feeds a quality
filter whose scores gate what enters the training corpus (reference
``README.md`` pipeline description; the FineWeb-Edu / DataComp
distill-then-score loop). Before a scorer is trusted corpus-wide, the
pipeline must answer two questions at corpus scale: does the score
RANK good documents above bad ones (ROC-AUC, the Mann-Whitney U
statistic), and does its magnitude MEAN anything (a reliability
diagram: per score bucket, predicted vs observed positive rate).

Exactness contract (what makes both oracle-checkable):
- Scores are the INTEGER milli-logits of the hashed linear model (the
  repo's integer-score convention, SURVEY §7.7.4) — never the float
  sigmoid, whose low bits depend on summation order.
- AUC uses the tie-aware rank formulation over DISTINCT scores:
      2 * U = sum_s  p_s * (2 * cumneg_less(s) + n_s - p_s)
      AUC   = U / (P * N)
  where p_s / n_s are positive / total counts at score s and
  cumneg_less(s) the negatives strictly below s. Every term is an
  integer; the single division happens once, as an integer DIV onto
  parts-per-million. The identity is the standard average-rank
  Mann-Whitney: positives at score s beat all cumneg_less(s) lower
  negatives and half-win against the (n_s - p_s) tied negatives.
- The product P * N and the term sums pass int64 near 10^12 docs, so
  both accumulate in DECIMAL(38,0) (the pmi_bigrams overflow lesson,
  r04 ADVICE) and only the bounded ppm quotient is emitted as BIGINT.

Scale shape (10^12 docs):
- Scoring is the proven map-side broadcast-join plan of
  ``hashed_linear_score`` (explode -> md5 bucket -> broadcast weight
  join -> per-doc integer sum).
- The distinct-score table is score-cardinality-sized (bounded by the
  span of reachable milli-logits, far under corpus size). Its
  exclusive prefix sum of negatives NEVER uses a single-partition
  window: it is the repo's two-phase range rank (``shuffle_rank`` /
  ``zipf_fit`` pattern) — range exchange on the score, a P-row
  per-partition totals collect, offset arithmetic, then one narrow
  Arrow cumsum pass. No data-sized driver state, no global sort task.
- The calibration table is ONE map-side-combinable aggregate onto
  O(#buckets) rows.

Provenance for parity: reference repo two_tier_document_parser keeps
its quality gate outside the parser (fast/app.py returns spans only);
this module is the downstream-evaluation surface SURVEY §2.2 assigns
to the new engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Floor-division of the milli-logit onto fixed-width buckets, exact
# for negatives (DIV truncates toward zero in BOTH Spark and DuckDB,
# so plain lm DIV w would merge (-w, w) into bucket 0). ONE formula
# string shared verbatim with the oracle.
BUCKET_EXPR = (
    "CASE WHEN lm >= 0 THEN lm DIV {w}"
    " ELSE -((-lm + {w} - 1) DIV {w}) END"
)

# Pearson r from the five exact moment sums, ONE formula string shared
# verbatim by the Spark plan and the DuckDB oracle (the fit_ols2
# contract): moments accumulate exactly in DECIMAL, cast to double
# once, and the identical IEEE operation sequence (two correctly-
# rounded sqrts, one division) runs in both engines — bit-equal
# doubles. The CASE guard makes zero variance on either side NULL
# ("undefined") in BOTH engines — without it Spark 4's ANSI mode
# aborts on the 0/0 while DuckDB would return NaN; it also shields
# sqrt from a (mathematically impossible, rounding-theoretic)
# negative operand.
PEARSON_R = (
    "CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0"
    " THEN NULL ELSE (n * sxy - sx * sy)"
    " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END"
)


def logit_milli(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(doc_id, lang, lm): the exact integer milli-logit of the hashed
    bag-of-words linear model — ``hashed_linear_score``'s integer core
    WITHOUT the final float sigmoid, for consumers that need
    order-free exactness (AUC ranks, calibration buckets).

    Identical plan: explode -> md5 bucket -> broadcast weight join ->
    per-doc integer sum; map-side relational algebra, no UDF.
    """
    tok = df.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("t"),
    )
    bucketed = tok.withColumn(
        "bucket",
        (
            F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10)
            .cast("long")
            % n_buckets
        ),
    )
    return (
        bucketed.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.coalesce(F.col("w_milli"), F.lit(0)))
            .cast("long")
            .alias("lm"),
            # the same exploded pass also counts tokens for free —
            # scorer_length_corr consumes this instead of cloning the
            # explode/bucket/join plan (one bucketing definition, one
            # place to change it)
            F.count(F.lit(1)).cast("long").alias("n_tok"),
        )
    )


def model_auc(
    docs: DataFrame,
    weights: DataFrame,
    pos_lang: str = "en",
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """ONE row (pos_n, neg_n, auc_ppm): tie-aware ROC-AUC of the
    hashed linear score against the binary label lang == pos_lang,
    in exact parts-per-million (see module docstring for the
    Mann-Whitney identity and the two-phase prefix-sum scale shape).
    """
    scored = logit_milli(docs, weights, text_col).select(
        "lm", (F.col("lang") == pos_lang).cast("long").alias("y")
    )
    g = scored.groupBy("lm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
    )

    # Exclusive prefix sum of negatives below each distinct score:
    # two-phase range rank (zipf_fit pattern) — range exchange on lm,
    # P-row totals collect, offsets, one narrow Arrow cumsum pass.
    part = (
        g.repartitionByRange(partitions, F.col("lm").asc())
        .sortWithinPartitions("lm")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = {
        r["pid"]: r["neg"]
        for r in part.groupBy("pid")
        .agg(F.sum(F.col("n") - F.col("p")).alias("neg"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    def cum(batches):
        import numpy as np
        import pyarrow as pa

        pos = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if pos is None:
                pos = offsets.get(b.column("pid")[0].as_py(), 0)
            neg = (
                b.column("n").to_numpy(zero_copy_only=False)
                - b.column("p").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            cumneg = pos + np.concatenate(([0], np.cumsum(neg)[:-1]))
            pos += int(neg.sum())
            yield pa.record_batch(
                [
                    b.column("lm"),
                    b.column("n"),
                    b.column("p"),
                    pa.array(cumneg),
                ],
                names=["lm", "n", "p", "cumneg"],
            )

    ranked = part.mapInArrow(
        cum, "lm long, n long, p long, cumneg long"
    )
    # Per-score win terms and the final division, all in DECIMAL: the
    # term sum and P*N both pass int64 at 10^12 docs.
    return ranked.agg(
        F.sum("p").cast("long").alias("pos_n"),
        F.sum(F.col("n") - F.col("p")).cast("long").alias("neg_n"),
        F.sum(
            F.expr(
                "CAST(p AS DECIMAL(38,0))"
                " * (2 * CAST(cumneg AS DECIMAL(38,0)) + n - p)"
            )
        ).alias("_num2"),
    ).select(
        "pos_n",
        "neg_n",
        F.expr(
            "CAST(CASE WHEN pos_n = 0 OR neg_n = 0 THEN NULL"
            " ELSE (_num2 * 1000000) DIV"
            " (2 * CAST(pos_n AS DECIMAL(38,0))"
            " * CAST(neg_n AS DECIMAL(38,0))) END AS BIGINT)"
        ).alias("auc_ppm"),
    )


def scorer_length_corr(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """ONE row (n_docs, r): Pearson correlation between the hashed
    linear scorer's milli-logit and the document token count — the
    LENGTH-BIAS diagnostic of a quality filter. The classic failure
    mode of learned quality scorers is rediscovering document length
    (long pages score "good", tweets score "bad" regardless of
    content); |r| near 1 here means the scorer adds nothing beyond a
    length threshold, so a curation team checks this number before
    trusting model_auc's headline.

    Exactness: both per-doc signals come from logit_milli's ONE
    exploded pass (its groupBy also counts tokens — zero extra
    shuffles, and one shared bucketing definition with the scorer it
    audits), the five cross-moments accumulate exactly in
    DECIMAL(38,0) (the fit_ols2 recipe: one 1-row exchange for the
    whole corpus), and r is computed from the shared PEARSON_R
    formula string — bit-equal doubles vs the oracle. Token-free
    docs have no exploded rows and drop from both marginals
    consistently (the oracle's tok CTE reproduces this)."""
    per_doc = logit_milli(docs, weights, text_col, n_buckets).select(
        F.col("lm").alias("x"), F.col("n_tok").alias("y")
    )

    def d(c: str):
        return F.col(c).cast("decimal(18,0)")

    m = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("x")).alias("sxx"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("y") * d("y")).alias("syy"),
    ).select(
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.expr(PEARSON_R).alias("r"),
    )


def score_calibration(
    docs: DataFrame,
    weights: DataFrame,
    pos_lang: str = "en",
    bucket_milli: int = 500,
    text_col: str = "text",
) -> DataFrame:
    """Reliability table: fixed-width milli-logit buckets ->
    (bucket, n, pos_n, pos_ppm, mean_lm_milli). A well-calibrated
    scorer shows pos_ppm rising monotonically with the bucket; a flat
    table means the magnitude carries no information beyond the rank.

    ONE map-side-combinable aggregate onto O(#reachable buckets) rows
    — the 100 TB shape is scan -> partial agg -> merge. All integer:
    shares are ppm integer divisions, the mean is emitted as an exact
    (sum, count) pair plus the DIV quotient.
    """
    scored = logit_milli(docs, weights, text_col).select(
        "lm", (F.col("lang") == pos_lang).cast("long").alias("y")
    )
    b = scored.withColumn(
        "bucket",
        F.expr(BUCKET_EXPR.format(w=bucket_milli)).cast("long"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos_n"),
            F.sum("lm").cast("long").alias("_slm"),
        )
        .select(
            "bucket",
            "n",
            "pos_n",
            F.expr("pos_n * 1000000 DIV n").alias("pos_ppm"),
            # trunc-toward-zero spelled out: Spark DIV truncates but
            # DuckDB // floors, so a bare _slm DIV n would disagree on
            # negative sums; both CASE branches keep operands >= 0
            # where the two engines' integer division coincides.
            F.expr(
                "CASE WHEN _slm >= 0 THEN _slm DIV n"
                " ELSE -((-_slm) DIV n) END"
            ).alias("mean_lm_milli"),
        )
    )
