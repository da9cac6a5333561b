"""Distributed k-means (Lloyd's algorithm, fixed iterations) over
quantized embeddings — the clustering stage of semantic curation.

Role / provenance: SemDeDup (Abbas et al. 2023, §3) and the
cluster-balanced sampling family (DoReMi-style mixture tuning,
cluster-dedup) all start by k-means-clustering the embedding space;
this repo's ``semantic_dedup`` uses SRP-LSH buckets as its candidate
generator, and this module supplies the paper-faithful alternative:
explicit centroids + assignments usable for cluster-capped sampling,
per-cluster dedup, and diversity audits.

Spark shape (the classic scalable k-means plan, same topology as
Spark MLlib's, but with the centroid broadcast folded ENTIRELY into
the expression tree):

- **Assignment is map-only.** The k centroids (k·dim ints, driver
  state bounded at k·dim) are embedded as a nested array LITERAL in
  the plan; per-point distances come from ``transform`` +
  ``zip_with`` + ``aggregate`` higher-order functions and the argmin
  from ``array_position(dists, array_min(dists))`` — first-occurrence
  semantics give the deterministic lowest-cluster-id tie-break. No
  join, no shuffle: a 10^12-point assignment pass is one scan.
- **Update is one tiny shuffle.** posexplode to (cluster, dim) keys →
  sum/count with map-side partial aggregation — only k·dim·partitions
  partial rows ever move. The k·dim sums collect to the driver
  (bounded, the repo's accepted iterative-op pattern — see
  bpe_train's argmax collect and the memory note on lazy iterative
  lineage), where the new centroids are exact integer floor-means.
- k iterations = k scans + k tiny shuffles; nothing in the loop grows
  with executor count or data size except the embarrassingly parallel
  scan itself.

Exactness contract (what makes the unrolled DuckDB oracle hash-exact):
points are the SAME symmetric int8 quantization as the q8 near-dup
family (round away-from-zero in both engines — see
``similarity.quantize_embeddings``), SHIFTED by +127 into [0, 254] so
every sum, squared distance, and floor-divided centroid mean is
non-negative int64 arithmetic — order-independent, no float folds,
and Python ``//`` == SQL ``//``/``div`` on non-negative operands.
Distances are invariant under the constant shift, so the clustering
is exactly the clustering of the q8 vectors. Empty clusters keep
their previous centroid (COALESCE in the oracle's LEFT JOIN — the
deterministic convention, not a re-seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize_embeddings


def _shifted_points(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, q8+127 as array<long>) — the non-negative integer space
    every k-means stage operates in."""
    q = quantize_embeddings(emb, vec_col=vec_col, id_col=id_col)
    return q.select(
        id_col,
        F.transform("q8", lambda v: v.cast("long") + F.lit(127)).alias("p"),
    )


def _dist_expr(cents: list[list[int]]):
    """Map-only distance-to-each-centroid + argmin expressions from a
    centroid LITERAL (k x dim nested array folded into the plan)."""
    cent_lit = F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in c])
            for c in cents
        ]
    )
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("p"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return dists


def kmeans_q8(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration integer Lloyd's over shifted-q8 embeddings.

    Returns (id, cluster int, dist_q long): the assignment against
    the centroids after ``iters`` full update rounds, with the exact
    squared q8-space distance to the winning centroid. Deterministic
    end to end: smallest-k-ids init, first-min (lowest cluster id)
    tie-break, floor-mean updates, keep-previous empty-cluster rule.
    """
    spark = emb.sparkSession
    pts = _shifted_points(emb, id_col, vec_col).localCheckpoint()

    # init: the k smallest ids, cluster index in id order (bounded
    # k-row collect)
    init_rows = pts.orderBy(id_col).limit(k).collect()
    cents = [list(r["p"]) for r in sorted(init_rows, key=lambda r: r[id_col])]
    dim = len(cents[0])

    for _ in range(iters):
        dists = _dist_expr(cents)
        assigned = pts.select(
            "p",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
        )
        # update: (cluster, dim)-keyed integer sums — k*dim keys, so
        # partial aggregation completes map-side and the collect is
        # bounded at k*dim rows
        sums = (
            assigned.select("cluster", F.posexplode("p").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep previous
        for r in sums:
            new[r["cluster"]][r["d"]] = r["sv"] // r["n"]
        cents = new
        assert all(len(c) == dim for c in cents)

    dists = _dist_expr(cents)
    return pts.select(
        id_col,
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("dist_q"),
    )


def cluster_profile(assign: DataFrame) -> DataFrame:
    """Per-cluster size + exact distance moments (int64 sums) — the
    balance/compactness audit a cluster-capped sampler reads."""
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dist_q").alias("sum_dist_q"),
        F.max("dist_q").alias("max_dist_q"),
    )
