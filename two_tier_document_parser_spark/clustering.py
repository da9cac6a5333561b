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


def _assign_arrow(C, id_col: str):
    """mapInArrow assignment kernel: exact int64 numpy distances via
    the ||p||^2 - 2 p.C + ||c||^2 expansion (every term exact:
    values <= 254, dim-64 dot <= 64*254^2 ~ 4.1e6 — no overflow, no
    float), np.argmin first-occurrence = the same lowest-cluster-id
    tie-break as array_position(first-min). Bit-identical to the
    expression path (pytest-pinned), ~40x faster per pass."""
    cc = (C * C).sum(axis=1)

    def go(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            P = np.stack(
                b.column("p").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            d = (
                (P * P).sum(axis=1)[:, None]
                + cc[None, :]
                - 2 * (P @ C.T)
            )
            cl = np.argmin(d, axis=1)
            yield pa.record_batch(
                [
                    b.column(id_col),
                    pa.array(cl.astype(np.int32)),
                    pa.array(d[np.arange(len(cl)), cl]),
                ],
                names=[id_col, "cluster", "dist_q"],
            )

    return go


def _update_partials_arrow(C):
    """mapInArrow update kernel: assign in-batch (same exact argmin),
    emit per-batch per-cluster integer partial sums — at most k*dim
    rows per batch, so the downstream (cluster, d) aggregate moves
    k*dim*partitions rows regardless of corpus size."""
    cc = (C * C).sum(axis=1)

    def go(batches):
        import numpy as np
        import pyarrow as pa

        dim = C.shape[1]
        for b in batches:
            if b.num_rows == 0:
                continue
            P = np.stack(
                b.column("p").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            d = (
                (P * P).sum(axis=1)[:, None]
                + cc[None, :]
                - 2 * (P @ C.T)
            )
            cl = np.argmin(d, axis=1)
            present = np.unique(cl)
            sv = np.stack([P[cl == c].sum(axis=0) for c in present])
            n = np.array([(cl == c).sum() for c in present], dtype=np.int64)
            yield pa.record_batch(
                [
                    pa.array(
                        np.repeat(present.astype(np.int32), dim)
                    ),
                    pa.array(np.tile(np.arange(dim, dtype=np.int32),
                                     len(present))),
                    pa.array(sv.reshape(-1)),
                    pa.array(np.repeat(n, dim)),
                ],
                names=["cluster", "d", "sv", "n"],
            )

    return go


def kmeans_q8(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """Fixed-iteration integer Lloyd's over shifted-q8 embeddings.

    Returns (id, cluster int, dist_q long): the assignment against
    the centroids after ``iters`` full update rounds, with the exact
    squared q8-space distance to the winning centroid. Deterministic
    end to end: smallest-k-ids init, first-min (lowest cluster id)
    tie-break, floor-mean updates, keep-previous empty-cluster rule.

    ``kernel="arrow"`` (default) runs the vectorized numpy kernels;
    ``kernel="expr"`` runs the pure-expression formulation whose plan
    literally mirrors the DuckDB oracle. Both are exact int64 with
    the same first-min tie-break — bit-identical outputs
    (tests/test_clustering.py pins it), so the choice is purely a
    throughput/plan-inspection trade.
    """
    spark = emb.sparkSession
    pts = _shifted_points(emb, id_col, vec_col).localCheckpoint()

    # init: the k smallest ids, cluster index in id order (bounded
    # k-row collect)
    init_rows = pts.orderBy(id_col).limit(k).collect()
    cents = [list(r["p"]) for r in sorted(init_rows, key=lambda r: r[id_col])]
    dim = len(cents[0])

    import numpy as np

    for _ in range(iters):
        if kernel == "arrow":
            C = np.asarray(cents, dtype=np.int64)
            sums = (
                pts.mapInArrow(
                    _update_partials_arrow(C),
                    "cluster int, d int, sv long, n long",
                )
                .groupBy("cluster", "d")
                .agg(F.sum("sv").alias("sv"), F.sum("n").alias("n"))
                .collect()
            )
        else:
            dists = _dist_expr(cents)
            assigned = pts.select(
                "p",
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("cluster"),
            )
            # update: (cluster, dim)-keyed integer sums — k*dim keys,
            # so partial aggregation completes map-side and the
            # collect is bounded at k*dim rows
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

    if kernel == "arrow":
        C = np.asarray(cents, dtype=np.int64)
        return pts.mapInArrow(
            _assign_arrow(C, id_col),
            f"{id_col} long, cluster int, dist_q long",
        )
    dists = _dist_expr(cents)
    return pts.select(
        id_col,
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("dist_q"),
    )


def emb_moments(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact second-moment (Gram) statistics of the q8 embedding
    space — the sufficient statistics of PCA / whitening (the
    covariance matrix is (s_prod - s_d1*s_d2/n)/n per pair): one
    corpus pass, dim*(dim+1)/2 output rows, never a vector collect.

    The standard preprocessing step before semantic indexing (OPQ/PCA
    rotation in FAISS-style ANN stacks, embedding whitening for
    near-dup thresholds): at 10^12 vectors the covariance accumulates
    exactly the same way the OLS moments do — per-batch int64 partial
    Gram matrices (P^T P, a dim x dim numpy matmul per Arrow batch),
    then a (d1, d2)-keyed aggregate with map-side partials: only
    dim*(dim+1)/2 * partitions partial rows ever shuffle. All inputs
    are int8-range ints, so every product and sum is exact int64
    (1e12 rows * 127^2 ~ 1.6e16 < 9.2e18) — order-independent,
    hash-exact vs the oracle's explode/self-join formulation.

    Output: (d1, d2, s_prod, s_d1, s_d2, n) for d1 <= d2 — each row
    carries the pair's first moments so any covariance/correlation
    entry is computable row-locally downstream.
    """
    q = quantize_embeddings(emb, vec_col=vec_col, id_col=id_col).select(
        F.transform("q8", lambda v: v.cast("long")).alias("p")
    )

    def partials(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            P = np.stack(
                b.column("p").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            dim = P.shape[1]
            gram = P.T @ P
            s1 = P.sum(axis=0)
            iu = np.triu_indices(dim)
            yield pa.record_batch(
                [
                    pa.array(iu[0].astype(np.int32)),
                    pa.array(iu[1].astype(np.int32)),
                    pa.array(gram[iu]),
                    pa.array(s1[iu[0]]),
                    pa.array(s1[iu[1]]),
                    pa.array(
                        np.full(len(iu[0]), P.shape[0], dtype=np.int64)
                    ),
                ],
                names=["d1", "d2", "sp", "sa", "sb", "nn"],
            )

    return (
        q.mapInArrow(
            partials, "d1 int, d2 int, sp long, sa long, sb long, nn long"
        )
        .groupBy("d1", "d2")
        .agg(
            F.sum("sp").alias("s_prod"),
            F.sum("sa").alias("s_d1"),
            F.sum("sb").alias("s_d2"),
            F.sum("nn").alias("n"),
        )
    )


def cluster_profile(assign: DataFrame) -> DataFrame:
    """Per-cluster size + exact distance moments (int64 sums) — the
    balance/compactness audit a cluster-capped sampler reads."""
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dist_q").alias("sum_dist_q"),
        F.max("dist_q").alias("max_dist_q"),
    )
