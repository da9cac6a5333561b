"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products via
  zip_with + aggregate in DOUBLE math (JVM-side, codegen). Ranking
  rounds similarity to 6 decimals and tie-breaks on vec_id so the
  ordering is reproducible bit-for-bit in the DuckDB oracle; only
  integer columns (query, candidate, rank) cross the invariant.
- LSH-bucketed ANN (sign random projection): deterministic
  pseudo-hyperplanes derived from xxhash64(plane, dim) — bucket join
  replaces the cross join. Spark-only (rows-only check) since the
  hyperplane hash is engine-specific.

Scale notes: brute force is O(Q*N) — fine for reranking, wrong as the
only path at 10^9 vectors. The LSH variant buckets both sides and
joins on the 16-bit signature, turning the cross join into a
hash-partitioned equi-join; recall is tunable via n_planes/n_tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: (query, candidate, rank). Self-matches
    excluded. `queries` has columns (query:int64, qvec:array<float>)."""
    joined = queries.crossJoin(
        emb.select(F.col(id_col).alias("candidate"), F.col(vec_col).alias("cvec"))
    ).filter(F.col("query") != F.col("candidate"))
    sims = joined.select(
        "query",
        "candidate",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query").orderBy(
        F.desc("sim"), F.asc("candidate")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query", "candidate", "rank")
    )


def srp_signature(vec: Column, n_planes: int = N_PLANES, table: int = 0) -> Column:
    """Sign-random-projection signature: bit p = sign of dot(vec, h_p)
    where h_p[d] = +1/-1 from xxhash64(table*1024+p, d). Deterministic,
    no stored model, computable JVM-side. `table` selects an
    independent hash table (OR-construction for recall)."""
    base = table * 1024

    def plane_dot(pp: Column) -> Column:
        p = pp + F.lit(base)
        # iterate dims via transform over the vector with positional index
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x.cast("double")
                * (F.pmod(F.xxhash64(p, d), F.lit(2)).cast("double") * 2.0 - 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # fold plane bits into an int as a base-2 number (shiftleft needs a
    # literal shift, so use acc*2+bit instead)
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda p: F.when(plane_dot(p) > 0, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc * 2 + x,
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: multi-table SRP-LSH (OR-construction — a candidate
    qualifies if it shares ANY table's bucket with the query), exact
    cosine rerank within the candidate set. At 10^9 vectors this
    replaces the O(Q*N) cross join with n_tables hash-partitioned
    equi-joins on (table, sig); recall tunes via n_planes/n_tables."""
    tables = F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("tbl")

    def with_sigs(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        out = df.select("*", tables)
        # CASE over table id (each table has independent hyperplanes)
        expr = F.lit(None).cast("int")
        for t in range(n_tables):
            expr = F.when(
                F.col("tbl") == t, srp_signature(F.col(vecc), n_planes, table=t)
            ).otherwise(expr)
        return out.withColumn("sig", expr)

    cand = with_sigs(
        emb.select(F.col(id_col).alias("candidate"), F.col(vec_col).alias("cvec")),
        "candidate",
        "cvec",
    ).select("candidate", "cvec", "tbl", "sig")
    q = with_sigs(queries, "query", "qvec").select("query", "qvec", "tbl", "sig")
    joined = (
        q.join(cand, ["tbl", "sig"])
        .filter(F.col("query") != F.col("candidate"))
        .select("query", "qvec", "candidate", "cvec")
        .dropDuplicates(["query", "candidate"])
    )
    sims = joined.select(
        "query",
        "candidate",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query").orderBy(F.desc("sim"), F.asc("candidate"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query", "candidate", "rank")
    )
