"""Document retrieval scoring: BM25 top-k over the corpus for a
broadcast query-term set.

Reference parity note: the reference engine exposes extracted text
for downstream search/RAG consumers (README.md "structured output for
RAG pipelines"); this module supplies the retrieval step itself as a
relational plan — no index service, no Python in the hot path.

Integer-exact scoring (repo invariant, SURVEY §7.7.4): floats never
cross the engine-comparison boundary, so the classic Robertson/
Sparck-Jones log-idf is replaced by its argument — the RSJ odds ratio
(N - df + 0.5) / (df + 0.5), carried as an exact x1000 integer
(standard BM25 idf is ln(odds); the un-logged variant preserves the
df ordering while staying transcendental-free; the same substitution
spirit as ccnet_bucket's floor-log2 commonness). The tf saturation
term tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) is a pure rational in
integer inputs and is evaluated with single integer division after
clearing denominators — bit-identical in any engine.

Scale shape (10^12 docs): the token explode is filtered to the
query-term IN-list BEFORE any shuffle (predicate on the exploded
column, so only matching tokens survive the map side); df is a
sketch-sized aggregate (|Q| rows) broadcast back; doc length is a
map-side projection; the final top-k is TakeOrdered (no single-
partition Exchange). int64 headroom: the cleared-denominator
numerator is 22000 * tf * sum_dl — at 10^14 total tokens switch the
two products to DECIMAL(38,0), noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import token_count, tokens

__all__ = [
    "bm25_topk",
    "inverted_index",
    "inverted_index_merge",
    "sparse_topk_pairs",
]


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
) -> DataFrame:
    """Top-k documents for `query_terms` under integer-exact BM25
    (k1 = 1.2, b = 0.75, odds-ratio idf x1000).

    Per matched (doc, term):
      idf_m  = (2*(N - df) + 1) * 1000 DIV (2*df + 1)
      sat_m  = 22000 * tf * sum_dl
               DIV (10*tf*sum_dl + 3*sum_dl + 9*dl*N)
        (= 1000 * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) exactly,
         denominators cleared: k1=12/10, k1*(1-b)=3/10, k1*b=9/10)
      contrib = idf_m * sat_m DIV 1000
    Doc score = sum(contrib); ties broken by doc_id ascending.

    Columns: doc_id, n_terms_hit, score_x1000.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]

    dl = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("dl")
    )
    # one-row corpus fold (N docs, total token mass) — broadcast, the
    # same bounded-collect shape as the sketch queries
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )

    toks = docs.select(
        "doc_id",
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    ).filter(F.col("term").isin(q))  # map-side IN prune: non-query
    # tokens never reach the (doc_id, term) shuffle

    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )  # <= |Q| rows

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf_m",
            F.expr("(2 * (n_docs - df) + 1) * 1000 DIV (2 * df + 1)"),
        )
        .withColumn(
            # int64: 22000 * tf * sum_dl — DECIMAL(38,0) past ~1e14
            # total tokens
            "sat_m",
            F.expr(
                "22000 * tf * sum_dl DIV"
                " (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs)"
            ),
        )
        .withColumn("contrib", F.expr("idf_m * sat_m DIV 1000"))
    )

    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.sum("contrib").cast("long").alias("score_x1000"),
        )
        .orderBy(F.desc("score_x1000"), F.asc("doc_id"))
        .limit(k)  # TakeOrderedAndProject — no global sort exchange
    )


_TOPK_SALT = 64  # hot-term split width for the two-phase block rank


def _top_block(tf: DataFrame, cap: int) -> DataFrame:
    """Exact per-term top-`cap` rows by (tf DESC, doc_id ASC),
    computed two-phase to break stopword skew: phase 1 bounds work
    within (term, salt) slices — a corpus-dominating term's postings
    split `_TOPK_SALT` ways instead of serializing one task (the 1M
    soak measured ZERO 8->32 speedup on the single-phase window:
    Zipf's top token sat in one ~1M-row partition).

    Phase 2 ranks the <= SALT*cap survivors per term. Exact because
    any global top-cap row is also top-cap within its slice. The salt
    uses F.hash for distribution only; it never reaches the output.
    (A collect/array-sort aggregate formulation of phase 1 was
    measured SLOWER than the window at 1M docs — 66 s vs 56 s at 8
    cores — the per-group array materialization costs more than the
    partition sort; kept as the window.)"""
    from pyspark.sql import Window

    w1 = Window.partitionBy("term", "salt").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    w2 = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    pre = (
        tf.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(_TOPK_SALT)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= cap)
        .drop("rn1", "salt")
    )
    return pre.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= cap
    )


def inverted_index(
    docs: DataFrame, cap: int = 16
) -> DataFrame:
    """Inverted-index construction — the index-build step a BM25
    serving system runs over the extracted corpus: per term, document
    frequency, collection frequency, and an impact-ordered posting
    list (docs by tf descending, doc_id ascending — the WAND/impact-
    layout order) capped at `cap` entries.

    The cap is the skew guard: a stopword's postings are corpus-sized,
    so the full list can never be materialized per row (a production
    index block-splits; here the top-`cap` impact block is the
    deterministic, oracle-checkable unit). Block ranking is the
    two-phase salted top-k (_top_block) so a corpus-dominating term
    parallelizes instead of serializing one window task.

    Columns: term, df, cf, top_postings ("doc:tf" entries,
    comma-joined in impact order — tf rides along so an incremental
    merge can re-rank without touching committed documents, see
    inverted_index_merge).
    """
    tf = (
        docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    postings = (
        _top_block(tf, cap)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("top_postings")
        )
    )
    return stats.join(postings, "term").select(
        "term", "df", "cf", "top_postings"
    )


def sparse_topk_pairs(
    docs: DataFrame,
    k: int = 3,
    df_cap_permille: int = 600,
    df_cap_abs: int | None = None,
) -> DataFrame:
    """Per-document top-k lexically similar documents by an
    idf-weighted sparse dot product — similar-document search over
    the inverted index (the lexical counterpart of knn_bruteforce's
    dense cosine).

    score(a, b) = sum over shared terms of tf_a * tf_b * w(term)^2,
    w = bitlen(N DIV df) (floor(log2(N/df)) + 1 — integer-exact idf
    bits, >= 1 for any indexed term). Terms present in more than
    df_cap_permille/1000 of the corpus are pruned BEFORE the
    self-join (integer predicate df * 1000 <= N * permille, so the
    cut scales with the corpus): the skew guard (a stopword bucket
    is quadratic in df) and standard impact pruning in one — common
    terms carry ~zero idf weight anyway. Pairs materialize once
    (a < b), then mirror for the per-doc ranking window.

    `df_cap_abs` (r05, from the retrieval soak): a RELATIVE cap
    stops scaling once corpora get big — at 10^6+ docs even
    1 permille keeps df-1000 terms whose pair fan-out is df^2 = 10^6
    each, and integer permille cannot express a finer cut. The
    absolute cap is the production knob (classic impact-pruned
    similarity joins cap posting length absolutely); when set it
    applies IN ADDITION to the permille predicate. The registered
    driver query keeps the permille-only configuration (its oracle
    encodes it); the 1M-doc soak (jobs/index_soak.py --retrieval)
    measures the absolute cap bounding the hot bucket.

    Columns: src, dst, score, rnk (1..k per src; ties by dst asc).
    """
    from pyspark.sql import Window

    tf = (
        docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.expr(f"df * 1000 <= n_docs * {df_cap_permille}"))
    )
    if df_cap_abs is not None:
        dfreq = dfreq.filter(F.col("df") <= int(df_cap_abs))
    dfreq = dfreq.withColumn(
        "w", F.length(F.bin(F.expr("n_docs DIV df")))
    ).select("term", "w")
    ta = tf.join(dfreq, "term").select(
        "term", F.col("doc_id").alias("a"), F.col("tf").alias("tf_a"), "w"
    )
    tb = tf.join(dfreq, "term").select(
        "term", F.col("doc_id").alias("b"), F.col("tf").alias("tf_b")
    )
    pairs = (
        ta.join(tb, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.expr("tf_a * tf_b * w * w")).cast("long").alias("score"))
    )
    # the mirror union below references `pairs` twice; without a pin
    # the whole tokenize->tf->join subtree executes twice (and tf
    # itself twice more inside the self-join) — measured 27 exchanges
    # vs 7 pinned. Pair aggregates are the bounded artifact (one row
    # per candidate pair), the same pin the graph module applies to
    # its edge list.
    pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "score"
    ).unionByName(
        pairs.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "score"
        )
    )
    w_rank = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        sym.withColumn("rnk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("src", "dst", "score", "rnk")
    )


def inverted_index_merge(
    old_index: DataFrame, new_docs: DataFrame, cap: int = 16
) -> DataFrame:
    """Incremental inverted-index maintenance: merge a crawl
    increment into a committed index WITHOUT re-reading committed
    documents — the retrieval-family counterpart of
    dedup_incremental (new x old only, history never re-paired).

    Exactness REQUIRES new doc_ids disjoint from committed ones (and
    the same cap as the committed index): on overlap, df/cf would
    double-count and a posting block could list one doc twice. That
    precondition is now GUARDED, not assumed (r04 ADVICE fix): every
    increment (doc_id, term) row is checked against the committed
    posting blocks' doc ids — a bounded set (<= terms * cap ids, never
    the corpus) — and the job fails with a clear error instead of
    silently merging a duplicate. The guard is necessarily partial:
    a committed doc absent from EVERY top-cap block is invisible in
    the index artifact itself, so full disjointness remains the
    caller's contract (the driver query derives old/new from a
    partition predicate on doc_id, which guarantees it); the guard
    catches exactly the overlaps that would corrupt a posting block.

    Given disjointness, df/cf merge by addition, and top-cap of (old
    top-cap block ∪ new postings) equals top-cap of the full corpus —
    an old entry outside the committed block is dominated by `cap`
    committed entries that are all still present, so it can never
    enter the merged block (the standard monotone top-k merge
    property). The driver oracle exploits this: it recomputes the
    FULL index from scratch, so a green row proves merge == recompute.

    Scale shape: the increment's tf/window work is increment-sized;
    the committed side ships one bounded row per term (stats + the
    cap-length block, never the corpus); the merge itself is a
    term-keyed full outer join + map-side array sort of <= 2*cap
    entries.
    """
    new_tf = (
        new_docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # precondition guard: any increment doc already listed in a
    # committed posting block double-counts — fail loudly. Lazy
    # (assert_true folds into the merge job, no extra action); the
    # committed-block doc set is bounded by terms * cap.
    committed_docs = (
        old_index.select(
            F.explode(
                F.expr(
                    "transform(split(top_postings, ','),"
                    " p -> CAST(split(p, ':')[0] AS BIGINT))"
                )
            ).alias("doc_id")
        )
        .distinct()
        .withColumn("_committed", F.lit(True))
    )
    new_tf = (
        new_tf.join(
            committed_docs, new_tf["doc_id"] == committed_docs["doc_id"], "left"
        )
        .drop(committed_docs["doc_id"])
        .withColumn(
            "tf",
            F.when(
                F.assert_true(
                    F.col("_committed").isNull(),
                    F.concat(
                        F.lit(
                            "inverted_index_merge: increment doc_id "
                        ),
                        F.col("doc_id").cast("string"),
                        F.lit(" is already present in the committed index"),
                    ),
                ).isNull(),
                F.col("tf"),
            ),
        )
        .drop("_committed")
    )
    new_stats = new_tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_new"),
        F.sum("tf").cast("long").alias("cf_new"),
    )
    # the increment's block candidates via the same skew-splitting
    # two-phase rank as the base build
    new_block = _top_block(new_tf, cap).groupBy("term").agg(
        F.collect_list(
            F.struct(
                (-F.col("tf")).alias("neg_tf"),
                F.col("doc_id").cast("long").alias("doc_id"),
            )
        ).alias("pairs_new")
    )
    new_side = new_stats.join(new_block, "term")
    old_side = old_index.select(
        "term",
        F.col("df").alias("df_old"),
        F.col("cf").alias("cf_old"),
        F.expr(
            "transform(split(top_postings, ','), p -> struct("
            " -CAST(split(p, ':')[1] AS BIGINT) AS neg_tf,"
            " CAST(split(p, ':')[0] AS BIGINT) AS doc_id))"
        ).alias("pairs_old"),
    )
    merged = old_side.join(new_side, "term", "full_outer").select(
        "term",
        (
            F.coalesce("df_old", F.lit(0)) + F.coalesce("df_new", F.lit(0))
        ).cast("long").alias("df"),
        (
            F.coalesce("cf_old", F.lit(0)) + F.coalesce("cf_new", F.lit(0))
        ).cast("long").alias("cf"),
        F.expr(
            f"slice(array_sort(concat("
            f"  coalesce(pairs_old, array()),"
            f"  filter(coalesce(pairs_new, array()), p -> p IS NOT NULL)"
            f")), 1, {cap})"
        ).alias("pairs"),
    )
    return merged.select(
        "term",
        "df",
        "cf",
        F.array_join(
            F.transform(
                F.col("pairs"),
                lambda p: F.concat_ws(
                    ":",
                    p["doc_id"].cast("string"),
                    (-p["neg_tf"]).cast("string"),
                ),
            ),
            ",",
        ).alias("top_postings"),
    )
