"""Distributed byte-pair-encoding tokenizer training (Sennrich,
Haddow & Birch 2016, ACL — the merge-learning loop every modern LLM
tokenizer descends from; reference parity is the training-pipeline
role: the reference's output feeds tokenizer construction downstream
of extraction, and SURVEY §2 lists token counting/encoding as
first-class — this adds LEARNING the vocabulary, not just applying
one).

Semantics (deterministic, within-word BPE):

- Tokenize: lowercase, split on whitespace, keep non-empty tokens
  matching ``^[a-z0-9]+$`` (the alphanumeric vocabulary — sidesteps
  unicode-grapheme divergence between engines and guarantees tokens
  never contain the separator).
- Word-frequency table once: the ONLY corpus-sized stage (one
  map-side-combinable groupBy). Everything after runs on the
  vocabulary-sized table — Heaps' law keeps that sublinear in corpus
  size (~10^7-10^8 distinct words at 10^12 docs, still distributed,
  never collected).
- Each iteration: (1) adjacent-pair counts weighted by word
  frequency, overlapping occurrences counted per position exactly as
  the reference implementation's ``zip(symbols, symbols[1:])``;
  (2) argmax with a deterministic tie-break (count desc, then left,
  then right lexicographically); (3) apply the merge to every word's
  segmentation.

The merge application uses a padded double-space encoding:
segmentations are stored as ``' a  b  c '`` (tokens joined by TWO
spaces, single-space pads at both ends), so a plain non-overlapping
left-to-right ``replace(' a  b ', ' ab ')`` is EXACTLY the greedy
merge the reference applies (its ``re.sub`` is also left-to-right
non-overlapping): the match consumes one space of each boundary,
leaving single spaces that re-form valid pads/gaps, and token-aligned
matches are guaranteed because every token occurrence is
space-delimited while tokens themselves are space-free. This makes
each iteration expressible as ONE string replace — the same operator
in Spark and ANSI SQL, which is what lets the driver oracle unroll
the whole training loop exactly.

Scale shape per iteration: one vocabulary-sized groupBy (map-side
partials), one global top-1 (TakeOrdered — a k=1 reduction, not a
sort), one 1-row broadcast join applying the merge map-only. k
iterations = k small shuffles; nothing grows with executor count. An
empty pair table (vocabulary fully merged) empties the cascade from
that iteration on — deliberately mirrored in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "^[a-z0-9]+$"


def word_frequencies(docs: DataFrame) -> DataFrame:
    """documents(text) -> (word, n) over the alphanumeric vocabulary.
    The single corpus-sized stage of BPE training."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .where(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_seg(word):
    """word -> padded double-space char segmentation ' a  b  c '."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _pair_counts(w: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("seg")), "  ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        w.select("n", F.explode(pairs).alias("z"))
        .where(F.col("z.b").isNotNull())
        .groupBy(F.col("z.a").alias("a"), F.col("z.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )


def bpe_train(docs: DataFrame, iters: int = 5) -> DataFrame:
    """Learn `iters` BPE merges -> (it, lft, rgt, merged, pair_count),
    one row per iteration in learning order.

    Each iteration COLLECTS its single argmax row (driver state
    bounded by k merge rows total — the same boundedness class as
    curation.py's P-row pack offsets, never data-sized). Collecting
    the winner is what keeps the job linear: leaving the 1-row argmax
    lazy embeds iteration i's TakeOrdered subtree inside every later
    iteration's lineage, doubling the DAG per merge (measured: 2^k-1
    TakeOrdered nodes at k=5) — an exponential plan for a linear
    algorithm. With the winner collected, the apply is a literal
    string replace and iteration i+1 recomputes from the cached
    vocabulary table only. Empty pair table (vocabulary fully
    merged) -> fewer than k rows, mirrored by the SQL oracle's empty
    cascade."""
    spark = docs.sparkSession
    w = word_frequencies(docs).withColumn(
        "seg", _initial_seg(F.col("word"))
    )
    # cache: the corpus is shuffled exactly once; every iteration
    # reads the vocab-sized table from memory
    w = w.cache()
    prev = None
    merges: list[tuple] = []
    for it in range(1, iters + 1):
        rows = (
            _pair_counts(w).orderBy(F.desc("c"), "a", "b").limit(1).collect()
        )
        if prev is not None:
            prev.unpersist()
        prev = w
        if not rows:
            break
        a, b, c = rows[0]["a"], rows[0]["b"], int(rows[0]["c"])
        merges.append((it, a, b, a + b, c))
        if it == iters:
            break
        w = w.select(
            "word",
            "n",
            F.replace(
                F.col("seg"),
                F.lit(f" {a}  {b} "),
                F.lit(f" {a}{b} "),
            ).alias("seg"),
        ).cache()
    # the result is the collected merge list, not a view over w:
    # release every cached vocab table (same cache-freeing hygiene
    # as the graph/dedup iteration loops)
    w.unpersist()
    if prev is not None and prev is not w:
        prev.unpersist()
    return spark.createDataFrame(
        merges,
        "it int, lft string, rgt string, merged string, pair_count long",
    )


def bpe_segment(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply learned merges to the corpus vocabulary ->
    (word, n, subwords array<string>): join each word to its final
    segmentation after replaying the merge list in learning order.
    The merge list is tiny (k rows) and collected ONCE to drive the
    replay as a chain of column expressions — bounded by k, never by
    data."""
    ms = [
        (r["lft"], r["rgt"])
        for r in merges.orderBy("it").collect()
    ]
    w = word_frequencies(docs).withColumn(
        "seg", _initial_seg(F.col("word"))
    )
    col = F.col("seg")
    for a, b in ms:
        col = F.replace(
            col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
        )
    return w.select(
        "word", "n", F.split(F.trim(col), "  ").alias("subwords")
    )


def bpe_subword_counts(
    docs: DataFrame, iters: int = 5, top_k: int = 40
) -> DataFrame:
    """Corpus subword statistics after `iters` learned merges ->
    (subword, total bigint) for the top_k most frequent subwords
    (ties broken by subword) — the operator a tokenizer-coverage
    report runs. Scale: vocab-sized explode + one subword-keyed
    groupBy; the corpus is touched only by word_frequencies."""
    segs = bpe_segment(docs, bpe_train(docs, iters=iters))
    return (
        segs.select("n", F.explode("subwords").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("n").alias("total"))
        .orderBy(F.desc("total"), "subword")
        .limit(top_k)
    )


def lm_surprisal(
    docs: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al.
    2020 score documents by LM perplexity; ccnet_bucket then cuts the
    score into head/middle/tail terciles): an add-one-smoothed BIGRAM
    model trained on `train` (default: the corpus itself) scores each
    document's mean next-token surprisal.

    Integer-exact rendition: per adjacent pair the conditional
    p(w2|w1) = (c2 + 1) / (c1 + V) with V the training vocabulary
    size, and the per-pair surprisal is the repo's floor-log2 bitlen
    identity in whole bits: -floor(log2(num/den)) = ceil(log2(den/
    num)) = bitlen(ceil(den/num) - 1) for den > num (proof at
    textstats.pmi_bigrams), 0 when num == den. num = c2+1 <= c1+1 <=
    c1+V = den always, so the value is a non-negative int — bit-
    identical in any engine, no transcendental. Granularity is whole
    bits; raw totals ride along for finer driver-side calibration.

    Columns: doc_id, n_pairs, total_bits, bits_per_pair
    (total DIV n_pairs). Documents with fewer than two tokens carry
    no pairs and emit no row (mirrored by the oracle's group-by over
    exploded pairs).

    Scale shape: training is two corpus-sized aggregates that combine
    map-side (unigram + bigram counts, both vocabulary-sized after)
    plus a 1-row vocab count; scoring joins the corpus-sized pair
    stream against the bigram-vocab table on (w1, w2) and the unigram
    table on w1 — count sides have ONE row per key, so Zipf-hot keys
    are AQE-skew-splittable shuffle joins, never a fan-out; then one
    per-doc aggregate. Unseen pairs/words (train != score corpus)
    coalesce to c=0 — the add-one smoothing keeps them finite."""
    if train is None:
        train = docs

    def _tokarr(col):
        return F.filter(
            F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
        )

    tbase = train.select(_tokarr(F.col(text_col)).alias("t"))
    uni = (
        tbase.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    big = (
        tbase.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))

    pairs = docs.select(
        "doc_id", _tokarr(F.col(text_col)).alias("t")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")

    j = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, pairs["w1"] == uni["tok"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (F.coalesce(F.col("c2"), F.lit(0)) + 1).alias("num"),
            (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).alias("den"),
        )
        .withColumn(
            "bits",
            F.when(
                F.col("den") > F.col("num"),
                F.length(F.bin(F.expr("(den + num - 1) DIV num - 1"))).cast(
                    "long"
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("sum(bits) DIV count(1)").cast("long").alias(
            "bits_per_pair"
        ),
    )
