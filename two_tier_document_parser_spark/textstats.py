"""Text-analysis operators for a large-scale training-data pipeline:
language-id (stopword n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), document fingerprinting.

All JVM-side built-ins (split/regexp/aggregate/md5) — no Python UDFs,
so these run inside whole-stage codegen and push down through scans.
Integer-only outputs wherever a score is produced (deterministic
cross-engine comparison; floats excluded from the invariant, SURVEY
§7.7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spec import LANGS, STOPWORDS

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (matches the oracle-side
    DuckDB regexp_split_to_array + filter)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish tokenizer: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


def stop_hits(col: Column, lang: str) -> Column:
    """How many tokens are stopwords of `lang`."""
    return F.size(
        F.filter(tokens(F.lower(col)), lambda t: t.isin(list(STOPWORDS[lang])))
    )


def lang_guess(col: Column) -> Column:
    """Language-id heuristic: argmax of per-language stopword hits.
    A CASE chain in lexicographic language order — the first maximal
    language wins, so ties are deterministic (mirrored verbatim in the
    DuckDB oracle SQL)."""
    scores = {lang: stop_hits(col, lang) for lang in LANGS}
    order = sorted(LANGS)  # de en es fr zh — fixed tie-break order
    result = F.lit(order[-1])
    for lang in reversed(order[:-1]):
        cond = None
        for other in order:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        result = F.when(cond, F.lit(lang)).otherwise(result)
    return result


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality features per document: token count, BPE token
    count, punctuation count, chars, mean token length x100 (integer
    division), stopword hits (all languages)."""
    c = F.col(text_col)
    toks = tokens(c)
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_bpe_tokens", bpe_token_count(c).cast("long"))
        .withColumn(
            "n_punct",
            F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0))).cast("long"),
        )
        .withColumn("n_chars_m", F.length(c).cast("long"))
        .withColumn(
            "avg_tok_len_x100",
            F.expr(
                f"case when size(filter(split({text_col}, '\\\\s+'), t -> t != '')) > 0 "
                f"then aggregate(transform(filter(split({text_col}, '\\\\s+'), t -> t != ''), "
                f"t -> cast(length(t) as bigint)), cast(0 as bigint), (a, x) -> a + x) * 100 "
                f"div size(filter(split({text_col}, '\\\\s+'), t -> t != '')) else 0 end"
            ),
        )
        .withColumn(
            "n_stop",
            F.size(
                F.filter(tokens(F.lower(c)), lambda t: t.isin(all_stops))
            ).cast("long"),
        )
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (content-defined identity
    for exact dedup across formatting variants)."""
    return F.md5(F.array_join(tokens(F.lower(col)), " "))
