"""Adapter: driver `documents` table -> `documents_raw` span schema.

The driver-provided tables (/root/testdata/sf*/documents.parquet:
doc_id int64, text string, lang, source, n_chars) carry flat text.
This adapter lifts them into the engine's interleaved-span input
schema (FIXTURES.md §1) entirely with JVM built-ins — `transform`
over `split` — so the driver smoke/correctness queries exercise the
real pipeline with zero Python in the lift.

Mapping: one text span per sentence-ish chunk of W words (deterministic
whitespace tokenization), doc_class='html', n_pages=1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORDS_PER_SPAN = 12


def documents_to_raw(docs: DataFrame, words_per_span: int = WORDS_PER_SPAN) -> DataFrame:
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    n = F.size(toks)
    w = F.lit(words_per_span)
    # chunk i covers tokens [i*w, (i+1)*w)
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest((n + w - 1) / w, F.lit(1)).cast("int") - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.array_join(F.slice(toks, i * w + 1, words_per_span), " ").alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return docs.select(
        F.format_string("d%09d", F.col("doc_id")).alias("doc_id"),
        F.lit("html").alias("doc_class"),
        F.lit(1).cast("int").alias("n_pages"),
        chunks.alias("spans"),
    )
