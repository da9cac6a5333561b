"""Table profiling: the data-quality pass a pipeline runs before
trusting a new 100 TB drop — per-column row/null/distinct counts and
min/max — computed in ONE scan.

Scale shape: all per-column aggregates live in a single `agg()` so the
table is read once with map-side partials; the per-column rows are
then unpivoted from the one-row aggregate result (an explode over a
literal-sized array — driver-shaped, not data-shaped). The exact
`countDistinct` set makes Catalyst plan an Expand (one duplicated
stream per distinct aggregate) — the standard cost of exact multi-
column distincts; at 100 TB swap `exact_distinct=False` to get
single-stream mergeable HLL sketches (`approx_count_distinct`), the
same swap the sketch_* queries document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_str, max_str).

    min/max are computed in the column's own type and cast to string
    afterwards (so numeric columns get numeric min/max, not
    lexicographic)."""
    cols = cols or df.columns
    distinct_of = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    # backtick-quote so the EXACT column name resolves (dots, spaces —
    # bare F.col("a.b") would mean struct access); intermediate aliases
    # are positional so no user name ever appears in an identifier
    def src(c):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(src(c)).cast("long").alias(f"__c{i}_nn"),
            distinct_of(src(c)).cast("long").alias(f"__c{i}_nd"),
            F.min(src(c)).cast("string").alias(f"__c{i}_min"),
            F.max(src(c)).cast("string").alias(f"__c{i}_max"),
        ]
    one = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                (F.col("__rows") - F.col(f"__c{i}_nn"))
                .cast("long")
                .alias("n_nulls"),
                F.col(f"__c{i}_nd").alias("n_distinct"),
                F.col(f"__c{i}_min").alias("min_str"),
                F.col(f"__c{i}_max").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(packed).alias("p")).select("p.*")
