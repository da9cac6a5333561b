"""Local stand-in for the driver's DuckDB correctness gate: run every
queries() entry and its oracle_sql() side-by-side at sf0.01, compare
row count + column names + order-insensitive values.

Run directly for a full report: python tests/parity_harness.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def compare_frames(sdf, duck_rel) -> str | None:
    """None if equal, else a mismatch description."""
    import pandas as pd

    a = sdf.toPandas()
    b = duck_rel.df()
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    cols = sorted(a.columns)
    a = a[cols]
    b = b[cols]

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in cols:
            s = df[c]
            if s.dtype.kind in "iuf":
                # coerce all numerics to one dtype so DuckDB HUGEINT->
                # float64 vs Spark int64 don't spuriously differ
                out[c] = s.astype("float64").round(6)
            else:
                out[c] = s.astype(str)
        return (
            pd.DataFrame(out)
            .sort_values(cols, kind="mergesort")
            .reset_index(drop=True)
        )

    ca, cb = canon(a), canon(b)
    if not ca.equals(cb):
        neq = (ca != cb).any(axis=1)
        i = neq.idxmax()
        return f"values differ, first at sorted row {i}:\n  spark={ca.iloc[i].to_dict()}\n  duck ={cb.iloc[i].to_dict()}"
    return None


def run(sf_dir: str, only: list[str] | None = None) -> dict[str, str | None]:
    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession
    from two_tier_document_parser_spark.pipeline import session_tuning

    spark = session_tuning(
        SparkSession.builder.master("local[8]")
        .appName("parity")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, str | None] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            # rows-only check
            try:
                n = fn(spark, sf_dir).count()
                results[name] = None if n >= 0 else "negative count?"
                print(f"{name:24s} rows-only: {n} rows")
            except Exception as e:  # noqa: BLE001
                results[name] = f"SPARK ERROR: {e}"
                print(f"{name:24s} SPARK ERROR: {e}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            rel = con.sql(oracles[name])
            diff = compare_frames(sdf, rel)
            results[name] = diff
            print(f"{name:24s} {'OK' if diff is None else 'MISMATCH: ' + diff}")
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR: {e}"
            print(f"{name:24s} ERROR: {type(e).__name__}: {str(e)[:300]}")
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    res = run(sf, only)
    bad = {k: v for k, v in res.items() if v is not None}
    print(f"\n{len(res) - len(bad)}/{len(res)} OK")
    if bad:
        sys.exit(1)
