"""Driver-contract smoke + DuckDB parity on a representative subset
(the driver runs the full set; tests/parity_harness.py runs all 30
locally)."""

from __future__ import annotations

from pathlib import Path

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not Path(SF).exists(), reason="driver testdata not present"
)

SUBSET = [
    "scan_project",
    "route_tier",
    "explode_tokens",
    "dedup_exact",
    "lang_guess",
    "knn_bruteforce",
    "pipeline_documents",
    "sketch_quantiles",
    "sketch_distinct_hll",
]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert {r.tier for r in rows} <= {"fast", "deep", "error"}
    assert all(r.n_spans >= 0 for r in rows)


def test_queries_have_oracles():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 25  # SQL-checked surface
    assert len(qs) >= 29


@pytest.mark.parametrize("name", SUBSET)
def test_duckdb_parity(spark, name):
    import duckdb

    import __spark_entry__ as e
    from parity_harness import TABLES, compare_frames

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    diff = compare_frames(e.queries()[name](spark, SF), con.sql(e.oracle_sql()[name]))
    assert diff is None, diff
