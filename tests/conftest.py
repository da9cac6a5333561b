from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    from two_tier_document_parser_spark.pipeline import session_tuning

    s = (
        session_tuning(
            SparkSession.builder.master("local[4]")
            .appName("ttdp-tests")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "4g")
        )
    ).getOrCreate()
    yield s
    s.stop()
