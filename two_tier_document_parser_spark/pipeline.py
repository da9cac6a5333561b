"""End-to-end extraction job graph (SURVEY §3.4).

    scan -> validate (quarantine invalid rows, never throw)
         -> route (broadcast model, JVM-only)  [classify]
         -> persist routed                     [single-pass split]
         -> salt + repartition                 [skew defeat]
         -> tier1 mapInArrow | tier2 mapInArrow
         -> unionByName(+ error rows)          [one output table]

Design notes for 100 TB:
- the only JVM->Python hops are the two tier UDFs (Arrow batches);
  routing/validation/union are whole-stage-codegen;
- `salt` folds pmod(xxhash64(doc_id), S) into the repartition so giant
  documents from one producer spread across tasks (SURVEY §4.3.1);
- Arrow batch size is capped (ARROW_BATCH) so a batch of giant docs
  cannot blow the Python worker heap;
- classify-then-split persists the routed frame once
  (MEMORY_AND_DISK) so the scan is not executed per tier; pass
  persist=False to prefer double-scan-with-pushdown when input is a
  cheap columnar scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .routing import with_tier
from .tier1 import tier1_map
from .tier2 import tier2_map

ARROW_BATCH = 256


def ship_package(spark: SparkSession) -> str:
    """Ship this package to executors (the programmatic equivalent of
    `spark-submit --py-files engine.zip`). Required whenever the
    driver's CWD is not the repo root — Python workers import the
    tier UDF modules by name."""
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="ttdp_pyfiles_"), f"{pkg_name}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    return zpath


def session_tuning(builder):
    """Recommended conf for the extraction workload."""
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )


def validate_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O2: route invalid rows to quarantine instead of raising
    (reference returns 400/413, fast/app.py:61-73; a 10^12-doc job
    cannot afford exceptions)."""
    valid_pred = (
        F.col("doc_id").isNotNull()
        & (F.size("spans") > 0)
        & (F.col("n_pages") >= 1)
    )
    return df.filter(valid_pred), df.filter(~valid_pred)


def _error_rows(df: DataFrame, reason: str) -> DataFrame:
    return df.select(
        F.coalesce(F.col("doc_id"), F.lit("")).alias("doc_id"),
        F.lit("error").alias("tier"),
        F.lit(0).cast("int").alias("pages"),
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,order:int>>"
        ).alias("spans"),
        F.lit("").alias("markdown"),
        F.lit(0).cast("int").alias("n_images"),
        F.lit(0).cast("int").alias("n_tables"),
        F.lit(0).cast("int").alias("n_formulas"),
        F.array().cast("array<int>").alias("skipped_pages"),
        F.lit(0).cast("bigint").alias("processing_time_ms"),
        F.lit(reason).alias("error"),
    )


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    return df.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)))


def extract(
    spark: SparkSession,
    raw: DataFrame,
    *,
    persist: bool = True,
    salt: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """documents_raw -> documents_out (FIXTURES.md §2)."""
    ok, bad = validate_split(raw)
    routed = with_tier(ok, spark)
    if salt:
        routed = with_salt(routed, salt)
        routed = routed.repartition(
            n_partitions or spark.sparkContext.defaultParallelism,
            "doc_id",
            "salt",
        ).drop("salt")
    elif n_partitions:
        routed = routed.repartition(n_partitions, "doc_id")
    if persist:
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

    fast = tier1_map(routed.filter(F.col("tier") == "fast"))
    deep = tier2_map(routed.filter(F.col("tier") == "deep"))
    empty = _error_rows(
        routed.filter(F.col("tier") == "error"), "empty document"
    )
    quarantined = _error_rows(bad, "validation failed")
    return fast.unionByName(deep).unionByName(empty).unionByName(quarantined)
