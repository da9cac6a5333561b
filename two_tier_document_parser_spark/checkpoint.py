"""Checkpointed, resumable extraction runs (SURVEY §4.3.5, O17-O19).

Every run commits its output atomically (table_io) and appends
per-partition lineage rows (run_id, partition_id, doc_id range,
counts, wall) to a `_lineage` side table. Resume = left-anti join of
the input against the doc_ids already present in committed runs —
restart after a kill reprocesses only the remainder, and re-running a
completed job is a no-op (tested by the kill-and-resume test).

Scale note: the anti-join shown here joins on exact doc_ids — correct
at any scale but it shuffles the committed-id set. For 10^12 docs,
pair `repartitionByRange(doc_id)` on the write with the lineage
(doc_id_min, doc_id_max) ranges: resume then prunes whole committed
ranges with a range predicate (no shuffle) and anti-joins only the
boundary partitions. The lineage schema carries exactly the columns
needed for that (FIXTURES.md §3).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract
from .table_io import ParquetManifestIO


def lineage_rows(out: DataFrame, run_id: str, wall_ms: int) -> DataFrame:
    """One lineage row per partition of the (written) output."""
    return (
        out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("spans")).cast("long").alias("n_spans"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
        .withColumn("attempt", F.lit(1).cast("int"))
        .withColumn("committed_at", F.current_timestamp())
    )


class CheckpointedExtract:
    def __init__(self, spark: SparkSession, out_path: str) -> None:
        self.spark = spark
        self.data = ParquetManifestIO(spark, out_path)
        self.lineage = ParquetManifestIO(spark, out_path + "_lineage")

    def committed_doc_ids(self) -> DataFrame | None:
        done = self.data.read()
        return done.select("doc_id") if done is not None else None

    def run(self, raw: DataFrame, presplit: int = 0, **extract_kw) -> str:
        """Extract everything not yet committed; returns run_id.
        `presplit` > 0 routes through the giant-doc page pre-split at
        that span threshold (same semantics as the plain job)."""
        self.data.drop_uncommitted()
        t0 = time.time()
        todo = raw
        done = self.committed_doc_ids()
        if done is not None:
            todo = raw.join(done, "doc_id", "left_anti")
        run_id = uuid.uuid4().hex[:12]
        if presplit:
            from .presplit import extract_with_presplit

            out = extract_with_presplit(
                self.spark, todo, threshold=presplit, **extract_kw
            )
        else:
            out = extract(self.spark, todo, **extract_kw)
        self.data.append(out, run_id)
        written = self.spark.read.parquet(
            f"{self.data.path}/runs/{run_id}"
        )
        wall_ms = int((time.time() - t0) * 1000)
        self.lineage.append(lineage_rows(written, run_id, wall_ms), run_id)
        return run_id

    def result(self) -> DataFrame | None:
        return self.data.read()

    def metrics(self) -> DataFrame | None:
        return self.lineage.read()
