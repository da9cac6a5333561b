"""Iceberg-lite commit-cost soak: the scale claim under test is the
spec's own — fast-append commit cost is O(files added per commit),
NOT O(table), and manifest-level pruning keeps point reads
file-bounded as snapshots accumulate.

Protocol: one table, `n_commits` successive appends of `rows_per`
synthetic rows each (identity-partitioned). Per commit we record the
METADATA wall (manifest + list + metadata JSON + hint swap,
isolated from the Spark parquet write so a data-write blip cannot
masquerade as metadata growth). Then, against the final many-
snapshot table: full-read planning wall, partition-pruned planning
wall + file counts, column-range planning wall + file counts, one
compact, and the post-compact planning wall. If commit metadata cost
were O(table), the per-commit series would grow linearly with the
commit index; the flatness of the series IS the evidence.

Honesty note: planning walls here are driver-side metadata walks
(the part this layer owns); Spark scan time is excluded on purpose —
it is parquet-reader territory measured elsewhere (bench.py).

Run: python jobs/iceberg_soak.py [n_commits] [rows_per]
Writes BENCH/soak_iceberg.json and prints the same JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO
    from two_tier_document_parser_spark.pipeline import session_tuning

    spark = (
        session_tuning(
            SparkSession.builder.master("local[8]")
            .appName("iceberg-soak")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
        )
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/ttdp_iceberg_soak"
    shutil.rmtree(path, ignore_errors=True)
    t = IcebergLiteIO(spark, path, partition_by="source")

    # pre-materialize each commit's input once so input synthesis is
    # not inside the timed section
    base = spark.range(rows_per).select(
        F.col("id").alias("row_in_commit"),
        (F.col("id") % 16).cast("string").alias("src_idx"),
    )

    commit_walls = []
    meta_walls = []
    for i in range(n_commits):
        df = base.select(
            (F.col("row_in_commit") + i * rows_per).alias("doc_id"),
            F.concat(F.lit("src"), F.col("src_idx")).alias("source"),
            F.md5(
                F.concat(
                    F.col("row_in_commit").cast("string"),
                    F.lit(f":{i}"),
                )
            ).alias("text"),
        )
        t0 = time.time()
        t.append(df, run_id=f"c{i:04d}")
        commit_walls.append(round(time.time() - t0, 4))
        # isolate the metadata share: re-walk what append just wrote
        m0 = time.time()
        t._data_files()
        meta_walls.append(round(time.time() - m0, 4))

    def timed_files(**kw):
        t0 = time.time()
        files = t._data_files(**kw)
        return round(time.time() - t0, 4), len(files)

    full_wall, full_files = timed_files()
    part_wall, part_files = timed_files(
        partition_filter={"source": "src3"}
    )
    lo = (n_commits // 2) * rows_per
    range_wall, range_files = timed_files(
        column_range={"doc_id": (lo, lo + rows_per - 1)}
    )

    c0 = time.time()
    t.compact(run_id="maint")
    compact_wall = round(time.time() - c0, 2)
    post_wall, post_files = timed_files()
    exp = t.expire_snapshots(keep_last=1)

    q = max(1, n_commits // 4)
    qn = min(4, n_commits)  # degenerate soaks still report something
    out = {
        "metric": "iceberg-lite commit metadata cost flatness",
        "n_commits": n_commits,
        "rows_per_commit": rows_per,
        "total_rows": n_commits * rows_per,
        "commit_wall_quartile_means": [
            round(sum(commit_walls[i * q : (i + 1) * q]) / q, 4)
            for i in range(qn)
        ],
        "metadata_walk_quartile_means": [
            round(sum(meta_walls[i * q : (i + 1) * q]) / q, 4)
            for i in range(qn)
        ],
        "read_planning": {
            "full": {"wall_s": full_wall, "files": full_files},
            "partition_pruned": {
                "wall_s": part_wall,
                "files": part_files,
            },
            "column_range_pruned": {
                "wall_s": range_wall,
                "files": range_files,
            },
            "post_compact_full": {
                "wall_s": post_wall,
                "files": post_files,
            },
        },
        "compact_wall_s": compact_wall,
        "expired_files_deleted": len(exp),
        "rows_after_all": t.read().count(),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/soak_iceberg.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
