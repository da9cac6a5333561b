"""Codec soak: the web-image codec roundtrip (PNG / GIF / lossless
WebP via multimodal.codec_roundtrip_stats) at 10^6 documents — 2000x
the sf0.01 table — with the repo's three scale evidence classes:

- ARITHMETIC GROUND TRUTH: every decoded pixel statistic has a
  closed-form integer value (the gradient image is (doc_id + x + y)
  % 256), so the soak verifies sum(pix_sum) and sum(pix_min/max
  fingerprints) against a numpy-vectorized exact computation over
  all doc_ids — the soak-scale analog of the sf0.01 DuckDB oracle,
  at a volume where any LZW width-sync, VP8L prefix, or PNG filter
  defect would be hit millions of times.
- CROSS-PARALLELISM BIT-EQUALITY: the kernel is deterministic per
  row, so local[8] and local[32] must produce IDENTICAL aggregate
  fingerprints.
- SCALING: same job at two parallelism levels on the same parquet
  (the sandbox stand-in for the N->4N cluster-size criterion):
  throughput at both + efficiency; in-band /proc/stat steal, reps
  with steal > 1% discarded, 45 s quiesce between runs; peak
  subprocess-tree RSS at 0.5 s cadence (the kernel holds one Arrow
  batch per task — no driver state). The work is a map-only Arrow
  pass (no shuffle), so this family SHOULD scale near-linearly —
  a below-0.8 efficiency here would indict the harness, not the
  plan shape.

Run: python jobs/codec_soak.py [n_docs] [--cores 8,32]
Writes BENCH/soak_codecs.json and prints the same JSON line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _load_meta, _load_snapshot  # noqa: E402

STEAL_CONTENDED_PCT = 1.0
QUIESCE_S = 45

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
corpus, cores = sys.argv[1], int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from two_tier_document_parser_spark.multimodal import codec_roundtrip_stats
docs = spark.read.parquet(corpus)
t0 = time.time()
stats = codec_roundtrip_stats(docs)
agg = stats.agg(
    F.count("*").alias("n"),
    F.sum("pix_sum").alias("total_sum"),
    F.sum(F.col("pix_min").cast("long") * (F.col("doc_id") % 9973)).alias("fp_min"),
    F.sum(F.col("pix_max").cast("long") * (F.col("doc_id") % 9973)).alias("fp_max"),
    F.sum(F.col("width").cast("long") * F.col("height")).alias("total_px"),
).collect()[0]
wall = time.time() - t0
print(json.dumps({{
    "cores": cores, "docs": int(agg["n"]),
    "wall_sec": round(wall, 2),
    "docs_per_sec": round(agg["n"] / wall, 1),
    "pixels_per_sec": round(int(agg["total_px"]) / wall, 1),
    "total_sum": int(agg["total_sum"]), "fp_min": int(agg["fp_min"]),
    "fp_max": int(agg["fp_max"]), "total_px": int(agg["total_px"]),
}}))
"""


def expected_totals(n: int) -> dict:
    """Exact closed-form totals over doc_ids 0..n-1, vectorized: the
    gradient value at (y, x) is (d + x + y) % 256 and the antidiagonal
    k = x + y has count c_k = |{(x, y): x<w0, y<h0, x+y=k}|."""
    d = np.arange(n, dtype=np.int64)
    w0 = 8 + d % 9
    h0 = 8 + (d // 9) % 9
    base = d % 256
    total_sum = np.zeros(n, dtype=np.int64)
    kmax = int((w0 + h0).max()) - 1
    for k in range(kmax):
        c = np.minimum(
            np.minimum(k + 1, w0 + h0 - 1 - k), np.minimum(w0, h0)
        )
        c = np.maximum(c, 0)
        total_sum += c * ((base + k) % 256)
    # min/max over the k range 0..w0+h0-2 of (base + k) % 256
    span = w0 + h0 - 1
    wraps = base + span > 256
    pix_min = np.where(wraps, 0, base)
    pix_max = np.where(wraps, np.minimum(base + span - 1, 255), base + span - 1)
    # full wrap (span >= 256) impossible here (span <= 31)
    fpw = d % 9973
    return {
        "total_sum": int(total_sum.sum()),
        "fp_min": int((pix_min * fpw).sum()),
        "fp_max": int((pix_max * fpw).sum()),
        "total_px": int((w0 * h0).sum()),
    }


def materialize(n: int) -> str:
    out = Path(f"/tmp/codec_soak_{n}")
    if (out / "_SUCCESS").exists():
        return str(out)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.range(n).selectExpr("id AS doc_id").repartition(64).write.mode(
        "overwrite"
    ).parquet(str(out))
    spark.stop()
    return str(out)


def run_child(corpus: str, cores: int) -> dict:
    script = CHILD.format(repo=str(REPO))
    snap0 = _load_snapshot()
    proc = subprocess.Popen(
        [sys.executable, "-c", script, corpus, str(cores)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    peak = 0
    while proc.poll() is None:
        ppid, rss = {}, {}
        for pid_dir in Path("/proc").glob("[0-9]*"):
            try:
                stat = (pid_dir / "status").read_text()
            except OSError:
                continue
            pid = int(pid_dir.name)
            for ln in stat.splitlines():
                if ln.startswith("PPid:"):
                    ppid[pid] = int(ln.split()[1])
                elif ln.startswith("VmRSS:"):
                    rss[pid] = int(ln.split()[1])

        def in_tree(pid: int) -> bool:
            seen = 0
            while pid > 1 and seen < 64:
                if pid == proc.pid:
                    return True
                pid = ppid.get(pid, 0)
                seen += 1
            return False

        peak = max(peak, sum(v for p_, v in rss.items() if in_tree(p_)))
        time.sleep(0.5)
    rec = json.loads(proc.stdout.read().strip().splitlines()[-1])
    rec["peak_tree_rss_gb"] = round(peak / 1024 / 1024, 2)
    rec["load"] = _load_meta(snap0, _load_snapshot())
    rec["contended"] = rec["load"].get("steal_pct", 0.0) > STEAL_CONTENDED_PCT
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    corpus = materialize(args.n)
    exp = expected_totals(args.n)
    cores = [int(c) for c in args.cores.split(",")]
    rungs: dict[int, list[dict]] = {}
    for c in cores:
        for _ in range(args.reps):
            time.sleep(QUIESCE_S)
            rungs.setdefault(c, []).append(run_child(corpus, c))
    best = {}
    for c, reps in rungs.items():
        calm = [r for r in reps if not r["contended"]] or reps
        best[c] = min(calm, key=lambda r: r["wall_sec"])
    fps = {
        c: (b["total_sum"], b["fp_min"], b["fp_max"], b["total_px"])
        for c, b in best.items()
    }
    ground_truth_ok = all(
        fp == (exp["total_sum"], exp["fp_min"], exp["fp_max"], exp["total_px"])
        for fp in fps.values()
    )
    lo, hi = min(cores), max(cores)
    eff = (
        best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"] / (hi / lo)
        if lo != hi
        else 1.0
    )
    result = {
        "op": "codec_roundtrip_stats (PNG/GIF/VP8L encode+decode per doc)",
        "n_docs": args.n,
        "rungs": {str(c): best[c] for c in cores},
        "raw_reps": rungs,
        "bit_identical_across_cores": len(set(fps.values())) == 1,
        "arithmetic_ground_truth_ok": ground_truth_ok,
        "expected": exp,
        "scaling_efficiency": round(eff, 3),
        "note": (
            "every aggregate equals a closed-form integer computed "
            "independently in numpy (expected); the kernel is map-only "
            "(no shuffle), so scaling reflects pure Python codec "
            "throughput under Spark task scheduling."
        ),
    }
    out = REPO / "BENCH" / "soak_codecs.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "raw_reps"}))


if __name__ == "__main__":
    main()
