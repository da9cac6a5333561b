"""Semantic-dedup soak: the SemDeDup cascade (SRP-LSH candidates ->
hoisted-norm cosine verify -> star components -> keep-one) on a
1M-vector synthetic embedding corpus — 500x the sf0.1 table — with
the three pieces of evidence the 100x-scale claims need:

- PLANTED-TRUTH RECALL: the corpus embeds known duplicate clusters
  (ids with id % 20 in {1,2,3} are tight near-copies, cosine ~0.997,
  of their cluster base id - id % 20); after the run we measure the
  fraction of planted members whose rep_id is exactly their cluster
  base. No exact all-pairs baseline is feasible at 1M — the planted
  structure IS the ground truth.
- SCALING: the identical job at local[8] and local[32] on the same
  parquet, reporting throughput at both plus N->4N efficiency (the
  BASELINE.json two-cluster-size criterion, evidenced by parallelism
  levels per the sandbox rule).
- MEMORY: peak RSS of the subprocess tree sampled at 0.5 s cadence —
  the plan's footprint must be set by partition sizing, not corpus
  size.

Scale-path LSH parameters (planes_for(n) x 8 tables) — bucket width
tracks corpus size (~1 expected row per bucket per table), NOT the
full-recall sf0.01-oracle config the driver checks (4 planes there
would put the whole 1M corpus in 16 buckets).
Threshold 0.90: SemDeDup's regime — the paper dedups at high cosine;
the sf tables' 0.44 exists for oracle-exactness on a tiny corpus.

Run: python jobs/soak_semantic.py [n_vectors] [--cores 8,32]
Writes BENCH/soak_semantic.json and prints the same JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DIM = 64
N_TABLES = 8
THRESHOLD_X100 = 90


def planes_for(n: int) -> int:
    """Bucket width must track corpus size: ~1 expected row per
    bucket per table keeps candidate generation proportional to true
    pairs instead of birthday collisions (measured at 1M vectors:
    20 planes -> 11.7M candidate pairs for 299k true pairs and a
    36 s verify join; 24 planes -> 0.7M candidates, 3.3x faster
    end-to-end, planted recall unchanged at 99.99%). Capped at 28;
    the int32 signature packs up to 31 bits."""
    import math

    return min(28, max(16, int(math.log2(max(n, 2))) + 4))


def materialize(n: int) -> str:
    """Deterministic embedding corpus with planted duplicate
    clusters: id % 20 == 0 is a cluster base (fresh unit vector from
    a per-base RNG); id % 20 in {1,2,3} is base + N(0, 0.01) noise,
    renormalized (cosine ~0.997 to the base); everything else is an
    independent unit vector. Fully per-row (base id is arithmetic on
    the row id), so generation is one mapInArrow pass — no joins, no
    driver-side state."""
    corpus = f"/tmp/ttdp_soak_emb_v2_{n}"
    if (Path(corpus) / "_SUCCESS").exists():
        return corpus
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            ids = b.column("id").to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for i, vid in enumerate(ids):
                r = int(vid) % 20
                base = int(vid) - r if r in (1, 2, 3) else int(vid)
                rng = np.random.default_rng(base * 2 + 1)
                v = rng.standard_normal(DIM)
                v /= np.linalg.norm(v)
                if r in (1, 2, 3):
                    nz = np.random.default_rng(int(vid) * 2).standard_normal(
                        DIM
                    )
                    v = v + 0.01 * nz
                    v /= np.linalg.norm(v)
                out[i] = v
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(list(out))],
                names=["vec_id", "embedding"],
            )

    df = spark.range(n, numPartitions=64).mapInArrow(
        gen, "vec_id long, embedding array<float>"
    )
    df.write.mode("overwrite").parquet(corpus)
    spark.stop()
    return corpus


# shuffle partitions are DATA-sized (32 for the ~2 GB signature
# volume), identical at both core counts so the scaling pair compares
# the same physical plan: cores*4=128 partitions measured 2.7x slower
# at 32 cores on this cascade (more, smaller sort runs over
# vector-payload rows).
CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
corpus, cores = sys.argv[1], int(sys.argv[2])
q8_path = sys.argv[3] if len(sys.argv) > 3 else ""
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from two_tier_document_parser_spark.similarity import semantic_dedup
emb = spark.read.parquet(corpus)
q8 = spark.read.parquet(q8_path + "/runs/q8") if q8_path else None
t0 = time.time()
res = semantic_dedup(
    emb, threshold_x100={thr}, n_planes={planes}, n_tables={tables},
    max_bucket=2000, q8_table=q8,
).localCheckpoint()
n = res.count()
wall = time.time() - t0
kept = res.filter(F.col("keep") == 1).count()
# planted-truth recall: members (id%20 in 1..3) must point at their base
members = res.filter(F.col("vec_id") % 20 >= 1).filter(F.col("vec_id") % 20 <= 3)
n_members = members.count()
hit = members.filter(
    F.col("rep_id") == F.col("vec_id") - F.col("vec_id") % 20
).count()
print(json.dumps({{
    "cores": cores, "rows": n, "kept": kept, "dropped": n - kept,
    "wall_sec": round(wall, 2),
    "vectors_per_sec": round(n / wall, 1),
    "planted_members": n_members, "planted_hit": hit,
    "planted_recall": round(hit / max(n_members, 1), 6),
}}))
"""


def quantize_corpus(corpus: str, n: int) -> str:
    """Write the "q8 at rest" layout beside the float corpus (the
    quantize-at-ingest cost, paid once outside every timed run)."""
    q8_path = f"{corpus}_q8"
    if (Path(q8_path) / "_manifest.json").exists():
        return q8_path
    from pyspark.sql import SparkSession

    from two_tier_document_parser_spark.similarity import quantize_at_ingest

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    quantize_at_ingest(spark, spark.read.parquet(corpus), q8_path)
    spark.stop()
    return q8_path


def run_child(corpus: str, cores: int, n: int, q8_path: str = "") -> dict:
    """Run one cascade in a subprocess; sample the tree's peak RSS."""
    script = CHILD.format(
        repo=str(REPO),
        thr=THRESHOLD_X100,
        planes=planes_for(n),
        tables=N_TABLES,
    )
    launch_load = round(os.getloadavg()[0], 2)
    proc = subprocess.Popen(
        [sys.executable, "-c", script, corpus, str(cores), q8_path],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    peak = 0
    while proc.poll() is None:
        # full descendant tree (java is a child, python workers are
        # grandchildren under java)
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
        total = sum(v for p_, v in rss.items() if in_tree(p_))
        peak = max(peak, total)
        time.sleep(0.5)
    out = proc.stdout.read()
    rec = json.loads(out.strip().splitlines()[-1])
    rec["peak_tree_rss_gb"] = round(peak / 1024 / 1024, 2)
    rec["loadavg_1m_at_launch"] = launch_load
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument(
        "--q8-compare",
        action="store_true",
        help="float vs pre-quantized verify at the first core count; "
        "writes BENCH/soak_semantic_q8.json (r04 verdict task #7)",
    )
    args = ap.parse_args()
    load0 = os.getloadavg()[0]
    corpus = materialize(args.n)
    if args.q8_compare:
        cores = int(args.cores.split(",")[0])
        q8_path = quantize_corpus(corpus, args.n)
        # paired A/B reps with a quiesce gap — the first capture of
        # this comparison recorded the q8 run at loadavg 19 (machine
        # still draining the float run) and was discarded under the
        # repo's contended-capture rule; the min of two reps per arm
        # with cool-downs is the honest figure
        reps = []
        for _ in range(2):
            time.sleep(45)
            f = run_child(corpus, cores, args.n)
            f["verify"] = "float"
            reps.append(f)
            time.sleep(45)
            q = run_child(corpus, cores, args.n, q8_path)
            q["verify"] = "q8_at_rest"
            reps.append(q)
        fl = min(
            (r for r in reps if r["verify"] == "float"),
            key=lambda r: r["wall_sec"],
        )
        q8 = min(
            (r for r in reps if r["verify"] == "q8_at_rest"),
            key=lambda r: r["wall_sec"],
        )
        result = {
            "n_vectors": args.n,
            "dim": DIM,
            "lsh": {
                "n_planes": planes_for(args.n),
                "n_tables": N_TABLES,
                "threshold_x100": THRESHOLD_X100,
                "max_bucket": 2000,
            },
            "loadavg_1m_start": round(load0, 2),
            "all_reps": reps,
            "runs": [fl, q8],
            "q8_wall_delta_pct": round(
                100.0 * (q8["wall_sec"] - fl["wall_sec"]) / fl["wall_sec"],
                1,
            ),
        }
        out = REPO / "BENCH" / "soak_semantic_q8.json"
        out.write_text(json.dumps(result, indent=1))
        print(json.dumps(result))
        return
    runs = [run_child(corpus, int(c), args.n) for c in args.cores.split(",")]
    result = {
        "n_vectors": args.n,
        "dim": DIM,
        "lsh": {
            "n_planes": planes_for(args.n),
            "n_tables": N_TABLES,
            "threshold_x100": THRESHOLD_X100,
            "max_bucket": 2000,
        },
        "loadavg_1m_start": round(load0, 2),
        "runs": runs,
    }
    if len(runs) >= 2 and runs[0]["cores"] * 4 == runs[1]["cores"]:
        eff = runs[1]["vectors_per_sec"] / (4 * runs[0]["vectors_per_sec"])
        result["scaling_efficiency_n_to_4n"] = round(eff, 3)
    out = REPO / "BENCH" / "soak_semantic.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
