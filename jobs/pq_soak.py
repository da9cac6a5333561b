"""PQ soak: product quantization (pq.py) on the 1M-vector synthetic
embedding corpus with planted near-duplicate clusters — 2000x the
sf0.01 table — with the repo's three scale evidence classes:

- CROSS-PARALLELISM BIT-EQUALITY: training, codes, ADC distances and
  the (adist, vec_id) top-k tie-break are all deterministic integer
  arithmetic, so local[8] and local[32] must produce IDENTICAL top-k
  tables — checked by exact fingerprints (sum of adist, rank-weighted
  id hash), the soak-scale analog of the sf0.01 DuckDB oracle.
- PLANTED-TRUTH RECALL: the corpus plants 3 near-dups (cosine ~0.997)
  around every id%20==0 base; queries are the smallest-id vectors, so
  query 0's exact top-k contains its planted cluster, and pq_recall
  reports how much of the exact top-k the 64x-compressed ADC ranking
  recovers — recall with a known ground truth, not a tautology.
- SCALING: same job at two parallelism levels on the same parquet
  (the sandbox stand-in for the N->4N cluster-size criterion):
  throughput at both + efficiency; per-rep in-band /proc/stat steal,
  reps with steal > 1% discarded, 45 s quiesce between runs; peak
  subprocess-tree RSS at 0.5 s cadence (driver state is the
  m*k*subdim codebook + n_queries LUTs — bounded).

Run: python jobs/pq_soak.py [n_vectors] [--cores 8,32]
Writes BENCH/soak_pq.json and prints the same JSON line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _load_meta, _load_snapshot  # noqa: E402
from jobs.soak_semantic import materialize  # noqa: E402

STEAL_CONTENDED_PCT = 1.0
QUIESCE_S = 45

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
corpus, cores = sys.argv[1], int(sys.argv[2])
m, k, iters, nq, topk = (int(x) for x in sys.argv[3:8])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from two_tier_document_parser_spark.pq import pq_topk, pq_recall
emb = spark.read.parquet(corpus)
t0 = time.time()
tk = pq_topk(emb, m=m, k=k, iters=iters, n_queries=nq, topk=topk).localCheckpoint()
n_rows = tk.count()
wall_topk = time.time() - t0
agg = tk.agg(
    F.sum("adist").alias("sd"),
    F.sum(F.col("rank").cast("long") * (F.col("vec_id") % 9973)).alias("fp"),
).collect()[0]
n_db = emb.count()
t1 = time.time()
rc = pq_recall(emb, m=m, k=k, iters=iters, n_queries=nq, topk=topk)
hits = sorted((r["query_id"], r["hits"]) for r in rc.collect())
wall_recall = time.time() - t1
print(json.dumps({{
    "cores": cores, "topk_rows": n_rows, "db_vectors": n_db,
    "wall_topk_sec": round(wall_topk, 2),
    "vectors_per_sec": round(n_db / wall_topk, 1),
    "sum_adist": int(agg["sd"]), "fingerprint": int(agg["fp"]),
    "wall_recall_sec": round(wall_recall, 2),
    "recall_hits": hits,
    "recall_at_k": round(sum(h for _, h in hits) / (len(hits) * topk), 3),
}}))
"""


def run_child(corpus: str, cores: int, params) -> dict:
    script = CHILD.format(repo=str(REPO))
    snap0 = _load_snapshot()
    proc = subprocess.Popen(
        [sys.executable, "-c", script, corpus, str(cores)]
        + [str(p) for p in params],
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
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    corpus = materialize(args.n)
    params = (args.m, args.k, args.iters, args.queries, args.topk)
    cores = [int(c) for c in args.cores.split(",")]
    rungs: dict[int, list[dict]] = {}
    for c in cores:
        for _ in range(args.reps):
            time.sleep(QUIESCE_S)
            rungs.setdefault(c, []).append(run_child(corpus, c, params))
    best = {}
    for c, reps in rungs.items():
        calm = [r for r in reps if not r["contended"]] or reps
        best[c] = min(calm, key=lambda r: r["wall_topk_sec"])
    fps = {
        c: (b["fingerprint"], b["sum_adist"], tuple(map(tuple, b["recall_hits"])))
        for c, b in best.items()
    }
    result = {
        "op": "pq_topk + pq_recall (ADC over packed PQ codes)",
        "n_vectors": args.n,
        "m": args.m,
        "k": args.k,
        "iters": args.iters,
        "n_queries": args.queries,
        "topk": args.topk,
        "rungs": {str(c): best[c] for c in cores},
        "raw_reps": rungs,
        "bit_identical_across_cores": len(set(fps.values())) == 1,
        "note": (
            "fingerprint = (sum rank*(id%9973), sum adist, recall hit "
            "list); equality across parallelism levels is the "
            "soak-scale analog of the sf0.01 DuckDB-oracle equality. "
            "recall_at_k is ADC-vs-exact over the planted-cluster "
            "corpus (queries are cluster bases, so the exact top-k "
            "contains known ~0.997-cosine neighbors)."
        ),
    }
    if len(cores) == 2:
        lo, hi = sorted(cores)
        thr = {c: best[c]["vectors_per_sec"] for c in cores}
        result["scaling"] = {
            "n": lo,
            "4n": hi,
            "throughput": thr,
            "efficiency": round((thr[hi] / thr[lo]) / (hi / lo), 3),
        }
    out = Path(REPO / "BENCH" / "soak_pq.json")
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
