"""Inverted-index soak: build the impact-blocked index over a
1M-document synthetic corpus (200x the sf0.1 table, ~120M tokens,
Zipf vocabulary) and merge a 5% crawl increment incrementally —
the retrieval-family scale evidence:

- MERGE == RECOMPUTE AT VOLUME: the incremental plan's structural
  exactness claim (monotone top-k merge) is re-verified at 1M docs
  by EXCEPT-comparing the merged index against the from-scratch
  index over the union — must be 0 differing rows in both
  directions.
- SCALING: the identical full build at local[8] and local[32] on the
  same parquet, throughput at both plus N->4N efficiency (the
  BASELINE.json two-cluster-size criterion, evidenced by parallelism
  levels per the sandbox rule).
- MEMORY: peak RSS of the subprocess tree at 0.5 s cadence — the
  posting-block cap must keep per-term state bounded regardless of
  stopword df (the most frequent Zipf token appears in ~every doc).

Round 5 adds --retrieval (r04 verdict task #6): bm25_topk with a
stopword-class query term and sparse_topk_pairs at the same 1M-doc
Zipf corpus, with prune diagnostics (max surviving df and the exact
sum(df^2) candidate volume) proving the absolute df cap bounds the
hot term's quadratic bucket. Writes BENCH/soak_retrieval.json.

Run: python jobs/index_soak.py [n_docs] [--cores 8,32]
Writes BENCH/soak_index.json and prints the same JSON line.
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

TOKENS_PER_DOC = 120
VOCAB = 50_000
CAP = 16
# retrieval mode: absolute df cap for the sparse similarity join —
# the hot-bucket bound under test (df^2 pair fan-out per term)
DF_CAP_ABS = 100


def materialize(n: int) -> str:
    """Deterministic Zipf-token corpus: doc i's tokens come from a
    per-doc RNG seeded by i, ids drawn Zipf(1.3) mod VOCAB — one
    mapInArrow pass, no joins, no driver-side state."""
    corpus = f"/tmp/ttdp_soak_idx_{n}"
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
            texts = []
            for vid in ids:
                rng = np.random.default_rng(int(vid) + 7)
                toks = rng.zipf(1.3, TOKENS_PER_DOC) % VOCAB
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(texts)],
                names=["doc_id", "text"],
            )

    df = spark.range(n, numPartitions=64).mapInArrow(
        gen, "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(corpus)
    spark.stop()
    return corpus


CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
corpus, cores, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "64")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from two_tier_document_parser_spark.ranking import (
    inverted_index, inverted_index_merge)
docs = spark.read.parquet(corpus)
n_docs = docs.count()
t0 = time.time()
if mode == "build":
    idx = inverted_index(docs, cap={cap}).localCheckpoint()
    n_terms = idx.count()
    wall = time.time() - t0
    print(json.dumps({{
        "cores": cores, "mode": mode, "docs": n_docs,
        "terms": n_terms, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
    }}))
elif mode == "merge":  # merge-verify: committed 95%, increment 5%
    committed = docs.filter(F.col("doc_id") % 20 != 0)
    increment = docs.filter(F.col("doc_id") % 20 == 0)
    base = inverted_index(committed, cap={cap}).localCheckpoint()
    t0 = time.time()
    merged = inverted_index_merge(base, increment, cap={cap}).localCheckpoint()
    n_terms = merged.count()
    merge_wall = time.time() - t0
    full = inverted_index(docs, cap={cap})
    diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    print(json.dumps({{
        "cores": cores, "mode": mode, "docs": n_docs,
        "increment_docs": increment.count(), "terms": n_terms,
        "merge_wall_sec": round(merge_wall, 2),
        "diff_rows_vs_recompute": diff,
    }}))
else:  # retrieval: bm25 + sparse similarity pairs at volume
    from two_tier_document_parser_spark.ranking import (
        bm25_topk, sparse_topk_pairs, tokens)
    # bm25 with one stopword-class term (w1 ~ 64% of docs) + two
    # mid/rare terms: the scoring join must survive the hot posting
    t0 = time.time()
    top = bm25_topk(docs, ("w1", "w777", "w4242"), k=20).collect()
    bm25_wall = time.time() - t0
    # prune diagnostics BEFORE the self-join: with the absolute cap
    # the max surviving df (hot-bucket bound) and the exact candidate
    # volume sum(df^2) are the two numbers that prove the bound
    tf = (docs.select("doc_id",
                      F.explode(tokens(F.lower(F.col("text")))).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = dfreq.filter(F.col("df") <= {df_abs})
    diag = kept.agg(
        F.count(F.lit(1)).alias("kept_terms"),
        F.max("df").alias("max_kept_df"),
        F.sum(F.expr("df * df")).alias("candidate_volume"),
    ).collect()[0]
    pruned = dfreq.agg(
        F.count(F.lit(1)).alias("vocab"), F.max("df").alias("max_df")
    ).collect()[0]
    t0 = time.time()
    n_pairs = sparse_topk_pairs(
        docs, k=3, df_cap_abs={df_abs}).count()
    sparse_wall = time.time() - t0
    print(json.dumps({{
        "cores": cores, "mode": mode, "docs": n_docs,
        "bm25_wall_sec": round(bm25_wall, 2),
        "bm25_rows": len(top),
        "bm25_top_doc": top[0].doc_id if top else None,
        "vocab": pruned.vocab, "corpus_max_df": pruned.max_df,
        "df_cap_abs": {df_abs},
        "kept_terms": diag.kept_terms,
        "max_kept_df": diag.max_kept_df,
        "candidate_volume_sum_df2": diag.candidate_volume,
        "sparse_wall_sec": round(sparse_wall, 2),
        "sparse_pairs_rows": n_pairs,
    }}))
"""


def run_child(corpus: str, cores: int, mode: str) -> dict:
    script = CHILD.format(repo=str(REPO), cap=CAP, df_abs=DF_CAP_ABS)
    launch_load = round(os.getloadavg()[0], 2)
    proc = subprocess.Popen(
        [sys.executable, "-c", script, corpus, str(cores), mode],
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
        "--retrieval",
        action="store_true",
        help="bm25 + sparse-similarity soak only (r04 verdict task "
        "#6); writes BENCH/soak_retrieval.json",
    )
    args = ap.parse_args()
    load0 = os.getloadavg()[0]
    corpus = materialize(args.n)
    cores = [int(c) for c in args.cores.split(",")]
    if args.retrieval:
        # quiesce between children: the first capture launched the
        # 32-core child at loadavg 7.17 (the 8-core run still
        # draining), inflating its wall and distorting the scaling
        # figure — same contended-capture rule as the semantic soak
        runs = []
        for c in cores:
            if runs:
                time.sleep(45)
            runs.append(run_child(corpus, c, "retrieval"))
        result = {
            "n_docs": args.n,
            "tokens_per_doc": TOKENS_PER_DOC,
            "vocab": VOCAB,
            "df_cap_abs": DF_CAP_ABS,
            "loadavg_1m_start": round(load0, 2),
            "runs": runs,
        }
        if len(runs) >= 2 and runs[0]["cores"] * 4 == runs[1]["cores"]:
            eff = (
                runs[0]["sparse_wall_sec"]
                / (4 * runs[1]["sparse_wall_sec"])
            )
            result["sparse_scaling_efficiency_n_to_4n"] = round(eff, 3)
        out = REPO / "BENCH" / "soak_retrieval.json"
        out.write_text(json.dumps(result, indent=1))
        print(json.dumps(result))
        return
    runs = [run_child(corpus, c, "build") for c in cores]
    merge = run_child(corpus, cores[-1], "merge")
    result = {
        "n_docs": args.n,
        "tokens_per_doc": TOKENS_PER_DOC,
        "vocab": VOCAB,
        "cap": CAP,
        "loadavg_1m_start": round(load0, 2),
        "build_runs": runs,
        "merge_verify": merge,
    }
    if len(runs) >= 2 and runs[0]["cores"] * 4 == runs[1]["cores"]:
        eff = runs[1]["docs_per_sec"] / (4 * runs[0]["docs_per_sec"])
        result["scaling_efficiency_n_to_4n"] = round(eff, 3)
    out = REPO / "BENCH" / "soak_index.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
