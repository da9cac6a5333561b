"""BPE-training soak: learn merges over the 1M-document Zipf corpus
(the index_soak corpus: ~120M tokens, 50k-word vocabulary) — the
volume evidence for bpe.py's scale claim:

- ONE corpus-sized stage: the word-frequency groupBy. Measured by
  timing a 1-iteration run (corpus shuffle + one vocab-sized
  iteration) against a k-iteration run on the same materialized
  parquet: the marginal cost per extra iteration must be vocab-sized
  (seconds), not corpus-sized.
- Driver state: k collected 1-row argmax winners, printed.
- The learned merges themselves are deterministic and recorded, so a
  re-run is comparable value-for-value.

Run: python jobs/bpe_soak.py [n_docs] [--iters 8]
Writes BENCH/soak_bpe.json and prints the same JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from index_soak import materialize  # noqa: E402  (same jobs/ dir)


def _load() -> dict:
    import os

    snap = {}
    try:
        snap["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        parts = open("/proc/stat").readline().split()
        ticks = [int(x) for x in parts[1:]]
        snap["total"] = sum(ticks)
        snap["steal"] = ticks[7] if len(ticks) > 7 else 0
    except (OSError, ValueError):
        pass
    return snap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    corpus = materialize(args.n)

    from pyspark.sql import SparkSession

    from two_tier_document_parser_spark.bpe import bpe_train

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus)

    from two_tier_document_parser_spark.bpe import word_frequencies

    # untimed warm pass (parquet page cache + Python workers) so the
    # 1-iter/k-iter comparison isolates the per-iteration cost
    vocab = word_frequencies(docs).count()

    s0 = _load()
    t0 = time.time()
    one = bpe_train(docs, iters=1).collect()
    t1 = time.time() - t0

    t0 = time.time()
    merges = bpe_train(docs, iters=args.iters).collect()
    tk = time.time() - t0
    s1 = _load()

    marginal = (tk - t1) / max(args.iters - 1, 1)
    out = {
        "metric": "bpe_train soak",
        "docs": args.n,
        "vocab_words": vocab,
        "iters": args.iters,
        "wall_1_iter_sec": round(t1, 1),
        "wall_k_iter_sec": round(tk, 1),
        "marginal_sec_per_iteration": round(marginal, 2),
        "merges": [
            [r["it"], r["lft"], r["rgt"], r["merged"], int(r["pair_count"])]
            for r in merges
        ],
        "loadavg_start": s0.get("loadavg_1m"),
        "steal_pct_inband": (
            round(
                100.0
                * (s1.get("steal", 0) - s0.get("steal", 0))
                / max(s1.get("total", 1) - s0.get("total", 0), 1),
                2,
            )
        ),
    }
    _ = one
    (REPO / "BENCH" / "soak_bpe.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
