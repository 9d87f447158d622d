#!/usr/bin/env python
"""Same-moment A/B for the cosine_pairs bench drift -> BENCH/cosine_ab_r6.json.

VERDICT r04 next #4 / r05 next #2: driver best-of-3 for `cosine_pairs`
drifted 0.85 s (r3) -> 1.37 s (r4) -> 3.36 s (r5) across three sessions
while operators/similarity.py:56 was untouched. Code is exonerated on
paper; this measures the remaining suspects IN ONE WINDOW, interleaved:

  isolated    fresh local[32] session, bench warmup, cosine_pairs x3
  cache_only  same + the bench's 60k-file cached corpus resident (the one
              piece of bench state that GREW across rounds: r3 ran 20k
              files, r4+ run 60k)
  context     same + the 7 bench queries that precede cosine_pairs, i.e.
              the exact JVM/session state the driver measures in

Each mode runs as its own subprocess (cold JVM), modes interleave across
`--repeats` rounds with a loadavg decay gap before every launch (same
discipline as jobs/scaling_bench.py), so a host-capacity drift lands on
all modes equally. If context >> isolated, the drift is bench-sequence
state (GC/broadcast/page-cache pressure) and the bisect is cache_only vs
context; if all modes agree, the cross-round drift was host noise that
best-of-3 failed to damp and the r5 3.36 s reading is a loaded-window
artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PRECEDING = [
    "exact_dup_groups",
    "round_trip_sha",
    "minhash",
    "lsh_band_pairs",
    "simhash32",
    "ngram_jaccard_pairs",
    "components",
]


def worker(mode: str, sf_dir: str, cpus: int, inner_reps: int) -> None:
    from pyspark.sql import functions as F

    from libchunk_spark import queries as Q
    from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CCFG
    from libchunk_spark.fixtures import generate_corpus_fast
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.session import get_spark

    spark = get_spark(app=f"cosab-{mode}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.createDataFrame(
        [(i, "warm up text " * 20) for i in range(cpus * 8)],
        "file_id long, content string",
    ).repartition(cpus)
    sign(warm, CCFG).agg(F.sum("n_shingles")).collect()

    if mode in ("cache_only", "context"):
        rows = generate_corpus_fast(60000, seed=42)
        corpus = (
            spark.createDataFrame(rows, "file_id long, content string")
            .repartition(cpus * 2)
            .cache()
        )
        corpus.count()
    if mode == "context":
        for qname in PRECEDING:
            Q.QUERIES[qname][0](spark, sf_dir).count()

    qfn = Q.QUERIES["cosine_pairs"][0]
    times = []
    for _ in range(inner_reps):
        t0 = time.time()
        qfn(spark, sf_dir).count()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"mode": mode, "times": times, "best": min(times)}))
    spark.stop()


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _wait_quiet(max_load: float = 0.7, timeout: float = 600.0) -> float:
    t0 = time.time()
    while _loadavg() > max_load and time.time() - t0 < timeout:
        time.sleep(5)
    return round(time.time() - t0, 1)


def orchestrate(sf_dir: str, cpus: int, repeats: int, inner_reps: int) -> None:
    modes = ["isolated", "cache_only", "context"]
    raw: dict[str, list] = {m: [] for m in modes}
    for rep in range(repeats):
        for m in modes:
            gap = _wait_quiet()
            before = _loadavg()
            out = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--mode", m, "--sf-dir", sf_dir,
                    "--cpus", str(cpus), "--inner-reps", str(inner_reps),
                ],
                capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise SystemExit(f"cosine A/B worker mode={m} died")
            r = json.loads(lines[-1])
            r["rep"] = rep
            r["decay_gap_sec"] = gap
            r["loadavg_at_launch"] = before
            raw[m].append(r)
            print(json.dumps(r))

    summary = {
        m: {
            "best": min(x["best"] for x in raw[m]),
            "median_of_bests": statistics.median(x["best"] for x in raw[m]),
            "all_times": [t for x in raw[m] for t in x["times"]],
        }
        for m in modes
    }
    ratio = summary["context"]["best"] / summary["isolated"]["best"]
    out = {
        "query": "cosine_pairs",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "design": "interleaved per-mode cold-JVM subprocesses, decay-gapped",
        "history_sec": {"r3": 0.85, "r4": 1.37, "r5": 3.36},
        "summary": summary,
        "context_over_isolated": round(ratio, 2),
        "raw": raw,
    }
    with open(os.path.join(REPO, "BENCH", "cosine_ab_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"context_over_isolated": out["context_over_isolated"],
                      "summary": {m: summary[m]["best"] for m in modes}}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--inner-reps", type=int, default=3)
    args = ap.parse_args()
    if args.mode:
        worker(args.mode, args.sf_dir, args.cpus, args.inner_reps)
    else:
        orchestrate(args.sf_dir, args.cpus, args.repeats, args.inner_reps)
