#!/usr/bin/env python
"""Measure the shared-memory-subsystem contention factor of the chunker
kernel — the normalization term for the sandbox N-vs-4N scaling bench.

On separate cluster nodes, per-core kernel speed is identical at N and 4N
executors. On this single-socket sandbox (one 260 MB L3, one memory
controller), the 4N level runs under 4x the cache/bandwidth pressure, so the
raw Spark efficiency ratio conflates real coordination loss with contention
separate machines would never see. This script MEASURES that contention:

    C(K) = per-core kernel MB/s with K cores busy
    contention_factor = C(K_big) / C(K_small)

and BENCH/BASELINE.md divides it out of the raw Spark ratio:

    efficiency_isolated = efficiency_raw / contention_factor

Workers are plain Python processes (no Spark, no JVM) pinned one-per-core
with taskset, each running the production chunk_bytes + shingle kernels over
the same synthetic source-code payload in a loop; a file barrier aligns the
measurement windows.

Worker mode:  kernel_contention.py --core I --barrier DIR --seconds S
Orchestrator: kernel_contention.py [--levels 4,16] [--seconds 20] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _ensure_payload(mb: int = 64) -> str:
    """Synthetic source-code blob, generated once and shared via a file."""
    path = os.path.join(tempfile.gettempdir(), f"kc_payload_{mb}mb.bin")
    if not (os.path.exists(path) and os.path.getsize(path) == mb * 1024 * 1024):
        from libchunk_spark.fixtures import generate_corpus_fast

        rows = generate_corpus_fast(12000, seed=42)
        blob = ("\n".join(c for _, c in rows)).encode()
        while len(blob) < mb * 1024 * 1024:
            blob += blob
        with open(path, "wb") as f:
            f.write(blob[: mb * 1024 * 1024])
    return path


def worker(core: int, barrier_dir: str, seconds: float, payload: str) -> None:
    from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
    from libchunk_spark.chunker.rabin import chunk_bytes
    from libchunk_spark.functions.signatures import shingle_hashes

    with open(payload, "rb") as f:
        data = f.read()
    step = 1 << 20  # 1 MiB slices so the clock is checked often
    # warm: tables built, payload faulted in
    chunk_bytes(data[:step], CFG.chunk)
    shingle_hashes(data[:step], CFG.shingle)

    open(os.path.join(barrier_dir, f"ready_{core}"), "w").close()
    go = os.path.join(barrier_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.05)

    t0 = time.time()
    done = 0
    i = 0
    n_slices = len(data) // step
    while time.time() - t0 < seconds:
        s = (i % n_slices) * step
        sl = data[s : s + step]
        # same two content passes as the Spark chunk+sign stage
        chunk_bytes(sl, CFG.chunk)
        shingle_hashes(sl, CFG.shingle)
        done += 2 * len(sl)
        i += 1
    dt = time.time() - t0
    print(json.dumps({"core": core, "mb_per_sec": round(done / 1e6 / dt, 2)}))


def orchestrate(levels: list[int], seconds: float, repeats: int) -> None:
    payload = _ensure_payload()
    results: dict[int, float] = {}
    raw: dict[str, list] = {}
    for k in levels:
        best = 0.0
        raw[str(k)] = []
        for _ in range(repeats):
            bdir = tempfile.mkdtemp(prefix="kc_barrier_")
            procs = [
                subprocess.Popen(
                    [
                        "taskset", "-c", str(core),
                        sys.executable, os.path.abspath(__file__),
                        "--core", str(core), "--barrier", bdir,
                        "--seconds", str(seconds), "--payload", payload,
                    ],
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                    text=True, cwd=REPO,
                )
                for core in range(k)
            ]
            t0 = time.time()
            while len([f for f in os.listdir(bdir) if f.startswith("ready_")]) < k:
                if time.time() - t0 > 300:
                    for p in procs:
                        p.kill()
                    raise SystemExit("kernel bench warmup timed out")
                time.sleep(0.1)
            open(os.path.join(bdir, "go"), "w").close()
            per_core = []
            for p in procs:
                out, err = p.communicate(timeout=600)
                lines = [l for l in out.splitlines() if l.startswith("{")]
                if not lines:
                    sys.stderr.write(err[-2000:])
                    raise SystemExit("kernel worker died")
                per_core.append(json.loads(lines[-1])["mb_per_sec"])
            shutil.rmtree(bdir, ignore_errors=True)
            agg = round(sum(per_core) / len(per_core), 2)
            raw[str(k)].append({"per_core": per_core, "mean_mb_per_sec_core": agg})
            print(json.dumps({"busy_cores": k, "mean_mb_per_sec_core": agg}))
            best = max(best, agg)
        results[k] = best

    small, big = min(levels), max(levels)
    factor = results[big] / results[small]
    out = {
        "levels": {str(k): v for k, v in results.items()},
        "contention_factor": round(factor, 3),
        "seconds": seconds,
        "repeats": repeats,
        "raw": raw,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "kernel_contention.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"contention_factor({big} vs {small} busy cores) = {factor:.3f} "
        "-> BENCH/kernel_contention.json"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", type=int, default=None)
    ap.add_argument("--barrier", type=str, default=None)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--payload", type=str, default=None)
    ap.add_argument("--levels", type=str, default="4,16")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.core is not None:
        worker(args.core, args.barrier, args.seconds, args.payload or _ensure_payload())
    else:
        orchestrate([int(x) for x in args.levels.split(",")], args.seconds, args.repeats)
