"""Per-batch cost curve for streaming incremental clustering.

Evidence for VERDICT r04 next #2's "Done" criterion: per-trigger work must
be independent of the accumulated history size. The plan-shape pytest
(tests/test_streaming_multimodal.py::test_incremental_clustering_cross_edges_plan)
proves the mechanism (maintained band index scanned, batch keys broadcast
into it, signature history never read, own partition pruned); this job
measures the consequence — wall time per micro-batch stays FLAT while the
band-index history grows by a constant amount per batch. The pre-fix design
(re-window the full signature history per trigger, VERDICT r04 wrong #2)
grows linearly here and quadratically over a stream's lifetime.

Drives libchunk_spark.streaming.ingest._incremental_cluster_batch directly
(the exact foreachBatch body) with equal-size batches of synthetic source
files; reports per-batch seconds + history rows before each batch, and the
flatness verdict = median(last 3 batch times) / median(batch times 2-4)
(batches 0-1 pay JIT/codegen warmup and state bootstrap, excluded).

Output: BENCH/incremental_stream_cost.json (+ table printed to stdout).
Run on a quiet host; nothing else concurrently (CLAUDE.md bench rules).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--files-per-batch", type=int, default=400)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from libchunk_spark.config import PipelineConfig
    from libchunk_spark.fixtures import generate_corpus_fast
    from libchunk_spark.streaming.ingest import _incremental_cluster_batch

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .appName("incremental_stream_cost")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig()
    n_total = args.batches * args.files_per_batch
    rows = generate_corpus_fast(n_total, seed=11)
    corpus = (
        spark.createDataFrame(rows, "file_id long, content string")
        .repartition(args.cpus)
        .cache()
    )
    corpus.count()  # materialize outside every timed region

    state_dir = tempfile.mkdtemp(prefix="inc_stream_cost_")
    bands_root = os.path.join(state_dir, "bands")
    per_batch: list[dict] = []
    try:
        for b in range(args.batches):
            batch = corpus.where(
                (corpus.file_id >= b * args.files_per_batch)
                & (corpus.file_id < (b + 1) * args.files_per_batch)
            )
            history_rows = (
                spark.read.parquet(bands_root).count()
                if os.path.exists(bands_root)
                else 0
            )
            t0 = time.time()
            _incremental_cluster_batch(batch, b, state_dir, cfg, 4096)
            sec = round(time.time() - t0, 3)
            per_batch.append(
                {"batch": b, "sec": sec, "history_band_rows": history_rows}
            )
            print(json.dumps(per_batch[-1]))
        early = statistics.median(r["sec"] for r in per_batch[2:5])
        late = statistics.median(r["sec"] for r in per_batch[-3:])
        n_components = spark.read.parquet(
            os.path.join(state_dir, "components")
        ).count()
        out = {
            "batches": args.batches,
            "files_per_batch": args.files_per_batch,
            "cpus": args.cpus,
            "per_batch": per_batch,
            "early_median_sec": early,
            "late_median_sec": late,
            "late_over_early": round(late / early, 3),
            "history_growth_over_run": (
                round(
                    per_batch[-1]["history_band_rows"]
                    / max(per_batch[2]["history_band_rows"], 1),
                    2,
                )
            ),
            "n_components_final": n_components,
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(
            os.path.join(REPO, "BENCH", "incremental_stream_cost.json"), "w"
        ) as f:
            json.dump(out, f, indent=1)
        print(
            f"late/early per-batch time = {out['late_over_early']} while the "
            f"band-index history grew {out['history_growth_over_run']}x "
            "-> BENCH/incremental_stream_cost.json"
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
