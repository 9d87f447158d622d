#!/usr/bin/env python
"""spark-submit entry point — run pipeline stages against a corpus table.

    spark-submit --py-files libchunk_spark.zip jobs/run_pipeline.py \
        --corpus /path/to/corpus_parquet \
        --checkpoints /path/to/ckpt \
        --stage all|chunk|sign|pairs|components \
        [--no-containment] [--config docs|corpus|reference]

Mirrors the reference CLI verbs (put/get/mv → main.go:20-24) generalized to
pipeline stages (north_rule: "one CLI per stage"). Stages already
checkpointed at the same config fingerprint are skipped (resume semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CONFIGS = {
    "docs": "DOCS_CONFIG",
    "corpus": "CORPUS_PIPELINE_CONFIG",
    "reference": None,  # PipelineConfig.reference_scale()
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet dir with corpus rows")
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument(
        "--stage",
        default="all",
        choices=["all", "chunk", "sign", "pairs", "components", "audit"],
    )
    ap.add_argument("--config", default="corpus", choices=list(CONFIGS))
    ap.add_argument("--no-containment", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    import libchunk_spark.config as C
    from pyspark.sql import functions as F

    from libchunk_spark.pipeline import run_pipeline
    from libchunk_spark.session import get_spark
    from libchunk_spark.sources.catalog import StageCatalog

    cfg = (
        C.PipelineConfig.reference_scale()
        if args.config == "reference"
        else getattr(C, CONFIGS[args.config])
    )
    spark = get_spark(app=f"libchunk-{args.stage}", master=args.master)
    corpus = spark.read.parquet(args.corpus)
    if "file_id" not in corpus.columns:
        corpus = corpus.withColumn(
            "file_id", F.xxhash64("repo", "path", "commit")
        )
    cat = StageCatalog(root=args.checkpoints)
    res = run_pipeline(
        corpus,
        cfg,
        cat,
        with_containment=not args.no_containment,
        with_audits=args.stage == "audit",
    )
    # --stage selects how far to force materialization; earlier stages are
    # computed lazily only as needed (and skipped when checkpointed).
    # "audit" materializes the cluster_stats/shard_plan aggregations over
    # the components CHECKPOINT (the CC loop is read back, not re-run).
    target = {
        "chunk": res.chunk_index,
        "sign": res.signatures,
        "pairs": res.edges,
        "components": res.components,
        "audit": res.cluster_stats,
        "all": res.components,
    }[args.stage]
    if args.stage == "audit":
        res.shard_plan.count()
    n = target.count()
    print(
        json.dumps(
            {
                "stage": args.stage,
                "rows": n,
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
