#!/usr/bin/env python
"""spark-submit entry point — rename/move detection between two corpus
snapshots (operators/renames.py: git diffcore-rename re-expressed as
anti-joins + sha equality + winnow containment).

    spark-submit --py-files libchunk_spark.zip jobs/rename_scan.py \
        --old-snapshot /path/old_corpus_parquet \
        --new-snapshot /path/new_corpus_parquet \
        --out /path/rename_pairs_parquet \
        [--sim-threshold 0.5] [--df-cap 64]

Inputs are input_hint-shaped parquet (repo, path, content[, ...]); the
output parquet carries (repo, old_path, new_path, kind, sim) plus a JSON
summary line on stdout (counts per kind, removed/added sizes) — the
lineage record a history-aware dedup run keeps so a renamed file's
cluster membership survives the snapshot transition."""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-snapshot", required=True)
    ap.add_argument("--new-snapshot", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--sim-threshold", type=float, default=0.5)
    ap.add_argument("--df-cap", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from libchunk_spark.operators.renames import rename_pairs, snapshot_changes
    from libchunk_spark.session import get_spark

    spark = get_spark(app="rename-scan", master=args.master)
    cols = ["repo", "path", "content"]
    old = spark.read.parquet(args.old_snapshot).select(*cols)
    new = spark.read.parquet(args.new_snapshot).select(*cols)
    removed, added = snapshot_changes(old, new)
    pairs = rename_pairs(
        old,
        new,
        sim_threshold=args.sim_threshold,
        df_cap=args.df_cap,
    )
    pairs.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    kinds = {
        r["kind"]: r["n"]
        for r in back.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "out": args.out,
                "n_removed": removed.count(),
                "n_added": added.count(),
                "pairs": kinds,
                "sim_threshold": args.sim_threshold,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
