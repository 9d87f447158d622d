#!/usr/bin/env python
"""spark-submit entry point — embedding-index maintenance over corpus
snapshots (VERDICT r06 next #5: passage_delta work list → embed added
shas only → extend the persisted IVFADC index).

    spark-submit --py-files libchunk_spark.zip jobs/embedding_maintenance.py \
        --old-corpus /path/old_documents_parquet \
        --new-corpus /path/new_documents_parquet \
        --index /path/ivfpq_index \
        --stage build|maintain|all [--dim 64]

`build` trains + persists the index over the OLD snapshot's passages;
`maintain` folds the new-minus-old passage shas into it (content-
addressed skip — unchanged passages are never re-embedded); `all` does
both. The embedder is the deterministic stub (operators/embmaint.py —
this container has no model; drop a real model call into the embed_fn
seam in deployment).
"""

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
    ap.add_argument("--old-corpus", required=True, help="documents-shaped parquet (doc_id, text)")
    ap.add_argument("--new-corpus", help="required for --stage maintain|all")
    ap.add_argument("--index", required=True)
    ap.add_argument("--stage", default="all", choices=["build", "maintain", "all"])
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.stage in ("maintain", "all") and not args.new_corpus:
        ap.error("--new-corpus is required for --stage maintain|all")

    from libchunk_spark.operators.ann_index import build_ivfpq_index
    from libchunk_spark.operators.embmaint import (
        maintain_index,
        passage_shas,
        stub_embed,
    )
    from libchunk_spark.session import get_spark

    spark = get_spark(app=f"embmaint-{args.stage}", master=args.master)
    old = spark.read.parquet(args.old_corpus).select("doc_id", "text")
    out: dict = {"stage": args.stage}
    if args.stage in ("build", "all"):
        emb_old = stub_embed(passage_shas(old), args.dim)
        meta = build_ivfpq_index(emb_old, args.index)
        out["built"] = meta
    if args.stage in ("maintain", "all"):
        new = spark.read.parquet(args.new_corpus).select("doc_id", "text")
        res = maintain_index(old, new, args.index)
        out["n_added"] = res["n_added"]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
