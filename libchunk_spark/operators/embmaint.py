"""Embedding-maintenance loop: corpus snapshot delta → re-embed work list
→ extend the persisted IVFADC index (VERDICT r06 next #5 closed the gap
between `passage_delta`, which produces the work list, and
`extend_ivfpq_index`, which grows the index — nothing tied them together).

Content-addressed skip: a passage's sha256 is its embedding identity
(q_passage_windows docstring), so only shas present in the NEW snapshot
but absent from the OLD are embedded — the same indexed-move skip
libchunk performs on chunk K-keys (/root/reference/bits/move.go), at
passage granularity against the vector index.

The embedder itself is a SEAM: this container has no embedding model, so
the default `stub_embed` derives a deterministic fake vector from the
passage sha (clearly marked; the Spark-side plumbing — work-list anti-
join, vec_id derivation, encode/assign/append — is real and tested).
Scale: the delta is two distinct-sha anti-joins (crypto keys, skew-free);
embedding + extension are O(added), never O(corpus).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from libchunk_spark.operators.ann_index import extend_ivfpq_index


def passage_shas(docs: DataFrame) -> DataFrame:
    """Distinct passage shas of a documents-shaped frame (doc_id, text)."""
    from libchunk_spark.queries import passages_of

    return passages_of(docs).select("passage_sha").distinct()


def added_passages(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """The re-embedding work list: shas in NEW but not OLD (unchanged
    passages keep their index entries by key — content-addressable skip)."""
    return passage_shas(new_docs).join(
        passage_shas(old_docs), "passage_sha", "left_anti"
    )


def sha_vec_id(col):
    """Deterministic int64 vector id from the passage sha (15 hex chars =
    60 bits, positive, collision-negligible; same expression both engines
    can compute)."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def stub_embed(passages: DataFrame, dim: int) -> DataFrame:
    """STUB embedder — deterministic fake unit-less vectors seeded from the
    passage sha (this container has no embedding model/codecs; a real
    deployment drops its model call into the same (passages) -> (vec_id,
    embedding) contract). Determinism makes the maintenance loop's
    equality tests meaningful."""

    @pandas_udf("array<double>")
    def embed(shas: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in shas:
            out = [
                np.random.default_rng(int(v[:12], 16)).standard_normal(dim).tolist()
                for v in s
            ]
            yield pd.Series(out)

    return passages.select(
        sha_vec_id(F.col("passage_sha")).alias("vec_id"),
        embed(F.col("passage_sha")).alias("embedding"),
    )


def fold_new_shas_into_index(
    spark,
    state_dir: str,
    index_path: str,
    embed_fn: Callable[[DataFrame, int], DataFrame] = stub_embed,
    dim: int = 64,
    build_kwargs: dict | None = None,
) -> dict:
    """Consume the streaming passage maintainer's first-seen sha work
    lists (streaming/aggmaint.py::start_passage_maintenance writes
    new_shas/batch=<id>) and fold each unprocessed batch into the
    persisted IVFADC index — the scheduled half of the embedding loop
    (run it after each trigger or on a cadence).

    Idempotence (the replay discipline extend_ivfpq_index's docstring
    demands of callers): a ledger sidecar (folded_batches.json, atomic
    tmp+rename) records which batch ids already extended the index, so
    re-running after a crash or an at-least-once replay skips them; only
    new_shas partitions carrying _SUCCESS are considered, so a fold can
    never race a half-written work list. The one crash window — extend
    committed, ledger write lost — re-appends that batch's rows on the
    next run, which is CORRECTNESS-benign: index_topk dedups candidates
    (dropDuplicates on (q, cand) and on rerank vec_ids), so duplicates
    cost only storage until the next rebuild.

    First call (no meta.json yet) BUILDS the index from the first work
    list; later calls extend under the frozen quantizer. Returns
    {"folded_batches": [...], "n_added": int}.
    """
    import json
    import os

    from libchunk_spark.operators.ann_index import build_ivfpq_index
    from libchunk_spark.streaming.aggmaint import _committed

    # ADVICE r7: an all-dedupe first batch writes zero rows, no build
    # runs, and the ledger os.replace below would raise FileNotFoundError
    # on a never-created directory — wedging every rerun on that batch.
    os.makedirs(index_path, exist_ok=True)
    ledger_path = os.path.join(index_path, "folded_batches.json")
    done: set[int] = set()
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            done = set(json.load(f))
    new_root = os.path.join(state_dir, "new_shas")
    todo = [b for b in _committed(new_root, r"batch=(\d+)") if b not in done]
    meta_path = os.path.join(index_path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            dim = json.load(f)["dim"]

    folded: list[int] = []
    n_added = 0
    for b in todo:
        shas = spark.read.parquet(os.path.join(new_root, f"batch={b}")).select(
            "passage_sha"
        )
        emb = embed_fn(shas, dim)
        n = emb.count()
        if n:
            if not os.path.exists(meta_path):
                build_ivfpq_index(emb, index_path, **(build_kwargs or {}))
            else:
                extend_ivfpq_index(emb, index_path)
        done.add(b)
        folded.append(b)
        n_added += n
        tmp = ledger_path + ".tmp"  # ledger advances after EVERY batch
        with open(tmp, "w") as f:
            json.dump(sorted(done), f)
        os.replace(tmp, ledger_path)
    return {"folded_batches": folded, "n_added": int(n_added)}


def maintain_index(
    old_docs: DataFrame,
    new_docs: DataFrame,
    index_path: str,
    embed_fn: Callable[[DataFrame, int], DataFrame] = stub_embed,
) -> dict:
    """passage delta → embed ONLY the added shas → fold into the persisted
    index with frozen centroids/codebooks (extend_ivfpq_index). Returns
    the index meta dict plus n_added."""
    import json
    import os

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    added = added_passages(old_docs, new_docs)
    emb_new = embed_fn(added, meta["dim"])
    n_added = emb_new.count()
    if n_added:
        extend_ivfpq_index(emb_new, index_path)
    return {**meta, "n_added": int(n_added)}
