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
