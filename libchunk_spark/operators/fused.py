"""Fused chunk+sign: one pass over content instead of two.

At 10^12-file scale the corpus scan dominates; running the coarse chunker
(put) and the shingle/signature stage as separate jobs decodes and ships
every content byte through Arrow twice. This operator emits both from a
single mapInPandas pass: flat chunk rows, with the per-file signature
columns attached to the pos==0 row (null elsewhere).

Downstream splits it back with cheap projections:
    chunks     = fused.drop(sig cols)
    signatures = fused.where(pos == 0).select(file_id, sig cols)
Checkpoint the fused frame once and both consumers read the parquet.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libchunk_spark.config import PipelineConfig
from libchunk_spark.chunker.rabin import chunk_batch
from libchunk_spark.functions.signatures import (
    band_hashes,
    minhash_signature,
    shingle_hashes_batch,
    simhash,
)
from libchunk_spark.functions.udfs import _as_bytes, _i64

FUSED_SCHEMA = (
    "file_id long, pos int, start long, length int, cut_fp long, k string, "
    "minhash array<long>, simhash long, bands array<long>, n_shingles int"
)


def chunk_and_sign(corpus: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(file_id, content) -> fused chunk rows + pos==0 signature columns."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                v.encode("utf-8") if isinstance(v, str) else _as_bytes(v)
                for v in pdf["content"]
            ]
            all_chunks = chunk_batch(payloads, cfg.chunk)
            hash_sets = shingle_hashes_batch(payloads, cfg.shingle)
            cols: dict[str, list] = {
                k: []
                for k in (
                    "file_id", "pos", "start", "length", "cut_fp", "k",
                    "minhash", "simhash", "bands", "n_shingles",
                )
            }
            for fid, data, chunks, hs in zip(
                pdf["file_id"], payloads, all_chunks, hash_sets
            ):
                sig = minhash_signature(hs, cfg.signature)
                mh = [_i64(int(x)) for x in sig]
                sh = _i64(simhash(hs, cfg.signature))
                bh = [_i64(int(x)) for x in band_hashes(sig, cfg.signature)]
                if not chunks:  # empty file: signature-only row
                    cols["file_id"].append(fid)
                    cols["pos"].append(0)
                    cols["start"].append(0)
                    cols["length"].append(0)
                    cols["cut_fp"].append(None)
                    cols["k"].append(None)
                    cols["minhash"].append(mh)
                    cols["simhash"].append(sh)
                    cols["bands"].append(bh)
                    cols["n_shingles"].append(int(hs.size))
                    continue
                for i, c in enumerate(chunks):
                    piece = data[c.start : c.start + c.length]
                    cols["file_id"].append(fid)
                    cols["pos"].append(i)
                    cols["start"].append(c.start)
                    cols["length"].append(c.length)
                    cols["cut_fp"].append(_i64(c.cut_fp))
                    cols["k"].append(hashlib.sha256(piece).hexdigest())
                    first = i == 0
                    cols["minhash"].append(mh if first else None)
                    cols["simhash"].append(sh if first else None)
                    cols["bands"].append(bh if first else None)
                    cols["n_shingles"].append(int(hs.size) if first else None)
            out = pd.DataFrame(cols)
            # int columns containing None would coerce to float64 and lose
            # low bits of 64-bit values — force nullable integer dtypes
            for c in ("cut_fp", "simhash"):
                out[c] = pd.array(cols[c], dtype="Int64")
            out["n_shingles"] = pd.array(cols["n_shingles"], dtype="Int32")
            yield out

    return corpus.select("file_id", "content").mapInPandas(gen, FUSED_SCHEMA)


def fused_chunks(fused: DataFrame) -> DataFrame:
    return fused.where(F.col("k").isNotNull()).select(
        "file_id", "pos", "start", "length", "cut_fp", "k"
    )


def fused_signatures(fused: DataFrame) -> DataFrame:
    return fused.where(F.col("pos") == 0).select(
        "file_id", "minhash", "simhash", "bands", "n_shingles"
    )
