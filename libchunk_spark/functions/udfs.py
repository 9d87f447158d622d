"""Vectorized pandas/Arrow UDFs — the only Python↔JVM boundaries in the
pipeline (input_hint: "no per-row Python").

Two UDFs exist, both Series-in/Series-out over Arrow batches with NumPy
kernels inside:

* chunk_offsets_udf — content-defined chunk boundaries (pos, start, length,
  cut_fp) per row. Payload bytes and sha256 keys are derived JVM-side from
  the offsets (substring + sha2), so chunk payloads never cross into Python.
* signature_udf — MinHash signature + SimHash + LSH band hashes per row,
  computed from the fine-grained shingle chunking in one pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from libchunk_spark.chunker.rabin import ChunkerConfig, chunk_batch
from libchunk_spark.config import SignatureConfig
from libchunk_spark.functions.signatures import (
    band_hashes,
    minhash_signature,
    shingle_hashes_batch,
    simhash,
)

CHUNK_OFFSETS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("start", T.LongType()),
            T.StructField("length", T.IntegerType()),
            T.StructField("cut_fp", T.LongType()),
        ]
    )
)

SIGNATURE_TYPE = T.StructType(
    [
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("simhash", T.LongType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
        T.StructField("n_shingles", T.IntegerType()),
    ]
)


def _as_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return bytes(v)


def _i64(u: int) -> int:
    """Reinterpret uint64 as int64 (two's complement) for LongType columns."""
    return u - (1 << 64) if u >= (1 << 63) else u


def make_chunk_offsets_udf(cfg: ChunkerConfig):
    """pandas UDF: binary content -> array<struct<pos,start,length,cut_fp>>.

    Iterator form so the (pickled) chunker tables are materialized once per
    executor task, not per batch.
    """

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            payloads = [_as_bytes(v) for v in s]
            all_chunks = chunk_batch(payloads, cfg)
            out = [
                [
                    {
                        "pos": i,
                        "start": c.start,
                        "length": c.length,
                        "cut_fp": _i64(c.cut_fp),
                    }
                    for i, c in enumerate(chunks)
                ]
                for chunks in all_chunks
            ]
            yield pd.Series(out)

    return pandas_udf(fn, CHUNK_OFFSETS_TYPE)


def make_signature_udf(shingle_cfg: ChunkerConfig, sig_cfg: SignatureConfig):
    """pandas UDF: binary content -> (minhash, simhash, bands, n_shingles)."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            payloads = [_as_bytes(v) for v in s]
            hash_sets = shingle_hashes_batch(payloads, shingle_cfg)
            mh, sh, bh, ns = [], [], [], []
            for hs in hash_sets:
                sig = minhash_signature(hs, sig_cfg)
                mh.append([_i64(int(x)) for x in sig])
                sh.append(_i64(simhash(hs, sig_cfg)))
                bh.append([_i64(int(x)) for x in band_hashes(sig, sig_cfg)])
                ns.append(int(hs.size))
            yield pd.DataFrame(
                {"minhash": mh, "simhash": sh, "bands": bh, "n_shingles": ns}
            )

    return pandas_udf(fn, SIGNATURE_TYPE)


def utf8_bytes(col):
    """content string -> binary, pinning the UTF-8 encoding in one place
    (SURVEY.md §7 risk: sha2/chunker byte agreement)."""
    return F.encode(col, "UTF-8")
