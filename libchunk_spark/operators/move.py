"""move (mv/push) — copy chunks to a remote store, skipping indexed keys.

Spark-first re-expression of bits.Move (/root/reference/bits/move.go:11-119):
the remote-index prefetch + skip (move.go:53-65,84-88) is a left-anti join;
idempotent put (bits/bits.go:51-52) is dropDuplicates before append. Push
order is irrelevant (the reference runs this fan-in unordered, move.go:101).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MoveResult:
    pushed: DataFrame  # chunk rows that must be transferred
    skipped_count: int  # keys already present remotely


def move(
    local_index: DataFrame,
    remote_keys: DataFrame,
    broadcast_index: bool = True,
) -> MoveResult:
    """Chunk rows to push = local chunk_index ∖ remote key index.

    remote_keys needs only column k (the reference prefetches exactly the key
    listing, store/s3.go:60-134). Broadcast it when it fits — the planner's
    AQE will also do this dynamically, the hint makes it deterministic.
    """
    idx = remote_keys.select("k").dropDuplicates(["k"])
    if broadcast_index:
        idx = F.broadcast(idx)
    pushed = local_index.join(idx, "k", "left_anti")
    n_local = local_index.select("k").distinct().count()
    n_push = pushed.count()
    return MoveResult(pushed=pushed, skipped_count=n_local - n_push)


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits, h probe positions."""
    import math

    n = max(n, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    h = max(1, round(m / n * math.log(2)))
    return m, h


def _bloom_positions(keys, m: int, h: int):
    """(len(keys), h) probe positions. Chunk keys ARE sha256 hex, so the
    double-hash pair comes straight from key slices — cryptographically
    uniform by construction, no extra hash pass (the same observation that
    makes the chunk-key shuffle skew-free). uint64 wraparound arithmetic is
    deterministic and shared by build and probe."""
    h1 = np.array([int(k[:15], 16) for k in keys], dtype=np.uint64)
    h2 = np.array([int(k[15:30], 16) | 1 for k in keys], dtype=np.uint64)
    i = np.arange(h, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def move_bloom(
    local_index: DataFrame,
    remote_keys: DataFrame,
    expected_keys: int,
    fpp: float = 0.01,
) -> MoveResult:
    """Bloom-pruned push plan — same result as move(), different cost model.

    At 10^12 chunk keys the remote index cannot be broadcast exactly (a
    sha256-hex key set is ~65 B/key → tens of TB), but a Bloom filter of it
    can (~1.2 GB per 10^9 keys at 1% fpp). Two phases, mirroring the
    reference's MemIndex.Has membership check (bits/move.go:53-65 — the
    index IS a membership filter, the exact listing only matters when
    membership says maybe):

      1. keys the Bloom says are ABSENT are definitely new → pushed with no
         join at all (the common case for fresh content: a map-side filter);
      2. keys the Bloom says MAYBE present (true hits + fpp false alarms)
         anti-join against the real index — a join whose left side is
         |hits| + fpp·|new|, not |local|.

    Exactness: a Bloom has no false negatives, so phase 1 never wrongly
    pushes; phase 2 resolves every maybe exactly. Output equals move()'s
    anti-join byte-for-byte (pytest-asserted, including planted
    false-positive keys). The filter builds distributed — one NumPy bitmap
    per partition of the remote index, OR-reduced — and only the m-bit
    bitmap reaches the driver for broadcast. PySpark exposes no
    stat.bloomFilter, so this is native (and key-slice hashing beats
    re-hashing anyway).
    """
    from pyspark.sql.functions import pandas_udf

    spark = local_index.sparkSession
    idx = remote_keys.select("k").dropDuplicates(["k"])
    m, h = _bloom_params(expected_keys, fpp)
    n_bytes = (m + 7) // 8

    def part_bitmap(rows):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        keys = [r["k"] for r in rows]
        if keys:
            pos = _bloom_positions(keys, m, h).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield bm.tobytes()

    # OR-combine bitmaps executor-side in a tree: the driver receives ONE
    # m-bit bitmap, not one per partition (at 10^9-key filters and 1000
    # partitions a driver-side collect would move terabytes)
    combined = idx.rdd.mapPartitions(part_bitmap).treeReduce(
        lambda a, b: np.bitwise_or(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes()
    )
    bc = spark.sparkContext.broadcast(combined)

    @pandas_udf("boolean")
    def maybe(keys: pd.Series) -> pd.Series:  # Arrow-batched bit probe
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        kl = keys.tolist()
        if not kl:
            return pd.Series([], dtype=bool)
        pos = _bloom_positions(kl, m, h)
        hit = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    flagged = local_index.withColumn("_maybe", maybe(F.col("k")))
    definitely_new = flagged.where(~F.col("_maybe")).drop("_maybe")
    maybe_present = flagged.where(F.col("_maybe")).drop("_maybe")
    resolved_new = maybe_present.join(idx, "k", "left_anti")
    pushed = definitely_new.unionByName(resolved_new)
    n_local = local_index.select("k").distinct().count()
    n_push = pushed.count()
    return MoveResult(pushed=pushed, skipped_count=n_local - n_push)


def push_append(pushed: DataFrame, remote_path: str) -> None:
    """Append pushed chunk rows to the remote table (idempotent by k:
    out-of-date-index tolerance, command/mv.go:59-64 — duplicate appends are
    deduped on read or by a later compaction MERGE)."""
    pushed.dropDuplicates(["k"]).write.mode("append").parquet(remote_path)
