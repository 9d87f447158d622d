"""move (mv/push) — copy chunks to a remote store, skipping indexed keys.

Spark-first re-expression of bits.Move (/root/reference/bits/move.go:11-119):
the remote-index prefetch + skip (move.go:53-65,84-88) is a left-anti join;
idempotent put (bits/bits.go:51-52) is dropDuplicates before append. Push
order is irrelevant (the reference runs this fan-in unordered, move.go:101).
"""

from __future__ import annotations

from dataclasses import dataclass

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


def push_append(pushed: DataFrame, remote_path: str) -> None:
    """Append pushed chunk rows to the remote table (idempotent by k:
    out-of-date-index tolerance, command/mv.go:59-64 — duplicate appends are
    deduped on read or by a later compaction MERGE)."""
    pushed.dropDuplicates(["k"]).write.mode("append").parquet(remote_path)
