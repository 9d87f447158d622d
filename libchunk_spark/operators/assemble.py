"""assemble (get/join) — key lists + chunk index → reassembled streams.

Spark-first re-expression of bits.Get (/root/reference/bits/get.go:13-129):
per-key store probe becomes an equi-join on k; the reference's ordered fan-in
(get.go:106-113) becomes a sort on the carried pos column; ErrNoSuchKey
(bits/bits.go:15-18) becomes a null-chunk count assertion.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class NoSuchKeyError(Exception):
    """A requested chunk key is absent from every store (bits/bits.go:15-18)."""


@dataclass
class AssembleResult:
    assembled: DataFrame  # (file_id, content_sha256, reassembled_sha256, ok)
    missing: DataFrame  # (file_id, pos, k) keys with no chunk row


def assemble(
    file_keys: DataFrame,
    chunk_index: DataFrame,
    remote_index: DataFrame | None = None,
) -> AssembleResult:
    """Join every key against the chunk index and reassemble in key order.

    With a remote_index, keys absent locally are probed there — the
    reference's multi-store fallback (bits/get.go:36-47) as a coalesced
    second left join.
    """
    # posexplode_outer keeps zero-key (empty content) files: they reassemble
    # to the empty byte string and must still satisfy the sha256 invariant
    keys = file_keys.select(
        "file_id",
        "content_sha256",
        F.posexplode_outer("keys").alias("pos", "k"),
    )
    joined = keys.join(
        chunk_index.select("k", F.col("chunk").alias("chunk_local")), "k", "left"
    )
    if remote_index is not None:
        joined = joined.join(
            remote_index.select("k", F.col("chunk").alias("chunk_remote")),
            "k",
            "left",
        ).withColumn("chunk", F.coalesce("chunk_local", "chunk_remote"))
    else:
        joined = joined.withColumn("chunk", F.col("chunk_local"))

    missing = joined.where(
        F.col("chunk").isNull() & F.col("k").isNotNull()
    ).select("file_id", "pos", "k")

    assembled = (
        joined.groupBy("file_id", "content_sha256")
        .agg(
            F.array_sort(
                # when() without otherwise -> null for zero-key files;
                # collect_list skips nulls, leaving an empty parts array
                F.collect_list(
                    F.when(F.col("k").isNotNull(), F.struct("pos", "chunk"))
                )
            ).alias("parts")
        )
        # binary-safe concat in pos order (chunk cuts may split UTF-8 code
        # points, so parts are only valid as bytes until fully reassembled)
        .withColumn(
            "reassembled",
            F.aggregate(
                "parts",
                F.lit(b""),
                lambda acc, p: F.concat(acc, p.chunk),
            ),
        )
        .withColumn("reassembled_sha256", F.sha2("reassembled", 256))
        .withColumn(
            "ok", F.col("reassembled_sha256") == F.col("content_sha256")
        )
        .select("file_id", "content_sha256", "reassembled_sha256", "ok")
    )
    return AssembleResult(assembled=assembled, missing=missing)


def assert_round_trip(result: AssembleResult) -> None:
    """Raise if any key is missing or any row fails the sha256 invariant."""
    n_missing = result.missing.limit(1).count()
    if n_missing:
        row = result.missing.first()
        raise NoSuchKeyError(f"no such key: file_id={row['file_id']} pos={row['pos']}")
    bad = result.assembled.where(~F.col("ok")).limit(1).count()
    if bad:
        raise AssertionError("round-trip sha256 invariant violated")
