"""Named store registry — StoreMap analog.

The reference routes operations through a named-store map: `get` probes all
stores in order, `put` targets "local", `move` goes local -> remote
(/root/reference/bits/bits.go:96-136). Here stores are named table
locations (parquet dirs or Iceberg tables); the probe order becomes the
assemble operator's local→remote coalesce.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

LOCAL = "local"
REMOTE = "remote"


class NoSuchStoreError(KeyError):
    pass


@dataclass
class StoreMap:
    """name -> chunk-index table path, with libchunk's routing rules."""

    paths: dict[str, str] = field(default_factory=dict)

    def add(self, name: str, path: str) -> "StoreMap":
        self.paths[name] = path
        return self

    def _read(self, spark: SparkSession, name: str) -> DataFrame:
        if name not in self.paths:
            raise NoSuchStoreError(name)
        return spark.read.parquet(self.paths[name])

    def get_srcs(self, spark: SparkSession) -> list[DataFrame]:
        """All stores, local first (GetSrcs: probe order, bits.go:102-107)."""
        ordered = sorted(self.paths, key=lambda n: (n != LOCAL, n))
        return [self._read(spark, n) for n in ordered]

    def put_dst(self) -> str:
        """Put always targets local (PutDst, bits.go:112-118)."""
        if LOCAL not in self.paths:
            raise NoSuchStoreError(LOCAL)
        return self.paths[LOCAL]

    def move_src(self, spark: SparkSession) -> DataFrame:
        """Move reads from local (MoveSrc, bits.go:123-125)."""
        return self._read(spark, LOCAL)

    def move_dst(self) -> str:
        """Move writes to remote (MoveDst, bits.go:130-136)."""
        if REMOTE not in self.paths:
            raise NoSuchStoreError(REMOTE)
        return self.paths[REMOTE]
