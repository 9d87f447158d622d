from libchunk_spark.chunker.gf2 import DEFAULT_POL, window_tables
from libchunk_spark.chunker.rabin import (
    Chunk,
    ChunkerConfig,
    chunk_batch,
    chunk_bytes,
)

__all__ = [
    "DEFAULT_POL",
    "window_tables",
    "Chunk",
    "ChunkerConfig",
    "chunk_bytes",
    "chunk_batch",
]
