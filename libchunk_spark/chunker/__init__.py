from libchunk_spark.chunker.gf2 import DEFAULT_POL, window_tables
from libchunk_spark.chunker.rabin import (
    CORPUS_CONFIG,
    SMALL_DOC_CONFIG,
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
    "CORPUS_CONFIG",
    "SMALL_DOC_CONFIG",
]
