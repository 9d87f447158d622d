"""libchunk_spark — PySpark-native near-duplicate detection & clustering.

A from-scratch, Spark-first re-expression of the capabilities of
advdv/libchunk (content-defined chunking + content-addressable dedup), scaled
into a distributed near-dup pipeline: vectorized Rabin chunker → content-
defined shingles → MinHash + LSH banding (+ SimHash, + suffix-array
containment) → candidate pairs → iterative connected components.
"""

from libchunk_spark.chunker.rabin import Chunk, ChunkerConfig, chunk_bytes

__all__ = ["Chunk", "ChunkerConfig", "chunk_bytes"]
__version__ = "0.1.0"
