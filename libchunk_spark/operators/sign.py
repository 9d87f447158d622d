"""sign — per-file MinHash/SimHash signatures from content-defined shingles.

One map-side pass (no shuffle): the signature UDF chunks each file with the
fine-grained shingle config, hashes the pieces, and reduces to a 128-perm
MinHash signature, a 64-bit SimHash, and per-band LSH hashes — all inside a
single Arrow batch. At 10^12-file scale this stage is embarrassingly
parallel; its cost is bounded by the chunker kernel throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libchunk_spark.config import PipelineConfig
from libchunk_spark.functions.udfs import make_signature_udf, utf8_bytes


def sign(corpus: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(file_id, minhash[], simhash, bands[], n_shingles)."""
    udf = make_signature_udf(cfg.shingle, cfg.signature)
    return (
        corpus.select("file_id", utf8_bytes(F.col("content")).alias("cb"))
        .withColumn("sig", udf(F.col("cb")))
        .select(
            "file_id",
            F.col("sig.minhash").alias("minhash"),
            F.col("sig.simhash").alias("simhash"),
            F.col("sig.bands").alias("bands"),
            F.col("sig.n_shingles").alias("n_shingles"),
        )
    )
