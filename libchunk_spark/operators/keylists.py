"""Key-list text codec + sources/sinks (libchunk key interchange format).

The reference serializes keys as URL-safe base64, one per line, to stdio or
files (/root/reference/bits/keys/stdio.go:12-41, codec bits/bits.go:74-92).
Here the same wire format is produced/consumed with built-in column
functions: standard base64 + a 2-character translate to the URL-safe
alphabet (and padding stripped, matching Go's RawURLEncoding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def b64url_encode(binary_col) -> "F.Column":
    """binary key -> unpadded URL-safe base64 (K.String analog)."""
    return F.translate(
        F.regexp_replace(F.base64(binary_col), "=+$", ""), "+/", "-_"
    )


def b64url_decode(text_col) -> "F.Column":
    # unbase64 tolerates missing padding; reverse the alphabet translation
    return F.unbase64(F.translate(text_col, "-_", "+/"))


def write_keylist(file_keys: DataFrame, path: str) -> None:
    """file_keys (keys array of sha256-hex) -> text file, one b64url per line,
    stream order preserved per file (TextLineKeyWriter analog)."""
    (
        file_keys.select(
            "file_id", F.posexplode("keys").alias("pos", "k_hex")
        )
        .select(
            "file_id",
            "pos",
            b64url_encode(F.unhex(F.col("k_hex"))).alias("line"),
        )
        .orderBy("file_id", "pos")
        .select("line")
        .write.mode("overwrite")
        .text(path)
    )


def read_keylist(spark: SparkSession, path: str) -> DataFrame:
    """Text key lines -> (pos, k) rows, k as sha256 hex (TextLineKeyReader).

    Length-validated like DecodeKey (bits/bits.go:83-91): rows whose decoded
    key is not KeySize bytes are surfaced in a `valid` column instead of
    silently passing.
    """
    lines = spark.read.text(path)
    decoded = lines.select(
        F.monotonically_increasing_id().alias("pos"),
        F.lower(F.hex(b64url_decode(F.col("value")))).alias("k"),
    )
    return decoded.withColumn("valid", F.length("k") == 64)
