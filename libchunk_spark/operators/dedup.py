"""Dedup decisions: cluster → canonical representative + keep/drop verdicts.

The end product a training-data pipeline consumes: for every near-dup
cluster, elect one representative and mark the rest as drops. Representative
election is a rank-1 window over each component — the reference's implicit
"first writer wins" idempotent-put semantics (bits/store/bolt.go:52-55)
generalized to clusters.

Election policies:
* "longest"  — keep the longest content (ties by min file_id): favors the
               most complete variant (containment cases keep the container);
* "min_id"   — deterministic cheapest (no content column needed).

Also exact_dup_groups_by_keys: libchunk-exact whole-file identity — files
whose ordered chunk-key lists match (same key list ⇔ same bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def elect_representatives(
    components: DataFrame,
    corpus: DataFrame | None = None,
    policy: str = "longest",
) -> DataFrame:
    """(file_id, component, rank, is_representative) per file.

    components: (file_id, component). corpus needed for the "longest"
    policy (provides content). The window is partitioned by component —
    cluster sizes are bounded in practice, and the giant-component case is
    exactly the boilerplate cluster where rank order still only needs one
    shuffle on component.
    """
    if policy == "min_id":
        w = Window.partitionBy("component").orderBy(F.asc("file_id"))
        ranked = components.withColumn("rank", F.row_number().over(w))
    elif policy == "longest":
        if corpus is None:
            raise ValueError("policy 'longest' requires the corpus")
        sized = components.join(
            corpus.select("file_id", F.length("content").alias("n_chars")),
            "file_id",
        )
        w = Window.partitionBy("component").orderBy(
            F.desc("n_chars"), F.asc("file_id")
        )
        ranked = sized.withColumn("rank", F.row_number().over(w)).drop("n_chars")
    else:
        raise ValueError(f"unknown policy {policy!r}")
    return ranked.withColumn("is_representative", F.col("rank") == 1)


def dedup_verdicts(
    components: DataFrame,
    corpus: DataFrame | None = None,
    policy: str = "longest",
) -> DataFrame:
    """(file_id, component, keep) — the materialized dedup decision table."""
    return elect_representatives(components, corpus, policy).select(
        "file_id", "component", F.col("is_representative").alias("keep")
    )


def exact_dup_groups_by_keys(file_keys: DataFrame) -> DataFrame:
    """Whole-file exact-dup groups via identical ordered key lists.

    libchunk's strongest identity: two files with the same K-key sequence
    are byte-identical (sha256 per chunk, order carried). Grouping on a
    digest of the concatenated keys avoids shuffling the arrays themselves.
    """
    keyed = file_keys.withColumn(
        "keylist_digest", F.sha2(F.concat_ws(",", F.col("keys")), 256)
    )
    return (
        keyed.groupBy("keylist_digest")
        .agg(
            F.count("*").alias("n_files"),
            F.min("file_id").alias("representative"),
            F.collect_list("file_id").alias("file_ids"),
        )
        .where(F.col("n_files") > 1)
    )
