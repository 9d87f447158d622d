"""Cluster-audit shapes over an EXISTING components assignment.

The audit composites (cluster stats, shard plan, dedup verdicts,
curation) are aggregations over the components table — at production
scale they read the checkpointed `components` stage (pipeline.py), never
re-pay the CC loop (VERDICT r06 next #4). The registry queries default to
recomputing components so the DuckDB oracle sees one self-contained plan;
both paths funnel through these functions, so checkpoint-fed ==
recomputed is pinned by construction plus the equality pytest
(tests/test_queries_batch4.py).

Scale notes live on each function; both are grouped counts on the
component key — a giant component concentrates its COUNT cell, not an
edge-list shuffle (aggregates partial-combine map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_stats(
    components: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per non-singleton component: size, intra-cluster candidate-edge
    count, and edge density n_edges / (n choose 2) — the over-merge
    dashboard (huge + sparse = borderline bands glued transitively).

    components: (id_col, component); edges: (a, b) candidate pairs.
    The edge→component mapping is one equi-join on the `a` endpoint
    (edges are intra-cluster by construction of CC), then two grouped
    counts on component."""
    sizes = components.groupBy("component").agg(F.count("*").alias("n_docs"))
    ec = (
        edges.join(
            components.select(F.col(id_col).alias("a"), "component"), "a"
        )
        .groupBy("component")
        .agg(F.count("*").alias("n_edges"))
    )
    return (
        sizes.where(F.col("n_docs") >= 2)
        .join(ec, "component", "left")
        .select(
            "component",
            "n_docs",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.round(
                F.coalesce("n_edges", F.lit(0))
                / (F.col("n_docs") * (F.col("n_docs") - 1) / 2.0),
                4,
            ).alias("density"),
        )
    )


def shard_plan(
    components: DataFrame, doc_sizes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster-aware output sharding balance audit: shard = first sha256
    hex nibble of the component id, so a dup cluster's docs always land in
    ONE shard (downstream per-shard jobs re-verify locally with zero
    cross-shard dup edges). doc_sizes: (id_col, n_chars)."""
    shard = F.substring(F.sha2(F.col("component").cast("string"), 256), 1, 1)
    return (
        components.join(doc_sizes, id_col)
        .select(shard.alias("shard"), "component", "n_chars")
        .groupBy("shard")
        .agg(
            F.countDistinct("component").alias("n_clusters"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
