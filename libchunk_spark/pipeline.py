"""End-to-end pipeline orchestration with per-stage checkpoints.

Stages (north_rule): chunk → sign → band/pairs → components. Each stage
checkpoints through StageCatalog (parquet+manifest here, Iceberg when a
catalog is configured) and is skipped when already complete at the same
config fingerprint — kill the job after stage k, rerun, and stages 1..k are
read back instead of recomputed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libchunk_spark.config import PipelineConfig
from libchunk_spark.operators.components import connected_components
from libchunk_spark.operators.containment import (
    containment_candidates,
    verify_containment,
)
from libchunk_spark.operators.lsh import (
    minhash_candidate_edges,
    simhash_candidate_edges,
)
from libchunk_spark.operators.sign import sign
from libchunk_spark.operators.split import split
from libchunk_spark.sources.catalog import StageCatalog, config_fingerprint


@dataclass
class PipelineResult:
    chunk_index: DataFrame
    file_keys: DataFrame
    signatures: DataFrame
    edges: DataFrame
    components: DataFrame
    stages_run: list[str]
    stages_skipped: list[str]


def run_pipeline(
    corpus: DataFrame,
    cfg: PipelineConfig,
    catalog: StageCatalog,
    with_containment: bool = True,
) -> PipelineResult:
    fp = config_fingerprint(cfg)
    ran: list[str] = []
    skipped: list[str] = []

    def stage(name: str, builder, inputs: list[str], **kw) -> DataFrame:
        if catalog.is_complete(name, fp):
            skipped.append(name)
            return catalog.read_stage(corpus.sparkSession, name)
        ran.append(name)
        return catalog.write_stage(name, builder(), fp, inputs=inputs, **kw)

    # stage 1: chunk (put) — content-addressable index + ordered key lists
    sp = None

    def _split():
        nonlocal sp
        sp = split(corpus, cfg.chunk)
        return sp.chunks

    chunks = stage("chunks", _split, ["corpus"])
    chunk_index = stage(
        "chunk_index",
        lambda: (sp.chunk_index if sp else _rebuild_index(chunks)),
        ["chunks"],
    )
    file_keys = stage(
        "file_keys",
        lambda: (sp.file_keys if sp else _rebuild_keys(corpus, chunks)),
        ["chunks", "corpus"],
    )

    # stage 2: sign — minhash/simhash/band hashes, map-side only
    signatures = stage("signatures", lambda: sign(corpus, cfg), ["corpus"])

    # stage 3: candidate edges (minhash LSH ∪ simhash ∪ containment)
    def _edges():
        e = minhash_candidate_edges(signatures, cfg).withColumn(
            "source", F.lit("minhash")
        )
        e = e.unionByName(
            simhash_candidate_edges(signatures, cfg).withColumn(
                "source", F.lit("simhash")
            )
        )
        if with_containment:
            cand = containment_candidates(chunks, file_keys)
            ver = verify_containment(cand, corpus)
            e = e.unionByName(
                ver.select("a", "b").withColumn("source", F.lit("substr"))
            )
        return e

    edges = stage("cand_pairs", _edges, ["signatures", "chunks"])

    # stage 4: connected components
    components = stage(
        "components",
        lambda: connected_components(
            edges.select("a", "b"), all_nodes=corpus.select("file_id")
        ),
        ["cand_pairs", "corpus"],
    )

    return PipelineResult(
        chunk_index=chunk_index,
        file_keys=file_keys,
        signatures=signatures,
        edges=edges,
        components=components,
        stages_run=ran,
        stages_skipped=skipped,
    )


def _rebuild_index(chunks: DataFrame) -> DataFrame:
    cols = [c for c in ["k", "length", "cut_fp", "chunk"] if c in chunks.columns]
    return chunks.select(*cols).dropDuplicates(["k"])


def _rebuild_keys(corpus: DataFrame, chunks: DataFrame) -> DataFrame:
    from libchunk_spark.functions.udfs import utf8_bytes

    grouped = chunks.groupBy("file_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "k"))), lambda s: s.k
        ).alias("keys"),
    )
    return (
        corpus.select(
            "file_id", F.sha2(utf8_bytes(F.col("content")), 256).alias("content_sha256")
        )
        .join(grouped, "file_id", "left")
        .select(
            "file_id",
            "content_sha256",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("keys", F.array().cast("array<string>")).alias("keys"),
        )
    )
