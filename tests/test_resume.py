"""Resumability: kill after stage k, rerun, identical final output
(BASELINE.md resumability row; north_rule checkpoint contract)."""

from __future__ import annotations

import json
import os

import pytest

from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
from libchunk_spark.config import PipelineConfig
from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
from libchunk_spark.pipeline import run_pipeline
from libchunk_spark.sources.catalog import StageCatalog, config_fingerprint


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_to_spark(spark, generate_corpus(n_files=80, seed=5)).cache()


def test_full_run_then_resume_skips_all(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    cat = StageCatalog(root=root)
    r1 = run_pipeline(corpus, CFG, cat, with_containment=False)
    first = sorted((r["file_id"], r["component"]) for r in r1.components.collect())
    assert r1.stages_run and not r1.stages_skipped

    # second run: everything must come from checkpoints, same answer
    cat2 = StageCatalog(root=root)
    r2 = run_pipeline(corpus, CFG, cat2, with_containment=False)
    assert not r2.stages_run
    assert set(r2.stages_skipped) == set(r1.stages_run)
    second = sorted((r["file_id"], r["component"]) for r in r2.components.collect())
    assert first == second


def test_partial_checkpoint_resume(spark, corpus, tmp_path_factory):
    """Simulate a crash after 'signatures': delete later checkpoints, rerun."""
    import shutil

    root = str(tmp_path_factory.mktemp("ckpt"))
    cat = StageCatalog(root=root)
    r1 = run_pipeline(corpus, CFG, cat, with_containment=False)
    first = sorted((r["file_id"], r["component"]) for r in r1.components.collect())

    for late in ["cand_pairs", "components"]:
        shutil.rmtree(os.path.join(root, late))

    r2 = run_pipeline(corpus, CFG, StageCatalog(root=root), with_containment=False)
    assert set(r2.stages_run) == {"cand_pairs", "components"}
    assert "signatures" in r2.stages_skipped
    second = sorted((r["file_id"], r["component"]) for r in r2.components.collect())
    assert first == second


def test_config_change_invalidates_checkpoints(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    run_pipeline(corpus, CFG, StageCatalog(root=root), with_containment=False)
    from dataclasses import replace

    cfg2 = replace(CFG, jaccard_threshold=0.9)
    assert config_fingerprint(cfg2) != config_fingerprint(CFG)
    r2 = run_pipeline(corpus, cfg2, StageCatalog(root=root), with_containment=False)
    assert r2.stages_run  # stale-fingerprint checkpoints recomputed


def test_manifest_has_lineage_and_metrics(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    run_pipeline(corpus, CFG, StageCatalog(root=root), with_containment=False)
    with open(os.path.join(root, "components", "_manifest.json")) as f:
        m = json.load(f)
    assert m["complete"] is True
    assert "cand_pairs" in m["inputs"]
    assert m["rows"] == 80
    assert m["partitions"] and all("rows" in p for p in m["partitions"])
