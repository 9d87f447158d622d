"""North-rule run mode, end-to-end: the REAL `spark-submit --py-files`
binary runs the pipeline CLI with package imports resolvable ONLY from
the zip (the script is copied out of the repo so neither the cwd nor the
script-adjacent path contains libchunk_spark)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_runs_pipeline(spark, tmp_path):
    from jobs.make_pyfiles import build_zip
    from libchunk_spark.fixtures import corpus_to_spark, generate_corpus

    zip_path = build_zip(str(tmp_path / "libchunk_spark.zip"))
    corpus_path = str(tmp_path / "corpus")
    corpus_to_spark(spark, generate_corpus(n_files=60, seed=7)).coalesce(
        2
    ).write.parquet(corpus_path)

    # copy the CLI outside the repo: its own sys.path.insert(REPO) then
    # points at tmp_path, so `import libchunk_spark` MUST come from the zip
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), jobs_dir)

    env = {
        k: v
        for k, v in os.environ.items()
        if k != "PYTHONPATH" and not k.startswith("SPARK_GRAFT")
    }
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(jobs_dir / "run_pipeline.py"),
            "--corpus",
            corpus_path,
            "--checkpoints",
            str(tmp_path / "ckpt"),
            "--stage",
            "all",
            "--config",
            "docs",
            "--master",
            "local[4]",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    out = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert out["rows"] > 0
    assert "components" in out["stages_run"]
    # stage checkpoints + manifests landed (resumable per north_rule)
    manifests = [
        f
        for _, _, files in os.walk(tmp_path / "ckpt")
        for f in files
        if f.endswith(".json")
    ]
    assert manifests, "no stage manifests written"
