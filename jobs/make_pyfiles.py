#!/usr/bin/env python
"""Package libchunk_spark into a --py-files zip (north_rule run mode:
`spark-submit --py-files libchunk_spark.zip jobs/run_pipeline.py ...`).

The zip contains the package sources only (no tests, no caches); Spark
ships it to every executor and prepends it to the Python path, so the
pipeline runs on clusters where the repo is not installed. Verified
end-to-end by tests/test_spark_submit.py, which runs the real
spark-submit binary with imports resolvable ONLY from the zip.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, repo: str = REPO) -> str:
    pkg = os.path.join(repo, "libchunk_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "libchunk_spark.zip"
    )
    print(build_zip(out))
