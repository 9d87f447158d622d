"""Rename/move detection between corpus snapshots (operators/renames.py).

Planted two-snapshot corpus: pure renames (content identical, path
changed), edited renames (path changed + ~5% of lines mutated),
deletions, fresh additions, one cross-repo move, and a majority of
unchanged files. Exact tier must find exactly the planted pure renames;
the fuzzy tier must find every planted edited rename above the
containment floor; unchanged paths must never appear; the cross-repo
move must NOT match (within-repo scope, documented)."""

from __future__ import annotations

import numpy as np
import pytest

from libchunk_spark.fixtures import CorpusRow, _gen_base, _mutate_lines, generate_corpus
from libchunk_spark.operators.renames import rename_pairs, snapshot_changes

SEED = 7


def _snapshots():
    rows = generate_corpus(n_files=120, seed=SEED)
    # role rows: unique (repo, path) key, content unique in the corpus
    # (so the exact tier's expected set is exactly the planted set), and
    # one row per family (no derived dups to create extra fuzzy pairs)
    from collections import Counter

    key_n = Counter((r.repo, r.path) for r in rows)
    content_n = Counter(r.content for r in rows)
    fam_n = Counter(r.family for r in rows)
    eligible = [
        r
        for r in rows
        if r.kind == "base"
        and key_n[(r.repo, r.path)] == 1
        and content_n[r.content] == 1
        and fam_n[r.family] == 1
    ]
    assert len(eligible) >= 22, "seed must yield enough isolated base rows"
    pure = eligible[0:8]
    edited = eligible[8:16]
    deleted = eligible[16:21]
    crossrepo = eligible[21]
    rng = np.random.default_rng(SEED + 1)

    old = [r for r in rows if key_n[(r.repo, r.path)] == 1]
    role_keys = {
        (r.repo, r.path) for r in pure + edited + deleted + [crossrepo]
    }
    new: list[CorpusRow] = [
        r for r in old if (r.repo, r.path) not in role_keys
    ]
    planted_pure = []
    for r in pure:
        new_path = r.path + ".moved"
        new.append(CorpusRow(r.file_id, r.repo, new_path, r.commit, r.lang,
                             r.content, r.family, "renamed"))
        planted_pure.append((r.repo, r.path, new_path))
    planted_edit = []
    for r in edited:
        new_path = "renamed/" + r.path
        content = _mutate_lines(rng, r.content, 0.05)
        new.append(CorpusRow(r.file_id, r.repo, new_path, r.commit, r.lang,
                             content, r.family, "renamed_edited"))
        planted_edit.append((r.repo, r.path, new_path))
    # deletions: simply absent from new. fresh additions:
    for i in range(5):
        new.append(CorpusRow(10_000 + i, "org9/fresh", f"src/new{i}.py",
                             "-", "py", _gen_base(rng, "py", 40, False),
                             10_000 + i, "base"))
    # cross-repo move: identical content, different repo
    new.append(CorpusRow(crossrepo.file_id, "org9/elsewhere", crossrepo.path,
                         crossrepo.commit, crossrepo.lang, crossrepo.content,
                         crossrepo.family, "crossrepo"))
    return old, new, planted_pure, planted_edit, deleted, crossrepo


def _df(spark, rows):
    return spark.createDataFrame(
        [(r.repo, r.path, r.content) for r in rows],
        "repo string, path string, content string",
    )


@pytest.fixture(scope="module")
def result(spark):
    old, new, planted_pure, planted_edit, deleted, crossrepo = _snapshots()
    old_df, new_df = _df(spark, old), _df(spark, new)
    removed, added = snapshot_changes(old_df, new_df)
    out = rename_pairs(old_df, new_df).collect()
    return {
        "old": old,
        "new": new,
        "planted_pure": set(planted_pure),
        "planted_edit": set(planted_edit),
        "deleted": deleted,
        "crossrepo": crossrepo,
        "rows": out,
        "n_removed": removed.count(),
        "n_added": added.count(),
    }


def test_snapshot_changes_counts(result):
    # removed = 8 pure + 8 edited + 5 deleted + 1 cross-repo
    assert result["n_removed"] == 22
    # added = 8 pure + 8 edited + 5 fresh + 1 cross-repo landing
    assert result["n_added"] == 22


def test_exact_tier_is_exactly_the_planted_pure_renames(result):
    found = {
        (r.repo, r.old_path, r.new_path)
        for r in result["rows"]
        if r.kind == "exact"
    }
    assert found == result["planted_pure"]
    assert all(r.sim == 1.0 for r in result["rows"] if r.kind == "exact")


def test_edited_tier_finds_every_planted_edited_rename(result):
    found = {
        (r.repo, r.old_path, r.new_path)
        for r in result["rows"]
        if r.kind == "edited"
    }
    missing = result["planted_edit"] - found
    assert not missing, f"edited renames missed: {missing}"
    sims = [
        r.sim
        for r in result["rows"]
        if r.kind == "edited"
        and (r.repo, r.old_path, r.new_path) in result["planted_edit"]
    ]
    assert min(sims) >= 0.5  # the operator's floor, with planted ~5% edits


def test_edited_tier_reports_no_unrelated_pairs(result):
    # only removed/added leftovers can pair; the corpus's unrelated
    # random files must not cross the containment floor
    extra = {
        (r.repo, r.old_path, r.new_path)
        for r in result["rows"]
        if r.kind == "edited"
    } - result["planted_edit"]
    assert not extra, f"unexpected edited pairs: {extra}"


def test_unchanged_paths_never_appear(result):
    changed_old = {(p[0], p[1]) for p in result["planted_pure"]} | {
        (p[0], p[1]) for p in result["planted_edit"]
    } | {(r.repo, r.path) for r in result["deleted"]} | {
        (result["crossrepo"].repo, result["crossrepo"].path)
    }
    for r in result["rows"]:
        assert (r.repo, r.old_path) in changed_old


def test_cross_repo_move_is_out_of_scope(result):
    cr = result["crossrepo"]
    for r in result["rows"]:
        assert not (r.old_path == cr.path and r.repo == cr.repo), (
            "cross-repo move must not match within-repo rename detection"
        )


def test_pure_rename_not_double_reported_as_edited(result):
    exact_endpoints = {
        (r.repo, r.old_path) for r in result["rows"] if r.kind == "exact"
    }
    for r in result["rows"]:
        if r.kind == "edited":
            assert (r.repo, r.old_path) not in exact_endpoints


def test_rename_scan_cli_smoke(spark, tmp_path, monkeypatch, capsys):
    """jobs/rename_scan.py end-to-end on the planted snapshots: the JSON
    summary and the output parquet must carry exactly the planted pairs."""
    import json
    import sys

    import pandas as pd

    old, new, planted_pure, planted_edit, *_ = _snapshots()
    for name, rows in (("old", old), ("new", new)):
        pd.DataFrame(
            {
                "repo": [r.repo for r in rows],
                "path": [r.path for r in rows],
                "content": [r.content for r in rows],
            }
        ).to_parquet(str(tmp_path / f"{name}.parquet"))
    sys.path.insert(0, "/root/repo/jobs")
    import rename_scan

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "rename_scan.py",
            "--old-snapshot", str(tmp_path / "old.parquet"),
            "--new-snapshot", str(tmp_path / "new.parquet"),
            "--out", str(tmp_path / "pairs"),
        ],
    )
    assert rename_scan.main() == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["pairs"] == {"exact": 8, "edited": 8}
    back = spark.read.parquet(str(tmp_path / "pairs"))
    found = {
        (r.repo, r.old_path, r.new_path, r.kind) for r in back.collect()
    }
    expect = {(a, b, c, "exact") for a, b, c in planted_pure} | {
        (a, b, c, "edited") for a, b, c in planted_edit
    }
    assert found == expect
