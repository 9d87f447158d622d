"""Type-1 clone grouping (queries.py::q_clone_type1_groups): exact copies
modulo whitespace/layout and line comments must share a canon_sha; any
token change must split the group."""

from __future__ import annotations

import duckdb
import pytest

from libchunk_spark.queries import SQL_CLONE_TYPE1_GROUPS, q_clone_type1_groups

BASE = "def f(a, b) {\n    return a + b\n}\n"
VARIANTS_SAME = [
    BASE,
    # reformatted: tabs, extra blank lines, trailing spaces
    "def f(a, b) {  \n\n\treturn a + b\n\n}\n",
    # line comments added (both styles)
    "def f(a, b) { // adds two numbers\n    return a + b  # simple\n}\n",
    # collapsed to one line
    " def f(a, b) { return a + b } ",
]
VARIANTS_DIFFERENT = [
    "def f(a, c) {\n    return a + c\n}\n",  # identifier changed
    "def f(a, b) {\n    return a - b\n}\n",  # operator changed
    "def f(a, b) {\n    return a +b\n}\n",  # space removed INSIDE a run
]


def _write(tmp_path, texts):
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "source": "t", "text": texts}
    )
    p = str(tmp_path / "documents.parquet")
    pdf.to_parquet(p)
    return str(tmp_path)


@pytest.fixture(scope="module")
def groups(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t1")
    sf_dir = _write(tmp, VARIANTS_SAME + VARIANTS_DIFFERENT)
    rows = q_clone_type1_groups(spark, sf_dir).collect()
    return {r.doc_id: r for r in rows}


def test_layout_variants_share_the_group(groups):
    shas = {groups[i].canon_sha for i in range(len(VARIANTS_SAME))}
    assert len(shas) == 1
    assert groups[0].group_size == len(VARIANTS_SAME)
    assert groups[0].is_clone


def test_token_changes_split_the_group(groups):
    base_sha = groups[0].canon_sha
    n = len(VARIANTS_SAME)
    for i in range(n, n + len(VARIANTS_DIFFERENT)):
        assert groups[i].canon_sha != base_sha, f"variant {i} merged wrongly"


def test_whitespace_collapse_is_not_token_fusion(groups):
    # 'a +b' collapses to 'a +b' (one space), which differs from 'a + b'
    # only if the missing space changes the token stream — it does: the
    # canon is a string, not a token list, so 'a + b' vs 'a +b' differ.
    n = len(VARIANTS_SAME)
    fused = groups[n + 2]
    assert fused.canon_sha != groups[0].canon_sha


def test_spark_matches_duckdb_on_planted_corpus(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t1sql")
    sf_dir = _write(tmp, VARIANTS_SAME + VARIANTS_DIFFERENT)
    srows = sorted(
        tuple(r) for r in q_clone_type1_groups(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    drows = sorted(tuple(r) for r in con.execute(SQL_CLONE_TYPE1_GROUPS).fetchall())
    assert srows == drows
