"""bench.py scaling-field selection: gate-vs-curve discipline.

The per-round driver records bench.py's JSON as BENCH_r{N}.json, and its
scaling_efficiency_* fields are read against the >=0.8 N-vs-4N gate — so
they must carry the GATE-shape (local[2] vs local[8]) measurement even
when the most recent jobs/scaling_bench.py run was a wider-footprint
curve point (n=4 overwrote BENCH/scaling.json in round 7 and briefly
surfaced the 0.667 curve value in the gate-named field).

No JVM needed: scaling_fields() is pure file selection.
"""

import importlib.util
import json
import os
import time

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write(path, payload, mtime=None):
    with open(path, "w") as f:
        json.dump(payload, f)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_gate_fields_come_from_newest_gate_shape_artifact(tmp_path):
    now = time.time()
    # older gate-shape run
    _write(
        tmp_path / "scaling_old.json",
        {"n": 2, "efficiency_chunk_sign": 0.70, "efficiency_total": 0.60},
        mtime=now - 300,
    )
    # newest gate-shape run (the adjudicated verdict)
    _write(
        tmp_path / "scaling_window3.json",
        {"n": 2, "efficiency_chunk_sign": 0.872, "efficiency_total": 0.769},
        mtime=now - 100,
    )
    # newest OVERALL artifact is a curve point at the wider footprint
    _write(
        tmp_path / "scaling.json",
        {"n": 4, "efficiency_chunk_sign": 0.667, "efficiency_total": 0.519},
        mtime=now,
    )
    out = bench.scaling_fields(str(tmp_path))
    assert out["scaling_efficiency_chunk_sign"] == 0.872
    assert out["scaling_efficiency_total"] == 0.769
    assert out["scaling_artifact"] == "scaling_window3.json"
    assert out["scaling_gate_shape"] == "local[2] vs local[8]"
    # the curve point is still reported, under curve-named fields
    assert out["scaling_curve_n"] == 4
    assert out["scaling_curve_efficiency_chunk_sign"] == 0.667
    assert out["scaling_curve_efficiency_total"] == 0.519


def test_gate_shape_scaling_json_wins_when_newest(tmp_path):
    now = time.time()
    _write(
        tmp_path / "scaling_window3.json",
        {"n": 2, "efficiency_chunk_sign": 0.872, "efficiency_total": 0.769},
        mtime=now - 100,
    )
    _write(
        tmp_path / "scaling.json",
        {"n": 2, "efficiency_chunk_sign": 0.95, "efficiency_total": 0.85},
        mtime=now,
    )
    out = bench.scaling_fields(str(tmp_path))
    assert out["scaling_efficiency_chunk_sign"] == 0.95
    assert out["scaling_artifact"] == "scaling.json"
    assert "scaling_curve_n" not in out


def test_legacy_artifact_without_n_counts_as_gate_shape(tmp_path):
    _write(
        tmp_path / "scaling.json",
        {"efficiency_chunk_sign": 0.86, "efficiency_total": 0.75},
    )
    out = bench.scaling_fields(str(tmp_path))
    assert out["scaling_efficiency_chunk_sign"] == 0.86
    assert "scaling_curve_n" not in out


def test_no_artifacts_yields_no_fields(tmp_path):
    assert bench.scaling_fields(str(tmp_path)) == {}


def test_repo_bench_dir_resolves_gate_not_curve():
    """On the real BENCH/ dir: the n=4 curve run owns scaling.json, but the
    gate fields must resolve to a gate-shape artifact with the MET value."""
    bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
    out = bench.scaling_fields(bench_dir)
    assert out["scaling_efficiency_chunk_sign"] >= 0.8  # the MET gate
    with open(os.path.join(bench_dir, out["scaling_artifact"])) as f:
        assert json.load(f).get("n", bench.GATE_N) == bench.GATE_N
    assert out["scaling_curve_n"] == 4  # curve point reported separately
