"""scripts/compare_bench.py: canary normalization must dissolve a pure
box-factor shift and still flag a genuine per-query regression."""

from __future__ import annotations

import json
import subprocess
import sys


def _artifact(tmp_path, name, queries, canary, wx=None):
    p = tmp_path / name
    p.write_text(json.dumps({
        "parsed": {
            "queries": queries,
            "canary": canary,
            "wx": wx or [0] * len(queries),
        }
    }))
    return str(p)


def _run(a, b):
    out = subprocess.run(
        [sys.executable, "scripts/compare_bench.py", a, b],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_box_factor_shift_dissolves(tmp_path):
    qa = {"q1_pricing_summary": 1.0, "alpha": 2.0, "beta": 4.0}
    # round B: EVERYTHING 1.5x — a hot box, not a regression
    qb = {k: v * 1.5 for k, v in qa.items()}
    out = _run(
        _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0]),
        _artifact(tmp_path, "b.json", qb, [1.5, 1.5, 1.5]),
    )
    assert "flagged: []" in out
    assert "median_norm=1.000" in out


def test_genuine_regression_still_flags(tmp_path):
    qa = {"q1_pricing_summary": 1.0, "alpha": 2.0, "beta": 4.0}
    qb = {"q1_pricing_summary": 1.0, "alpha": 2.0, "beta": 9.0}
    out = _run(
        _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0]),
        _artifact(tmp_path, "b.json", qb, [1.0, 1.0, 1.0]),
    )
    assert "flagged: ['beta']" in out


def test_noise_self_measure_suppresses_flag(tmp_path):
    qa = {"q1_pricing_summary": 1.0, "alpha": 2.0}
    qb = {"q1_pricing_summary": 1.0, "alpha": 2.9}
    # alpha's own warm dispersion was 50% — a 1.45x delta is noise by
    # the artifact's own measure
    out = _run(
        _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0], wx=[0, 50]),
        _artifact(tmp_path, "b.json", qb, [1.0, 1.0, 1.0], wx=[0, 0]),
    )
    assert "flagged: []" in out
