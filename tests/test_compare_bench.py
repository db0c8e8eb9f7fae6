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


def test_truncated_artifact_recovers_from_tail(tmp_path):
    """r13 verdict item #1: when the bench line outgrows the driver's
    2000-byte stdout window the wrapper records parsed=null plus the
    LAST 2000 bytes as `tail`; load() must regex-recover the surviving
    query times (dropping the first, possibly mid-key, pair) instead of
    crashing with TypeError."""
    qa = {"q1_pricing_summary": 1.0, "alpha": 2.0, "beta": 4.0}
    a = _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0])
    # a truncated round-B artifact: line cut mid-key — 'beta' opens as
    # 'ta":' — and q1 lost entirely; the JSON suffix survives
    tail = (
        'ta":4.2,"alpha":2.0,"q5x":3.0},"sf":0.1,"disp":0.1,'
        '"wx":[0,0,0,0],"canary":[1.0,1.0,1.0],"q1ss":1.0}'
    )
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"n": 1, "rc": 0, "parsed": None, "tail": tail}))
    out = _run(a, str(b))
    # the mid-NAME 'ta' fragment never matches (no opening quote);
    # alpha and beta... q5x has no twin in A; alpha compares; q1 absent
    assert "alpha" in out and '"ta"' not in out
    assert "flagged: []" in out


def test_truncated_tail_cut_on_quote_drops_first_pair(tmp_path):
    """A cut landing exactly ON a pair's opening quote yields a match
    at offset 0 whose name may be silently truncated — that pair (and
    only that pair) is dropped."""
    qa = {"q1_pricing_summary": 1.0, "time": 9.9, "alpha": 2.0}
    a = _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0])
    tail = (
        '"time":4.2,"alpha":2.0},"sf":0.1,'
        '"canary":[1.0,1.0,1.0],"q1ss":1.0}'
    )
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"parsed": None, "tail": tail}))
    out = _run(a, str(b))
    # "time" COULD be the tail of e.g. "join_band_time" — dropped; had
    # it compared, 4.2 vs 9.9 would appear in the table
    assert "4.2" not in out and "alpha" in out


def test_truncated_artifact_without_suffix_fails_loudly(tmp_path):
    qa = {"q1_pricing_summary": 1.0}
    a = _artifact(tmp_path, "a.json", qa, [1.0, 1.0, 1.0])
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"parsed": None, "tail": "garbage"}))
    out = subprocess.run(
        [sys.executable, "scripts/compare_bench.py", a, str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "not a bench artifact" in out.stderr
