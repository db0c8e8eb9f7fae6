#!/usr/bin/env python
"""Canary-normalized round-over-round bench comparison (r11 verdict
item #7): divide out each session's box factor using the artifact's own
q1 steady state, so a judge never needs a local rerun to dissolve a
hot-box phantom.

Usage:
    python scripts/compare_bench.py BENCH_rA.json BENCH_rB.json

Accepts either the driver wrapper format ({"parsed": {...}}) or the raw
bench.py JSON line. For every query present in both artifacts it prints

    canary_norm ratio = (tB / q1ssB) / (tA / q1ssA)

where q1ss is the artifact's q1-canary median (the `q1ss` field when
present, else the median of the `canary` triple). A ratio is flagged
only when it exceeds BOTH 1.25x and the query's own warm-run dispersion
(`wx`, the artifact's per-query noise self-measure) in either round —
the same bar the r10/r11 judges applied by hand.
"""

from __future__ import annotations

import json
import re
import sys


def _recover_from_tail(tail: str, path: str) -> dict:
    """Regex-recover a truncated artifact (r13 verdict item #1: the
    65-entry r13 line outgrew the driver's 2000-byte stdout window, so
    ``parsed`` is null and ``tail`` holds only the line's LAST 2000
    bytes — this tool then crashed on its own round's artifact).

    The tail's structure is a suffix of the real JSON line: some prefix
    of the ``queries`` dict is lost, but everything from ``"sf":``
    onward (sf, disp, wx, canary, q1ss) survives intact. Recover the
    whole-key query times by regex (a cut mid-name — r13's tail opens
    ``_time":1.4`` — has no opening quote and never matches; a cut
    exactly on the quote gives a match at offset 0 with a possibly
    truncated name, dropped), and parse the surviving JSON suffix for the
    normalizer fields. ``wx`` is discarded: it aligns by index with the
    FULL query order, which the lost prefix shifts — wx_for() then
    returns -1 (unknown noise) for every query, which only makes
    flagging MORE conservative."""
    m = re.search(r',"sf":', tail)
    if m is None:
        raise SystemExit(
            f"{path}: parsed is null and tail has no recoverable "
            '"sf" suffix — not a bench artifact'
        )
    matches = list(
        re.finditer(r'"([A-Za-z0-9_]+)":([0-9][0-9.]*)', tail[: m.start()])
    )
    # a cut inside a NAME leaves no opening quote, so the regex already
    # skips it; only a cut landing exactly ON the opening quote yields a
    # match at offset 0 whose name may be truncated — drop that one
    if matches and matches[0].start() == 0 and not tail.startswith('{"metric"'):
        matches = matches[1:]
    pairs = [m2.groups() for m2 in matches]
    suffix = json.loads("{" + tail[m.start() + 1 :])
    out = {"queries": {k: float(v) for k, v in pairs}}
    for key in ("sf", "disp", "canary", "q1ss"):
        if key in suffix:
            out[key] = suffix[key]
    print(
        f"# {path}: recovered {len(out['queries'])} query times from a "
        f"truncated tail (parsed=null); earlier entries are lost",
        file=sys.stderr,
    )
    return out


def load(path: str) -> dict:
    with open(path) as fh:
        raw = json.load(fh)
    parsed = raw.get("parsed", raw)
    if parsed is None:
        return _recover_from_tail(raw.get("tail") or "", path)
    if "queries" not in parsed:
        raise SystemExit(f"{path}: no 'queries' field — not a bench artifact")
    return parsed


def q1ss(parsed: dict) -> float:
    if "q1ss" in parsed:
        return float(parsed["q1ss"])
    canary = sorted(parsed.get("canary", []))
    if not canary:  # pre-r09 artifact: fall back to the recorded q1
        return float(parsed["queries"].get("q1_pricing_summary", 1.0))
    return float(canary[len(canary) // 2])


def wx_for(parsed: dict, name: str) -> int:
    names = list(parsed["queries"])
    wx = parsed.get("wx", [])
    try:
        return int(wx[names.index(name)])
    except (ValueError, IndexError):
        return -1


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    na, nb = q1ss(a), q1ss(b)
    if na <= 0 or nb <= 0:
        # a zero canary median would divide-by-zero every normalized
        # ratio below (the r12 advisor's finding #4) — fail loudly
        raise SystemExit(
            f"canary median is zero (A={na}, B={nb}); artifacts are not "
            "normalizable — rerun the bench"
        )
    print(f"# q1 steady state: A={na:.2f}s  B={nb:.2f}s  "
          f"(box factor B/A = {nb / na:.3f})")
    shared = [q for q in a["queries"] if q in b["queries"]]
    rows = []
    for q in shared:
        ta, tb = a["queries"][q], b["queries"][q]
        raw = tb / ta if ta else float("inf")
        norm = (tb / nb) / (ta / na) if ta else float("inf")
        noise = max(wx_for(a, q), wx_for(b, q), 0) / 100.0
        flag = norm > 1.25 and (norm - 1.0) > noise and (tb - ta) > 0.3
        rows.append((norm, raw, ta, tb, q, flag))
    if not rows:
        raise SystemExit("no shared queries between the two artifacts")
    rows.sort(reverse=True)
    print(f"{'norm':>6} {'raw':>6} {'tA':>7} {'tB':>7}  query")
    for norm, raw, ta, tb, q, flag in rows:
        mark = "  <-- FLAG" if flag else ""
        print(f"{norm:6.3f} {raw:6.3f} {ta:7.2f} {tb:7.2f}  {q}{mark}")
    norms = sorted(r[0] for r in rows)
    med = norms[len(norms) // 2]
    tot_a = sum(a["queries"][q] for q in shared)
    tot_b = sum(b["queries"][q] for q in shared)
    print(f"# shared={len(shared)} median_norm={med:.3f} "
          f"shared_wall A={tot_a:.1f}s B={tot_b:.1f}s "
          f"raw={tot_b / tot_a:.3f} norm={(tot_b / nb) / (tot_a / na):.3f}")
    flags = [r[4] for r in rows if r[5]]
    print(f"# flagged: {flags if flags else '[]'}")


if __name__ == "__main__":
    main()
