#!/usr/bin/env python3
"""Round-over-round bench comparison with plan-fingerprint awareness.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 0.15]

Each input is a bench.py stdout capture (headline line + optional details
line) or a driver BENCH_r*.json wrapper with a "tail" field.  For every
common query the delta is classified:

  PLAN-CHANGED   plan_sha differs -> the code asked for a different plan;
                 the timing delta is attributable
  HOST-NOISE     sha unchanged and |best delta| within threshold, or the
                 median moved much more than best (load spike)
  FASTER/SLOWER  sha unchanged but best moved beyond threshold -- same
                 plan, different runtime (data size, caching, library)

Shas recorded before the round-4 context-free fingerprint fix are not
comparable across contexts; treat PLAN-CHANGED vs pre-r4 files with
suspicion (see ROUND_NOTES.md round-4 addendum).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, dict]:
    """Returns (timings, details) from any of the accepted shapes."""
    text = open(path).read()
    timings, details = {}, {}
    # driver wrapper: {"tail": "...json lines..."} or raw bench stdout
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "tail" in obj:
            text = obj["tail"]
        elif isinstance(obj, dict) and "queries" in obj:
            return obj["queries"], obj.get("details", {})
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            timings = obj["queries"]
            details = obj.get("details", details)
        elif "details" in obj:
            details = obj["details"]
    return timings, details


def classify(name: str, old: dict, new: dict, ot: float, nt: float, thr: float) -> str:
    osha = (old or {}).get("plan_sha")
    nsha = (new or {}).get("plan_sha")
    if osha and nsha and osha != nsha:
        return "PLAN-CHANGED"
    rel = (nt - ot) / ot if ot else 0.0
    nb, nm = (new or {}).get("best"), (new or {}).get("median")
    if abs(rel) <= thr:
        return "steady"
    if nb and nm and nm > nb * 1.8:
        return "HOST-NOISE?"
    return "FASTER" if rel < 0 else "SLOWER"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.15
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old_t, old_d = load(args[0])
    new_t, new_d = load(args[1])
    for path, t in ((args[0], old_t), (args[1], new_t)):
        if not t:
            print(f"no parseable headline queries in {path} (truncated"
                  " pre-r4 capture?)")
            return 1
    common = sorted(set(old_t) & set(new_t))
    total_o = total_n = 0.0
    print(f"{'query':40s} {'old':>7s} {'new':>7s} {'delta':>7s}  class")
    for q in common:
        ot, nt = old_t[q], new_t[q]
        total_o += ot
        total_n += nt
        cls = classify(q, old_d.get(q), new_d.get(q), ot, nt, thr)
        print(f"{q:40s} {ot:7.2f} {nt:7.2f} {nt - ot:+7.2f}  {cls}")
    only_old = sorted(set(old_t) - set(new_t))
    only_new = sorted(set(new_t) - set(old_t))
    print(f"\ncommon-{len(common)} total: {total_o:.1f} -> {total_n:.1f}"
          f" ({(total_n - total_o) / total_o * 100:+.0f}%)")
    if only_old:
        print("dropped:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(f"{q} ({new_t[q]:.2f})" for q in only_new))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
