#!/usr/bin/env python3
"""Round-over-round bench history: build, diff, merge.

The driver preserves only the LAST 2000 characters of bench stdout in
``BENCH_r{N}.json`` (``tail``), with ``parsed`` set when the final JSON
line fit the window.  This module recovers per-query wall times from
those records (including truncated tails), maintains a committed
``BENCH_HISTORY.json`` {query: {"best": sec, "round": "rN"}}, and
diffs a fresh run against it so bench.py can print loud
``# REGRESSION name: 2.1x vs rN`` markers — the r6 +60% uniform
regression was caught by the judge, not the builder; this closes that
gap in-process (VERDICT r7 task 7).

Run as a script to (re)build BENCH_HISTORY.json from all committed
BENCH_r*.json records.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A tail may begin mid-number (front-truncated); only trust pairs whose
# opening quote is present.  Times are "name": 1.234 pairs.
_PAIR_RE = re.compile(r'"([a-z]\w+)":\s*([0-9]+(?:\.[0-9]+)?)')


def times_from_record(rec: dict) -> dict[str, float]:
    """Per-query wall times from one BENCH_r{N}.json record.

    Prefers the driver-parsed JSON; falls back to regex over the tail,
    taking ONLY the region before the queries map closes (``}, "sf"``)
    and never reading past ``"sf_ratio"`` — slope ratios reuse the same
    query names and would otherwise be mistaken for times."""
    parsed = rec.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return {k: float(v) for k, v in parsed["queries"].items()}
    tail = rec.get("tail", "") or ""
    cut = tail.find('}, "sf"')
    if cut == -1:
        cut = tail.find('},"sf"')
    region = tail[:cut] if cut != -1 else tail
    ratio_at = region.find("sf_ratio")
    if ratio_at != -1:
        region = region[:ratio_at]
    out = {}
    for name, val in _PAIR_RE.findall(region):
        if name in ("metric", "value", "unit", "sf", "n", "rc", "cpus"):
            continue
        out[name] = float(val)
    return out


def build_history(repo: str = REPO) -> dict[str, dict]:
    """Per-query best committed time across all BENCH_r*.json rounds."""
    history: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        label = os.path.basename(path)[len("BENCH_"):-len(".json")]
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        for name, t in times_from_record(rec).items():
            cur = history.get(name)
            if cur is None or t < cur["best"]:
                history[name] = {"best": t, "round": label}
    return history


def diff_regressions(
    times: dict[str, float],
    history: dict[str, dict],
    threshold: float = 1.5,
    floor_sec: float = 0.1,
) -> list[dict]:
    """Queries slower than ``threshold``x their best committed time.

    Prior bests under ``floor_sec`` are overhead-dominated at sf0.1
    (sub-100ms measurements vary multiples on the co-tenant host), so
    the ratio is computed against max(best, floor) to avoid crying
    wolf on noise — the same guard the slope check uses."""
    out = []
    for name, t in sorted(times.items()):
        prior = history.get(name)
        if not prior:
            continue
        base = max(prior["best"], floor_sec)
        if t > threshold * base:
            out.append(
                {
                    "query": name,
                    "sec": t,
                    "ratio": round(t / base, 2),
                    "vs": prior["round"],
                    "prior_sec": prior["best"],
                }
            )
    return sorted(out, key=lambda r: -r["ratio"])


def compact_regressions(
    regressions: list[dict], max_n: int = 5
) -> list[dict]:
    """Size-budgeted regression list for the ONE-LINE bench JSON.

    VERDICT r8 item 1: the ``# REGRESSION`` stderr markers fell outside
    the driver's 2000-char stdout tail, so only ``n_regressions``
    survived into the committed record and the judge had to recompute
    the names from BENCH_HISTORY.json.  This keeps (query, ratio,
    vs-round) inside the parsed line itself, shortened keys and capped
    at ``max_n`` entries (most severe first — diff_regressions already
    sorts) so the line stays inside the tail window."""
    return [
        {"q": r["query"], "r": r["ratio"], "vs": r["vs"]}
        for r in regressions[:max_n]
    ]


def merge_history(
    history: dict[str, dict], times: dict[str, float], label: str
) -> dict[str, dict]:
    """New history with this run's improvements folded in (pure)."""
    out = {k: dict(v) for k, v in history.items()}
    for name, t in times.items():
        cur = out.get(name)
        if cur is None or t < cur["best"]:
            out[name] = {"best": t, "round": label}
    return out


def load_history(repo: str = REPO) -> dict[str, dict]:
    path = os.path.join(repo, "BENCH_HISTORY.json")
    try:
        return json.load(open(path))
    except Exception:
        return {}


if __name__ == "__main__":
    hist = build_history()
    path = os.path.join(REPO, "BENCH_HISTORY.json")
    with open(path, "w") as fh:
        json.dump(hist, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(hist)} queries")
