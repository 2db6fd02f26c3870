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

# The core count every committed baseline is measured at.  The driver
# ALSO benches the tree at a lower core count to measure scaling
# (e.g. BENCH_r12_c8.json, cpus=8); those records are a different
# machine shape and must not vote into the medians/bests the
# regression and throughput alerts compare against (VERDICT r12
# item 3: the 8-core run overwrote BENCH_FULL.json and polluted the
# history).  Records without a ``cpus`` field predate the scaling runs
# and are all canonical.
CANONICAL_CPUS = 32

# A tail may begin mid-number (front-truncated); only trust pairs whose
# opening quote is present.  Times are "name": 1.234 pairs.
_PAIR_RE = re.compile(r'"([a-z]\w+)":\s*([0-9]+(?:\.[0-9]+)?)')

# Layer-throughput metrics (higher is better) that ride the same
# history/median-alert machinery as query times (VERDICT r9 item 2:
# r9's committed streaming number swung -38% vs r8 and nothing fired,
# because the history tracked only query wall times).
THROUGHPUT_KEYS = (
    "streaming_events_per_sec",
    "gate_docs_per_sec",
    "ingest_docs_per_sec",
    "curation_docs_per_sec",
)


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


def metrics_from_record(rec: dict) -> dict[str, float]:
    """Layer-throughput metrics from one BENCH_r{N}.json record.

    Prefers the driver-parsed JSON; falls back to a per-key regex over
    the raw tail (the metrics sit AFTER the queries map, so the
    times_from_record region cut never sees them)."""
    parsed = rec.get("parsed")
    out: dict[str, float] = {}
    if isinstance(parsed, dict):
        for k in THROUGHPUT_KEYS:
            v = parsed.get(k)
            if isinstance(v, (int, float)):
                out[k] = float(v)
    if out:
        return out
    tail = rec.get("tail", "") or ""
    for k in THROUGHPUT_KEYS:
        m = re.search(rf'"{k}":\s*([0-9]+(?:\.[0-9]+)?)', tail)
        if m:
            out[k] = float(m.group(1))
    return out


def regressed_from_record(rec: dict) -> set[str]:
    """Query names the round itself flagged as regressed, from the
    compact ``regressions`` list bench.py embeds in the one-line JSON
    (``[{"q": name, "r": ratio, "vs": round}, ...]``)."""
    parsed = rec.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("regressions"), list):
        return {
            r.get("q") for r in parsed["regressions"] if isinstance(r, dict)
        } - {None}
    return set()


def build_history(repo: str = REPO) -> dict[str, dict]:
    """Per-query committed times across all BENCH_r*.json rounds.

    Each entry keeps the full {round: sec} map plus the derived best.
    The regression baseline is the cross-round MEDIAN, not the min:
    the min over N noisy draws is an extreme value that only ratchets
    down as rounds accumulate, so sub-second queries drift "up" vs it
    by construction (r8's p18/x93 flags were exactly this — isolated
    10-repeat re-measures sat at/below the cross-round median while
    1.5x above the one lucky r4/r5 draw).

    Rounds a record itself flagged as regressed for a query are kept
    in the times map but listed under ``regressed`` so baseline_sec
    can exclude them — otherwise a regression that persists a few
    rounds pulls its own median up and self-clears (ADVICE r9)."""
    history: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        label = os.path.basename(path)[len("BENCH_"):-len(".json")]
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        if rec.get("cpus", CANONICAL_CPUS) != CANONICAL_CPUS:
            continue  # non-canonical core count (driver scaling run)
        flagged = regressed_from_record(rec)
        # the driver's records carry measure inside the parsed line;
        # builder-written records carry it at the top level; absent on
        # both sides means the pre-r10 count() era
        parsed = rec.get("parsed") or {}
        measure = rec.get("measure") or parsed.get("measure") or "count"
        for name, t in times_from_record(rec).items():
            cur = history.setdefault(name, {"times": {}})
            cur["times"][label] = t
            cur.setdefault("proto", {})[label] = measure
            if name in flagged:
                cur.setdefault("regressed", []).append(label)
        for name, v in metrics_from_record(rec).items():
            cur = history.setdefault(
                name, {"times": {}, "higher_is_better": True}
            )
            cur["times"][label] = v
    for name, cur in history.items():
        pick = max if cur.get("higher_is_better") else min
        best_round = pick(cur["times"], key=cur["times"].get)
        cur["best"] = cur["times"][best_round]
        cur["round"] = best_round
    return history


def baseline_sec(entry: dict, measure: str | None = None) -> float | None:
    """Robust regression baseline for one history entry.

    Median of the committed per-round times when available — EXCLUDING
    rounds flagged as regressed when they were committed (a persistent
    regression must not vote its own median up; ADVICE r9) AND, when
    ``measure`` is given, rounds recorded under a DIFFERENT
    materialization protocol (r10 moved count() -> noop-write; a
    level-shifted protocol must not be compared against the old one's
    median, or genuinely level-shifted queries would flag forever).
    Returns None when a protocol filter leaves no round — the caller
    skips the regression check, the correct behavior in the first
    round of a new protocol.  If every round is regression-flagged,
    falls back to the unfiltered (same-protocol) median so the
    baseline never goes undefined.  Entries from the pre-r9
    {best, round} format fall back to the best."""
    times = entry.get("times")
    if times:
        # a missing proto map means every round predates stamping —
        # i.e. the count() era — so absent entries default to "count"
        proto = entry.get("proto", {})
        if measure is not None:
            times = {
                k: v
                for k, v in times.items()
                if proto.get(k, "count") == measure
            }
            if not times:
                return None
        flagged = set(entry.get("regressed", ()))
        accepted = {k: v for k, v in times.items() if k not in flagged}
        ts = sorted((accepted or times).values())
        n = len(ts)
        mid = n // 2
        return ts[mid] if n % 2 else (ts[mid - 1] + ts[mid]) / 2.0
    return entry["best"]


def diff_regressions(
    times: dict[str, float],
    history: dict[str, dict],
    threshold: float = 1.5,
    floor_sec: float = 0.1,
    measure: str | None = None,
) -> list[dict]:
    """Queries slower than ``threshold``x their committed baseline.

    The baseline is the cross-round median (``baseline_sec``) — robust
    to the lucky-draw min — and baselines under ``floor_sec`` are
    overhead-dominated at sf0.1 (sub-100ms measurements vary multiples
    on the co-tenant host), so the ratio is computed against
    max(median, floor) to avoid crying wolf on noise — the same guard
    the slope check uses."""
    out = []
    for name, t in sorted(times.items()):
        prior = history.get(name)
        if not prior or prior.get("higher_is_better"):
            continue
        raw = baseline_sec(prior, measure)
        if raw is None:  # no committed round under this protocol yet
            continue
        base = max(raw, floor_sec)
        if t > threshold * base:
            # "vs" names the best SAME-PROTOCOL round (the cross-era
            # best would mislabel a protocol level shift as the
            # comparison point)
            proto = prior.get("proto", {})
            times_p = {
                k: v
                for k, v in prior.get("times", {}).items()
                if measure is None or proto.get(k, "count") == measure
            } or prior.get("times", {})
            vs = (
                min(times_p, key=times_p.get)
                if times_p
                else prior.get("round")
            )
            best_p = times_p.get(vs, prior.get("best"))
            out.append(
                {
                    "query": name,
                    "sec": t,
                    "ratio": round(t / base, 2),
                    "vs": vs,
                    "baseline_sec": round(base, 3),
                    "prior_sec": best_p,
                }
            )
    return sorted(out, key=lambda r: -r["ratio"])


def diff_throughput_drops(
    metrics: dict[str, float],
    history: dict[str, dict],
    threshold: float = 1.5,
) -> list[dict]:
    """Throughput metrics slower than 1/``threshold`` of their
    cross-round median — the higher-is-better mirror of
    diff_regressions (VERDICT r9 item 2: a -38% streaming swing must
    fire a marker, exactly like a 1.5x query slowdown does)."""
    out = []
    for name, v in sorted(metrics.items()):
        prior = history.get(name)
        if not prior or not prior.get("higher_is_better"):
            continue
        base = baseline_sec(prior)  # median works direction-free
        if base > 0 and v < base / threshold:
            out.append(
                {
                    "metric": name,
                    "value": v,
                    "ratio": round(base / v, 2),
                    "vs": prior["round"],
                    "baseline": round(base, 1),
                    "prior_best": prior["best"],
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
    history: dict[str, dict],
    times: dict[str, float],
    label: str,
    regressed: set[str] | frozenset[str] = frozenset(),
    measure: str | None = None,
) -> dict[str, dict]:
    """New history with this run folded in under ``label`` (pure).

    The run's time is recorded in the per-round map (a repeated label
    keeps the latest draw) and best/round are recomputed, so the
    median baseline sees every round while the committed best is still
    available for slope context.  Queries in ``regressed`` (this run's
    own diff_regressions output) get the label appended to their
    ``regressed`` list so future baselines exclude the draw — the
    median tracks only accepted performance (ADVICE r9)."""
    out = {
        k: {
            **v,
            "times": dict(v.get("times", {})),
            **({"proto": dict(v["proto"])} if "proto" in v else {}),
            **(
                {"regressed": list(v["regressed"])}
                if "regressed" in v
                else {}
            ),
        }
        for k, v in history.items()
    }
    for name, t in times.items():
        cur = out.setdefault(name, {"times": {}})
        if name in THROUGHPUT_KEYS:
            cur["higher_is_better"] = True
        if not cur["times"] and "best" in cur:
            # legacy {best, round} entry: seed the map with it
            cur["times"][cur["round"]] = cur["best"]
        cur["times"][label] = t
        if measure is not None and name not in THROUGHPUT_KEYS:
            cur.setdefault("proto", {})[label] = measure
        if name in regressed and label not in cur.get("regressed", ()):
            cur.setdefault("regressed", []).append(label)
        pick = max if cur.get("higher_is_better") else min
        best_round = pick(cur["times"], key=cur["times"].get)
        cur["best"] = cur["times"][best_round]
        cur["round"] = best_round
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
