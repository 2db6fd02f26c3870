"""Bench history helpers (tools/bench_history.py) — pure-Python tests.

VERDICT r7 task 7: bench.py must diff against the best committed prior
round per query and print loud regression markers.  These tests pin the
diff semantics (threshold, sub-100ms floor), the truncated-tail
recovery (r6/r7 records had ``parsed: null``), and history merging.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.bench_history import (  # noqa: E402
    build_history,
    diff_regressions,
    merge_history,
    times_from_record,
)


def test_times_from_parsed_record():
    rec = {"parsed": {"queries": {"q01": 0.5, "p10": 1.25}, "value": 1.75}}
    assert times_from_record(rec) == {"q01": 0.5, "p10": 1.25}


def test_times_from_truncated_tail_excludes_sf_ratio():
    # Front-truncated tail (mid-number), queries map closing with
    # }, "sf": ..., then an sf_ratio map reusing the SAME names with
    # DIFFERENT values — those must not be mistaken for times.
    tail = (
        '23, "q16_running_sum": 1.31, "p10_range_join": 2.5}, "sf": 0.1, '
        '"sf_ratio": {"q16_running_sum": 13.1, "p10_range_join": 24.74}}'
    )
    rec = {"parsed": None, "tail": tail}
    assert times_from_record(rec) == {
        "q16_running_sum": 1.31,
        "p10_range_join": 2.5,
    }


def test_diff_regressions_threshold_and_floor():
    history = {
        "a": {"best": 1.0, "round": "r06"},
        "b": {"best": 1.0, "round": "r05"},
        "tiny": {"best": 0.02, "round": "r06"},  # under the 0.1s floor
        "absent": {"best": 9.0, "round": "r01"},
    }
    times = {"a": 2.1, "b": 1.4, "tiny": 0.12, "new_query": 5.0}
    regs = diff_regressions(times, history, threshold=1.5, floor_sec=0.1)
    # a: 2.1x > 1.5 -> flagged; b: 1.4x -> not; tiny: 0.12 vs
    # max(0.02, 0.1)=0.1 -> 1.2x -> not (floor absorbs sub-100ms noise);
    # new_query has no prior -> not.
    assert [r["query"] for r in regs] == ["a"]
    assert regs[0]["ratio"] == 2.1
    assert regs[0]["vs"] == "r06"


def test_diff_regressions_sorted_most_severe_first():
    history = {"a": {"best": 1.0, "round": "r06"}, "b": {"best": 1.0, "round": "r06"}}
    regs = diff_regressions({"a": 2.0, "b": 3.0}, history)
    assert [r["query"] for r in regs] == ["b", "a"]


def test_merge_history_keeps_best_and_is_pure():
    history = {"a": {"best": 1.0, "round": "r06"}}
    merged = merge_history(history, {"a": 0.8, "b": 2.0}, "local")
    # legacy entry seeded into the per-round map, best recomputed
    assert merged["a"]["best"] == 0.8 and merged["a"]["round"] == "local"
    assert merged["a"]["times"] == {"r06": 1.0, "local": 0.8}
    assert merged["b"]["best"] == 2.0 and merged["b"]["times"] == {"local": 2.0}
    assert history["a"]["best"] == 1.0 and "times" not in history["a"]


def test_regression_baseline_is_cross_round_median_not_lucky_min():
    # r8 phantom alerts: one lucky 0.359s draw in r04 made every later
    # normal-noise draw look 1.5x "regressed".  vs-median: no alert.
    from tools.bench_history import baseline_sec

    entry = {
        "best": 0.359,
        "round": "r04",
        "times": {"r03": 0.787, "r04": 0.359, "r05": 0.414,
                  "r06": 0.604, "r07": 0.613, "r08": 0.54},
    }
    assert baseline_sec(entry) == (0.54 + 0.604) / 2  # even-n median
    regs = diff_regressions({"p18": 0.61}, {"p18": entry})
    assert regs == []  # 0.61s is ordinary noise vs the 0.572s median
    regs = diff_regressions({"p18": 1.2}, {"p18": entry})
    assert len(regs) == 1 and regs[0]["baseline_sec"] == 0.572
    # legacy entries without a times map fall back to best
    assert baseline_sec({"best": 1.0, "round": "r01"}) == 1.0


def test_build_history_over_committed_records():
    # The repo's real records: every recovered best must be positive
    # and carry a round label, and the flagship queries must be there
    # despite r6/r7 tail truncation.
    hist = build_history()
    assert "p12_minhash_lsh" in hist and "x104_entity_resolution" in hist
    for v in hist.values():
        assert v["best"] > 0 and v["round"].startswith("r")


def test_compact_regressions_budgeted_and_round_trips():
    # VERDICT r8 item 1: names must survive inside the one-line JSON.
    from tools.bench_history import compact_regressions
    import json

    regs = diff_regressions(
        {f"q{i:02d}_very_long_query_name": 3.0 for i in range(10)},
        {f"q{i:02d}_very_long_query_name": {"best": 1.0, "round": "r05"}
         for i in range(10)},
    )
    compact = compact_regressions(regs, max_n=5)
    assert len(compact) == 5
    assert compact[0] == {"q": regs[0]["query"], "r": 3.0, "vs": "r05"}
    # each entry must stay tiny so 5 of them fit the tail budget
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 300
