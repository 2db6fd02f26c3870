#!/usr/bin/env python3
"""Root-cause the 7x second-decade band (VERDICT r10 item 1).

The r10 three-point scale record's three steepest second-decade
ratios — q40 7.16, x104 7.03, x78 6.77 — cluster in a narrow band
well above the other 41 queries.  All are sublinear (< the 10x data
ratio), but the record cannot tell local[32] saturation at the
amplified point (fixed shuffle-partition count, memory pressure) from
a genuinely near-linear algorithmic term.  This probe separates the
two causes by measurement:

  for each of the three queries, at BOTH the mid point (sf0.1) and
  the big point (.scaledata/sf1.0 = 10x mid), best-of-3 under
  spark.sql.shuffle.partitions in {8, 32, 128}

- If the big-point time drops materially (>25%) as partitions rise
  from 32 to 128, the 32-partition big point was saturated (too few,
  too large partitions: spill / single-core stragglers) and the band
  is a measurement artifact of the record's fixed setting.
- If the per-setting ratio big/mid stays flat across the sweep, the
  growth is the query's own data term, and the record should name it:
    q40  — the dense per-key hourly grid is OUTPUT-proportional
           (users x span rows materialized under noop-write), and
           users grow 10x under the amplifier: near-linear by design.
    x104 — conjunctive-key block populations are joint token
           frequencies; pair verification cost is sum over blocks of
           |block|^2, which grows toward linear-in-pairs as
           populations scale with corpus size.
    x78  — per-anchor candidate windows fan out with corpus density;
           triplet output itself grows ~linearly with anchors.

Measurement discipline is bench.py's own `_best_of` (noop-write
materialization, tracked-cache release + GC nudge per query) so the
numbers are comparable to BENCH_SCALE.json.  AQE coalescing is ON in
the session (as everywhere): the sweep therefore moves the AQE
*initial* partition number, which is exactly the dial a cluster
operator has.

Writes SCALE_ROOTCAUSE.json at the repo root.

Usage: python3 tools/scale_rootcause.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _best_of  # noqa: E402
from kafka_spark_streaming_pipeline_spark.plans import QUERIES  # noqa: E402
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

MID = "/root/testdata/sf0.1"
BIG = os.path.join(REPO, ".scaledata", "sf1.0")
TARGETS = [
    "q40_resample_ffill",
    "x104_entity_resolution",
    "x78_contrastive_triplets",
]
SWEEP = [8, 32, 128]
REPEATS = 3
SATURATION_DROP = 0.25  # 128-partition big time < 75% of 32-partition


def _verdict(rec: dict) -> str:
    """Mechanical conclusion from one query's sweep numbers.  The
    saturation signal is the BIG point's own partition sensitivity —
    NOT the r2 ratios, whose denominators (sub-second mid times) are
    overhead-sensitive and can swing the quotient without any big-
    point change (x78: mid 0.79s at 32 vs 2.5s at 8/128 partitions
    moved r2 between 1.3 and 4.7 while big varied only 1.3x)."""
    bigs = rec["big"]
    big32, big128 = bigs["32"], bigs["128"]
    spread = round(max(bigs.values()) / min(bigs.values()), 2)
    if big128 < (1.0 - SATURATION_DROP) * big32:
        return (
            "saturation (big point starved for partitions at 32: "
            f"{big32}s -> {big128}s at 128, {spread}x spread)"
        )
    return (
        "algorithmic (big-point time insensitive to partition count: "
        f"{spread}x spread across the sweep)"
    )


def main() -> None:
    spark = get_spark(app_name="scale_rootcause")
    spark.range(1).count()
    if not os.path.isdir(BIG):
        print(f"# building {BIG} (10x of {MID})", file=sys.stderr)
        from tools.make_scale_data import amplify

        amplify(spark, MID, BIG, 10)

    # codegen warm-up (identical generated classes regardless of path)
    for name in TARGETS:
        QUERIES[name].builder(spark, "/root/testdata/sf0.001").count()
    from kafka_spark_streaming_pipeline_spark.cache import unpersist_tracked

    unpersist_tracked()

    default_sp = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, dict] = {}
    for name in TARGETS:
        rec: dict[str, dict] = {"mid": {}, "big": {}}
        for sp in SWEEP:
            spark.conf.set("spark.sql.shuffle.partitions", str(sp))
            t_mid, _ = _best_of(spark, name, MID, REPEATS)
            t_big, _ = _best_of(spark, name, BIG, REPEATS)
            rec["mid"][str(sp)] = round(t_mid, 3)
            rec["big"][str(sp)] = round(t_big, 3)
            print(
                f"# {name} sp={sp}: mid={t_mid:.3f}s big={t_big:.3f}s "
                f"r2={t_big / t_mid:.2f}",
                file=sys.stderr,
            )
        spark.conf.set("spark.sql.shuffle.partitions", default_sp)
        r2 = {
            sp: round(rec["big"][sp] / rec["mid"][sp], 2)
            for sp in rec["big"]
        }
        big32, big128 = rec["big"]["32"], rec["big"]["128"]
        rec["r2_per_setting"] = r2
        rec["big_drop_32_to_128"] = round(1.0 - big128 / big32, 3)
        rec["verdict"] = _verdict(rec)
        results[name] = rec

    out = {
        "metric": "second_decade_rootcause_sweep",
        "sweep_shuffle_partitions": SWEEP,
        "repeats": REPEATS,
        "points": {"mid": 0.1, "big": "sf0.1 x10 amplified"},
        "saturation_criterion": (
            f"big time at 128 partitions < {1 - SATURATION_DROP:.2f} x "
            "big time at 32 partitions"
        ),
        "queries": results,
    }
    path = os.path.join(REPO, "SCALE_ROOTCAUSE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({n: r["verdict"] for n, r in results.items()}))


def remeasure_mid(name: str, repeats: int) -> None:
    """Re-measure ONE query's mid-point row across the sweep at
    higher repeats and merge it into the committed record (VERDICT
    r11 item 4: x78's repeats=3 mid row spread 3.2x — 2.28/0.79/2.55s
    across 8/32/128 — too noisy to support the entry's own verdict,
    which correctly leans on the stable big point only).  The big
    rows, the saturation verdict (a function of big alone), and every
    other query are untouched; only the mid row, the derived
    r2_per_setting quotients, and a provenance note change."""
    path = os.path.join(REPO, "SCALE_ROOTCAUSE.json")
    with open(path) as fh:
        data = json.load(fh)
    if name not in data["queries"]:
        raise SystemExit(f"unknown query in record: {name}")
    rec = data["queries"][name]

    spark = get_spark(app_name="scale_rootcause_mid")
    spark.range(1).count()
    QUERIES[name].builder(spark, "/root/testdata/sf0.001").count()
    from kafka_spark_streaming_pipeline_spark.cache import unpersist_tracked

    unpersist_tracked()

    default_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_mid = dict(rec["mid"])
    for sp in data["sweep_shuffle_partitions"]:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        t_mid, _ = _best_of(spark, name, MID, repeats)
        rec["mid"][str(sp)] = round(t_mid, 3)
        print(f"# {name} sp={sp}: mid={t_mid:.3f}s (was "
              f"{old_mid[str(sp)]}s at repeats={data['repeats']})",
              file=sys.stderr)
    spark.conf.set("spark.sql.shuffle.partitions", default_sp)
    rec["r2_per_setting"] = {
        sp: round(rec["big"][sp] / rec["mid"][sp], 2) for sp in rec["big"]
    }
    rec["mid_remeasure"] = {
        "repeats": repeats,
        "previous_mid": old_mid,
        "note": (
            "mid row re-measured at higher repeats (VERDICT r11 item "
            "4); big rows and verdict untouched — the verdict is a "
            "function of the big point's partition sensitivity only"
        ),
    }
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")
    print(json.dumps({name: rec["mid"], "r2": rec["r2_per_setting"]}))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--mid-only":
        if len(argv) not in (2, 4) or (len(argv) == 4 and argv[2] != "--repeats"):
            raise SystemExit(
                "usage: scale_rootcause.py --mid-only QUERY [--repeats N]"
            )
        remeasure_mid(argv[1], int(argv[3]) if len(argv) == 4 else 5)
    elif argv:
        raise SystemExit(f"unknown args: {argv}")
    else:
        main()
