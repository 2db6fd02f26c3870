#!/usr/bin/env python3
"""Per-query time attribution for the optimization round: split each
headline query's bench time into (a) builder wall — driver-side plan
construction including any eager iterative actions (EM loops,
closures), (b) analysis+optimization wall — explainString(formatted)
on the built frame, and (c) execution wall — the noop write of an
already-built frame.  (a)+(c) approximates bench.py's _best_of timer;
(b) is contained in (c)'s first run but measured separately to show
whether Catalyst work or executor work dominates.

    python3 tools/profile_query.py [sf_dir] [query ...]

Best-of-3 per phase, caches released between queries (same discipline
as bench.py), one JSON line per query on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_spark_streaming_pipeline_spark.cache import (  # noqa: E402
    session_gc,
    unpersist_tracked,
)
from kafka_spark_streaming_pipeline_spark.plans import QUERIES  # noqa: E402
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402


def profile(spark, name: str, sf_dir: str, repeats: int = 3) -> dict:
    q = QUERIES[name]
    build = explain = execute = total = float("inf")
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    for _ in range(repeats):
        t0 = time.time()
        df = q.builder(spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().explainString(explain_mode.fromString("formatted"))
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        build = min(build, t1 - t0)
        explain = min(explain, t2 - t1)
        execute = min(execute, t3 - t2)
        total = min(total, (t1 - t0) + (t3 - t2))
    unpersist_tracked()
    session_gc(spark)
    return {
        "query": name,
        "build_sec": round(build, 3),
        "optimize_sec": round(explain, 3),
        "execute_sec": round(execute, 3),
        "bench_equiv_sec": round(total, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = get_spark(app_name="profile_query")
    spark.range(1).count()
    for name in names:
        print(json.dumps(profile(spark, name, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
