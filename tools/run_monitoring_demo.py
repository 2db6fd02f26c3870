#!/usr/bin/env python3
"""Composed monitoring demo: THREE incrementally-maintained stores
serving ELEVEN detector/report views — the 'one rollup, many
detectors' architecture in one runnable script.

  events stream  -> hourly-count store   -> seasonal anomalies
                                          -> CUSUM level shifts
                                          -> robust (median/MAD) outliers
                                          -> Fano burstiness
                                          -> Mann-Kendall trend
                                          -> ACF periodicity
                                          -> Holt-Winters forecast
  document stream -> term-histogram store -> lexical diversity (TTR/hapax/Simpson)
                                          -> Zipf fit
                 -> length-histogram store -> pairwise KS drift
                                           -> PSI drift vs rest

Each store is a mergeable partial log with per-commit replay dedup and
online compaction; every view is BIT-EQUAL to its batch operator over
all ingested data (tested in tests/test_streaming.py) — this script
just shows them composed and prints what they flag.

    python3 tools/run_monitoring_demo.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.catalog import load_table  # noqa: E402
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402
from kafka_spark_streaming_pipeline_spark.streaming.sinks import (  # noqa: E402
    acf_view,
    compact_length_histogram,
    compact_seasonal,
    compact_term_histogram,
    cusum_view,
    dispersion_view,
    forecast_view,
    ks_view,
    lexical_view,
    make_length_histogram_sink,
    make_seasonal_sink,
    make_term_histogram_sink,
    psi_view,
    robust_view,
    seasonal_view,
    trend_view,
    zipf_view,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="monit_")
    spark = get_spark()

    hourly_path = os.path.join(work, "hourly")
    terms_path = os.path.join(work, "termhist")

    # ingest in three micro-batches each (foreachBatch-style callables —
    # the streaming tests drive the same sinks from a real readStream)
    events = load_table(spark, sf_dir, "events")
    ev_sink = make_seasonal_sink(hourly_path)
    for b in range(3):
        ev_sink(events.filter(F.col("event_id") % 3 == b), b)
    docs = load_table(spark, sf_dir, "documents")
    doc_sink = make_term_histogram_sink(terms_path)
    lens_path = os.path.join(work, "lenhist")
    len_sink = make_length_histogram_sink(lens_path)
    for b in range(3):
        doc_sink(docs.filter(F.col("doc_id") % 3 == b), b)
        len_sink(docs.filter(F.col("doc_id") % 3 == b), b)

    # online compaction under the (hypothetical) live stream
    compact_seasonal(spark, hourly_path, quiesced=False)
    compact_term_histogram(spark, terms_path, quiesced=False)
    compact_length_histogram(spark, lens_path, quiesced=False)

    print("== hourly-count store ->")
    seas = seasonal_view(spark, hourly_path).filter("abs(z_score) > 2.0")
    print(f"  seasonal anomalies: {seas.count()}")
    cs = cusum_view(spark, hourly_path).filter("shift_up OR shift_down")
    print(f"  CUSUM shift hours: {cs.count()}")
    rb = robust_view(spark, hourly_path).filter("is_outlier")
    print(f"  robust outliers: {rb.count()}")
    print("  burstiness (Fano) per type:")
    for r in dispersion_view(spark, hourly_path).orderBy("event_type").collect():
        flag = " <-- bursty" if r["overdispersed"] else ""
        print(f"    {r['event_type']:<12} fano={r['fano']:<10} {flag}")
    print("  Mann-Kendall trend + Holt-Winters next-hour forecast:")
    tr = {r["event_type"]: r for r in trend_view(spark, hourly_path).collect()}
    hw = {r["event_type"]: r for r in forecast_view(spark, hourly_path).collect()}
    for t in sorted(tr):
        print(
            f"    {t:<12} trend={tr[t]['trend']:<11} "
            f"sen={tr[t]['sen_slope']:<9} "
            f"next_hour={hw[t]['forecast_next']} (rmse {hw[t]['rmse']})"
        )
    daily = acf_view(spark, hourly_path).filter("lag_hours = 24")
    print(f"  types with daily-cycle ACF reported: {daily.count()}")

    print("== term-histogram store ->")
    lex = {r["source"]: r for r in lexical_view(spark, terms_path).collect()}
    zf = {r["source"]: r for r in zipf_view(spark, terms_path).collect()}
    for src in sorted(lex)[:5]:
        l, z = lex[src], zf[src]
        print(
            f"    {src:<8} ttr={l['type_token_ratio']:<9} "
            f"hapax={l['hapax_ratio']:<9} simpson={l['simpson']:<9} "
            f"zipf_slope={z['zipf_slope']}"
        )
    print(f"    ... {len(lex)} sources total")

    print("== length-histogram store ->")
    drift = ks_view(spark, lens_path).filter("drifted")
    print(f"  drifted source pairs (KS): {drift.count()}")
    psis = psi_view(spark, lens_path).filter("drifted")
    print(f"  drifted sources (PSI vs rest): {psis.count()}")

    if len(sys.argv) <= 2:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
