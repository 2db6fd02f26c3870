"""Hand-verifiable cases for the round-6 statistics family: KS length
drift, Heaps' law, Mann-Kendall trend, Markov transitions, chi-squared
independence, closed-form OLS, ACF, detector consensus, Holt-Winters,
PSI drift, and LSH calibration."""

from __future__ import annotations

import datetime as dt
import math


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")


def test_ks_drift_hand_case(spark):
    """A has lengths {1,1,2,2}, B {2,2,3,3}: the ECDF gap peaks at 0.5
    (at len 1 or 2).  C == A exactly: D = 0, p = 1, no drift."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import ks_drift

    def text(n):
        return " ".join(["w"] * n)

    rows = (
        [("A", i, text(l)) for i, l in enumerate([1, 1, 2, 2])]
        + [("B", 10 + i, text(l)) for i, l in enumerate([2, 2, 3, 3])]
        + [("C", 20 + i, text(l)) for i, l in enumerate([1, 1, 2, 2])]
    )
    out = {
        (r["source_a"], r["source_b"]): r for r in ks_drift(_docs(spark, rows)).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_a"] == 4 and ab["n_b"] == 4
    assert ab["ks_d"] == 0.5
    ac = out[("A", "C")]
    assert ac["ks_d"] == 0.0 and ac["p_value"] == 1.0 and not ac["drifted"]


def test_heaps_fit_all_distinct_is_linear(spark):
    """A corpus where every token is a new type has V(n) = n exactly at
    every checkpoint: beta = 1, K = 1, R^2 = 1."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import heaps_fit

    text = " ".join(f"t{i}" for i in range(200))
    out = heaps_fit(_docs(spark, [("lin", 1, text)])).collect()[0]
    assert out["n_tokens"] == 200
    assert out["n_checkpoints"] >= 7
    assert abs(out["heaps_beta"] - 1.0) < 1e-5
    assert abs(out["heaps_k"] - 1.0) < 1e-4
    assert abs(out["r_squared"] - 1.0) < 1e-5


def test_heaps_fit_degenerate_vocab_is_null(spark):
    """Two types -> two checkpoints -> below the 3-checkpoint floor."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import heaps_fit

    out = heaps_fit(_docs(spark, [("sat", 1, "a b a b a b a b")])).collect()[0]
    assert out["heaps_beta"] is None and out["r_squared"] is None


def test_mann_kendall_hand_case(spark):
    """Type 'up' has hourly counts 1,2,...,10 (every pairwise slope is
    exactly +1/hour): S = C(10,2) = 45, Sen's slope = 1, increasing.
    Type 'const' is 2/hour flat: S = 0, all-tied variance = 0, flat."""
    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        mann_kendall_trend,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(10):
        for _ in range(h + 1):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=5), "up"))
            eid += 1
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=7), "const"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    )
    out = {r["event_type"]: r for r in mann_kendall_trend(events).collect()}
    up = out["up"]
    assert up["n_hours"] == 10 and up["s_stat"] == 45
    # no ties: var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125
    assert up["var_s"] == 125.0
    assert abs(up["z"] - 44 / math.sqrt(125)) < 1e-3
    assert up["trend"] == "increasing"
    assert up["sen_slope"] == 1.0
    const = out["const"]
    assert const["s_stat"] == 0 and const["var_s"] == 0.0
    assert const["trend"] == "flat"


def test_event_transitions_hand_case(spark):
    """From A: 3 of 4 transitions go to B, 1 to C -> probs .75/.25 and
    row entropy -(3/4 lg 3/4 + 1/4 lg 1/4) ~ 0.811278 bits."""
    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        event_transitions,
    )

    base = dt.datetime(2024, 1, 1)
    seqs = {1: ["A", "B", "A", "B"], 2: ["A", "B"], 3: ["A", "C"]}
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for i, t in enumerate(seq):
            rows.append((eid, base + dt.timedelta(minutes=i), u, t))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = {
        (r["prev_type"], r["next_type"]): r for r in event_transitions(events).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_trans"] == 3 and ab["prob"] == 0.75
    want_h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(ab["row_entropy_bits"] - want_h) < 1e-5
    ba = out[("B", "A")]
    assert ba["n_trans"] == 1 and ba["prob"] == 1.0
    assert ba["row_entropy_bits"] == 0.0


def test_chi2_independence_extremes(spark):
    """A perfectly proportional table has chi2 = 0; a perfectly
    diagonal one has chi2 = N and Cramer's V = 1."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        chi2_independence,
    )

    indep = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 40
    )
    df = spark.createDataFrame(indep, "rv STRING, cv STRING")
    r = chi2_independence(df, "rv", "cv", crit=3.841).collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0 and not r["dependent"]

    diag = [("r1", "c1")] * 10 + [("r2", "c2")] * 10
    df2 = spark.createDataFrame(diag, "rv STRING, cv STRING")
    r2 = chi2_independence(df2, "rv", "cv", crit=3.841).collect()[0]
    assert r2["chi2"] == 20.0 and r2["cramers_v"] == 1.0 and r2["dependent"]
    assert r2["dof"] == 1


def test_chi2_default_crit_tracks_actual_dof(spark):
    """crit=None derives the 0.05 critical value from the table's
    ACTUAL dof (Wilson-Hilferty): a 2x2 diagonal with chi2 = 20 is
    dependent at dof 1 (crit ~3.8), while the same chi2 on a wide
    table with dof 30 (crit ~43.8) is NOT — a fixed 12-dof default
    would flag it as a false positive."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        chi2_independence,
    )

    diag = [("r1", "c1")] * 10 + [("r2", "c2")] * 10
    df = spark.createDataFrame(diag, "rv STRING, cv STRING")
    r = chi2_independence(df, "rv", "cv").collect()[0]
    assert r["dof"] == 1 and r["chi2"] == 20.0 and r["dependent"]

    # 2 balanced obs in every cell of a 4x11 grid (dof 30): chi2 = 0,
    # then one extra obs in one cell nudges chi2 well under crit ~43.8
    wide = [(f"r{i}", f"c{j}") for i in range(4) for j in range(11)] * 2
    wide.append(("r0", "c0"))
    df2 = spark.createDataFrame(wide, "rv STRING, cv STRING")
    r2 = chi2_independence(df2, "rv", "cv").collect()[0]
    assert r2["dof"] == 30 and not r2["dependent"]


def test_ols2_fit_recovers_exact_plane(spark):
    """Noise-free y = 2 + 3 x1 + 5 x2 is recovered exactly with
    R^2 = 1; a collinear design (x2 = 2 x1) reports NULLs."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import ols2_fit

    pts = [(1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (3.0, 5.0), (4.0, 2.0), (2.0, 7.0)]
    rows = [("g", x1, x2, 2.0 + 3.0 * x1 + 5.0 * x2) for x1, x2 in pts]
    df = spark.createDataFrame(rows, "grp STRING, x1 DOUBLE, x2 DOUBLE, y DOUBLE")
    r = ols2_fit(df, "y", "x1", "x2", "grp").collect()[0]
    assert abs(r["b0"] - 2.0) < 1e-3
    assert abs(r["b1"] - 3.0) < 1e-3
    assert abs(r["b2"] - 5.0) < 1e-3
    assert abs(r["r_squared"] - 1.0) < 1e-6

    rows2 = [("g", x, 2.0 * x, 1.0 + x) for x in (1.0, 2.0, 3.0, 4.0)]
    df2 = spark.createDataFrame(rows2, "grp STRING, x1 DOUBLE, x2 DOUBLE, y DOUBLE")
    r2 = ols2_fit(df2, "y", "x1", "x2", "grp").collect()[0]
    assert r2["b1"] is None and r2["r_squared"] is None


def test_acf_survives_counts_that_overflow_int64_products(spark):
    """An alternating high-rate series (cnt ~2e6 over 2,400 hours)
    pushes sx*sx past int64 (~2.3e19 > 9.2e18); the double-precision
    moment products must still recover ACF(lag 1) = -1 exactly
    (x_{t+1} is a negative-slope linear function of x_t)."""
    import datetime as dt

    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        acf_from_dense,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=h), "hot", 2_000_000 + (h % 2))
        for h in range(2400)
    ]
    dense = spark.createDataFrame(rows, "h TIMESTAMP, t STRING, cnt LONG")
    out = {
        r["lag_hours"]: r["acf"]
        for r in acf_from_dense(dense, max_lag_hours=2).collect()
    }
    # the decimal moments are EXACT, so the linear relationship gives
    # r = -1 / +1 exactly (the double-product version reported -1.0028)
    assert out[1] == -1.0
    assert out[2] == 1.0


def test_autocorrelation_periodic_series(spark):
    """Counts alternating 0,10,0,10,... have ACF(-1) at lag 1 and
    ACF(+1) at lag 2 — the exact signature of a 2-hour cycle."""
    import datetime as dt

    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        autocorrelation,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        n = 10 if h % 2 else 0
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), "alt"))
            eid += 1
    # anchor hour 0 so the dense grid spans all 24 hours
    rows.append((eid, base + dt.timedelta(minutes=2), "anchor"))
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    )
    out = {
        (r["event_type"], r["lag_hours"]): r["acf"]
        for r in autocorrelation(events, max_lag_hours=3).collect()
    }
    assert out[("alt", 1)] == -1.0
    assert out[("alt", 2)] == 1.0
    assert out[("alt", 3)] == -1.0


def test_detector_consensus_planted_spike(spark):
    """A 200x spike in an otherwise steady series must be flagged by
    BOTH the seasonal and robust detectors (consensus true); steady
    hours have n_flags == 0; the per-type context columns agree with
    the standalone operators."""
    import datetime as dt

    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        detector_consensus,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(4):
        for h in range(24):
            n = 200 if (d == 3 and h == 12) else 2
            for _ in range(n):
                rows.append(
                    (eid, base + dt.timedelta(days=d, hours=h, minutes=3), "svc")
                )
                eid += 1
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    )
    out = {
        (r["event_type"], r["hour"]): r for r in detector_consensus(events).collect()
    }
    spike = out[("svc", base + dt.timedelta(days=3, hours=12))]
    assert spike["n_flags"] >= 2 and spike["consensus"]
    assert abs(spike["robust_z"]) > 3.5
    quiet = out[("svc", base + dt.timedelta(days=1, hours=3))]
    assert quiet["n_flags"] == 0 and not quiet["consensus"]
    assert quiet["trend"] in ("no trend", "flat", "increasing")


def test_sole_late_supplier_hand_case(spark, sf_dir):
    """Registry q47 on a hand-built scenario: supplier 1 is the sole
    late shipper on a 2-supplier order (counts), supplier 2 is late on
    a SINGLE-supplier order (no other supplier exists -> excluded),
    and order 3 has TWO late suppliers (both excluded)."""
    import datetime as dt

    from kafka_spark_streaming_pipeline_spark.plans.registry import QUERIES

    # build tiny tables in a temp dir shaped like the catalog
    import os
    import tempfile

    d = tempfile.mkdtemp()
    day = dt.datetime(2024, 1, 1)
    late = day + dt.timedelta(days=90)
    ontime = day + dt.timedelta(days=10)
    li_rows = [
        (100, 1, late), (100, 2, ontime),     # s1 sole late on order 100
        (200, 2, late),                        # single-supplier order
        (300, 3, late), (300, 4, late),        # two late suppliers
    ]
    spark.createDataFrame(
        [(ok, sk, sd) for ok, sk, sd in li_rows],
        "l_orderkey BIGINT, l_suppkey BIGINT, l_shipdate TIMESTAMP",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(100, day), (200, day), (300, day)],
        "o_orderkey BIGINT, o_orderdate TIMESTAMP",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(k, f"S{k}") for k in (1, 2, 3, 4)],
        "s_suppkey BIGINT, s_name STRING",
    ).write.parquet(os.path.join(d, "supplier.parquet"))
    out = QUERIES["q47_sole_late_supplier"].builder(spark, d).collect()
    assert [(r["s_name"], r["numwait"]) for r in out] == [("S1", 1)]


def test_holt_winters_matches_python_reference(spark):
    """The codegen array fold reproduces an independently-written
    Python Holt-Winters to 4dp on a seasonal+ramp series, and a
    series shorter than two seasons reports NULL fits."""
    import datetime as dt
    import math

    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        holt_winters,
    )

    base = dt.datetime(2024, 1, 1)
    pattern = [2, 8, 4, 6]
    rows, vals, eid = [], [], 0
    for h in range(20):
        n = pattern[h % 4] + h // 4
        vals.append(n)
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), "svc"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    )
    out = {r["event_type"]: r for r in holt_winters(events, season=4).collect()}

    a, b, g = 0.3, 0.1, 0.2
    ca, cb, cg = 0.7, 0.9, 0.8
    m = 4
    L = sum(vals[:m]) / float(m)
    B = (sum(vals[m : 2 * m]) / float(m) - L) / float(m)
    S = [v - L for v in vals[:m]]
    sse = 0.0
    for i in range(m, len(vals)):
        x = float(vals[i])
        pos = i % m
        stm = S[pos]
        err = x - (L + B + stm)
        sse += err * err
        nl = a * (x - stm) + ca * (L + B)
        nb = b * (nl - L) + cb * B
        ns = g * (x - nl) + cg * stm
        L, B, S[pos] = nl, nb, ns
    svc = out["svc"]
    assert svc["level"] == round(L + 1e-9, 4)
    assert svc["trend"] == round(B + 1e-9, 4)
    assert svc["forecast_next"] == round(L + B + S[len(vals) % m] + 1e-9, 4)
    assert svc["rmse"] == round(math.sqrt(sse / (len(vals) - m)) + 1e-9, 4)

    short = spark.createDataFrame(
        rows[:5], "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    )
    sr = holt_winters(short, season=4).collect()[0]
    assert sr["level"] is None and sr["rmse"] is None


def test_length_psi_hand_case(spark):
    """PSI replicates the hand formula: A and C share one length bin,
    B sits alone in another — B's mass is maximally displaced from the
    rest, so psi_B > psi_A = psi_C (identical profiles score equal)."""
    import math

    from kafka_spark_streaming_pipeline_spark.operators.curation import length_psi

    def text(n):
        return " ".join(["w"] * n)

    # A mirrors the majority's 50/50 length mix -> stable; C's mass
    # sits entirely in one bin -> drifted
    rows = (
        [("A", i, text(4)) for i in range(5)]
        + [("A", 10 + i, text(16)) for i in range(5)]
        + [("B", 100 + i, text(4)) for i in range(20)]
        + [("B", 150 + i, text(16)) for i in range(20)]
        + [("C", 200 + i, text(16)) for i in range(10)]
    )
    out = {r["source"]: r for r in length_psi(_docs(spark, rows)).collect()}
    assert not out["A"]["drifted"]
    assert out["C"]["drifted"] and out["C"]["psi"] > out["A"]["psi"]

    # replicate C's score by hand: len 4 -> bit-length bin 2, len 16
    # -> bin 4; totals bin2 = 25, bin4 = 35; C holds 10 docs in bin4
    def psi(in_counts, src_n, all_counts, tot_n, n_bins, sm=0.5):
        total = 0.0
        for b in sorted(all_counts):
            n_in = in_counts.get(b, 0)
            p = (n_in + sm) / (src_n + sm * n_bins)
            q = (all_counts[b] - n_in + sm) / (tot_n - src_n + sm * n_bins)
            total += math.trunc((p - q) * math.log(p / q) * 1e12)
        return round(total / 1e12 + 1e-9, 6)

    want_c = psi({4: 10}, 10, {2: 25, 4: 35}, 60, 2)
    assert out["C"]["psi"] == want_c


def test_lsh_calibration_identical_docs(spark):
    """Identical docs estimate AND verify at Jaccard 1.0 -> the top
    level reports mean_exact 1.0 with zero error; unrelated docs that
    collide in a band land at low levels with low exact Jaccard."""
    from kafka_spark_streaming_pipeline_spark.operators.dedup import lsh_calibration

    t = "the quick brown fox jumps over the lazy dog again and again"
    rows = [("s", 1, t), ("s", 2, t)] + [
        ("s", 10 + i, f"doc {i} unique words body " + " ".join(f"w{i}{j}" for j in range(8)))
        for i in range(4)
    ]
    out = {r["est_jaccard"]: r for r in lsh_calibration(_docs(spark, rows)).collect()}
    top = out[1.0]
    assert top["n_pairs"] >= 1
    assert top["mean_exact_jaccard"] == 1.0
    assert top["mean_abs_err"] == 0.0


def test_session_ngrams_hand_case(spark):
    """'A B C' appears in 2 of 3 sessions (twice within one session
    counts once); a 2-event session contributes no trigram but still
    counts in the support denominator."""
    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        session_ngrams,
    )

    base = dt.datetime(2024, 1, 1)
    seqs = {1: list("ABCABC"), 2: list("ABC"), 3: list("XY")}
    rows, eid = [], 0
    for u, seq in seqs.items():
        for i, t in enumerate(seq):
            rows.append((eid, base + dt.timedelta(minutes=i), u, t))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = {r["ngram"]: r for r in session_ngrams(events).collect()}
    abc = out["A B C"]
    assert abc["n_sessions"] == 2 and abc["rank"] == 1
    assert abc["support"] == round(2 / 3 + 1e-9, 6)
    assert out["B C A"]["n_sessions"] == 1


def test_session_ngrams_without_event_id(spark):
    """Frames without event_id follow sessionize's degradation
    convention (ts-only ordering) instead of failing analysis."""
    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        session_ngrams,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=i), 1, t) for i, t in enumerate("ABCD")
    ]
    events = spark.createDataFrame(
        rows, "ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = {r["ngram"]: r for r in session_ngrams(events).collect()}
    assert out["A B C"]["n_sessions"] == 1
    assert out["B C D"]["n_sessions"] == 1


def test_hill_tail_index_hand_case(spark):
    """Counts 61-i for ranks i=1..60 give a hand-computable Hill
    alpha; a small vocabulary reports NULL."""
    import math

    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        hill_tail_index,
    )

    toks = []
    for i in range(1, 61):
        toks += [f"t{i:02d}"] * (61 - i)
    rows = [("big", 1, " ".join(toks)), ("small", 2, "a b c")]
    out = {r["source"]: r for r in hill_tail_index(_docs(spark, rows)).collect()}
    big = out["big"]
    assert big["k"] == 50 and big["f_kplus1"] == 10
    lsum = sum(math.trunc(math.log((61 - i) / 10.0) * 1e6) for i in range(1, 51))
    mean_l = lsum / 1e6 / 50
    assert big["hill_alpha"] == round(1.0 / mean_l + 1e-9, 4)
    assert out["small"]["hill_alpha"] is None


def test_active_users_hand_case(spark):
    """Day 9: only u3 is daily-active, weekly window misses days 1-2,
    monthly window sees all three users -> stickiness 1/3."""
    from kafka_spark_streaming_pipeline_spark.operators.timeseries import (
        active_users,
    )

    base = dt.datetime(2024, 1, 1, 10)
    rows = [
        (1, base, 1), (2, base, 2),                       # day 1: u1, u2
        (3, base + dt.timedelta(days=1), 1),              # day 2: u1
        (4, base + dt.timedelta(days=8), 3),              # day 9: u3
    ]
    events = spark.createDataFrame(
        [(e, t, u) for e, t, u in rows],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT",
    )
    out = {r["day"].day: r for r in active_users(events).collect()}
    assert len(out) == 9
    d1 = out[1]
    assert d1["dau"] == 2 and d1["wau"] == 2 and d1["mau"] == 2
    assert d1["stickiness"] == 1.0
    d9 = out[9]
    assert d9["dau"] == 1 and d9["wau"] == 1 and d9["mau"] == 3
    assert d9["stickiness"] == round(1 / 3 + 1e-9, 4)
    d5 = out[5]
    assert d5["dau"] == 0 and d5["mau"] == 2 and d5["stickiness"] == 0.0


def test_bloom_fpr_audit_invariants(spark):
    """Members are NEVER missed (no false negatives) and the observed
    FPR on disjoint probes stays within a sane factor of theoretical
    at this sizing."""
    from kafka_spark_streaming_pipeline_spark.operators.sketches import (
        bloom_fpr_audit,
    )

    build = spark.createDataFrame([(f"in{i}",) for i in range(500)], "v STRING")
    probe = spark.createDataFrame(
        [(f"in{i}",) for i in range(500)] + [(f"out{i}",) for i in range(2000)],
        "v STRING",
    )
    r = bloom_fpr_audit(build, probe, "v").collect()[0]
    assert r["n_inserted"] == 500 and r["n_probes"] == 2500
    assert r["n_members"] == 500 and r["n_missed_members"] == 0
    assert r["n_true_neg"] == 2000
    # 500 keys in 65536 bits, k=4: theoretical FPR ~ 8.6e-7 — the
    # observed count over 2000 true negatives is almost surely 0
    assert r["observed_fpr"] <= 0.01
    assert 0.0 <= r["theoretical_fpr"] < 0.001


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )


def test_embedding_health_dead_dimension(spark):
    """A dimension that is identically zero is dead; a live dimension
    reports its exact mean/std."""
    from kafka_spark_streaming_pipeline_spark.operators.embed import (
        embedding_health,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [3.0, 0.0], 0),
        (3, [5.0, 0.0], 0),
    ]
    out = {r["dim"]: r for r in embedding_health(_vecs(spark, rows)).collect()}
    d1 = out[1]
    assert d1["mean"] == 3.0 and not d1["is_dead"]
    import math
    assert abs(d1["std"] - math.sqrt(8 / 3)) < 1e-5
    d2 = out[2]
    assert d2["is_dead"] and d2["near_zero_frac"] == 1.0 and d2["std"] == 0.0


def test_fisher_separation_orders_pairs(spark):
    """Labels separated along a dimension get a much larger Fisher J
    than overlapping ones, and the zero-variance cap keeps perfectly
    separated clusters finite."""
    from kafka_spark_streaming_pipeline_spark.operators.embed import (
        fisher_separation,
    )

    rows = (
        [(i, [0.0 + 0.1 * i, 1.0], 0) for i in range(4)]
        + [(10 + i, [10.0 + 0.1 * i, 1.0], 1) for i in range(4)]
        + [(20 + i, [0.05 + 0.1 * i, 1.0], 2) for i in range(4)]
    )
    out = {
        (r["label_a"], r["label_b"]): r
        for r in fisher_separation(_vecs(spark, rows)).collect()
    }
    far = out[(0, 1)]["fisher_j"]
    near = out[(0, 2)]["fisher_j"]
    assert far > 100 * near
    # dim 2 is constant for every label -> capped, not overflowed
    assert all(r["fisher_j"] <= 2e6 for r in out.values())


def test_knn_label_agreement_clusters(spark):
    """Two tight clusters with consistent labels agree at 1.0; an
    adversarially mislabeled vector drags only its own label down."""
    from kafka_spark_streaming_pipeline_spark.operators.similarity import (
        knn_label_agreement,
    )

    rows = (
        [(i, [1.0, 0.01 * i], 0) for i in range(3)]
        + [(3 + i, [-1.0, 0.01 * i], 1) for i in range(3)]
    )
    out = {r["label"]: r for r in knn_label_agreement(_vecs(spark, rows), n_queries=10).collect()}
    assert out[0]["agreement"] == 1.0 and out[1]["agreement"] == 1.0
    assert out[0]["n_queries"] == 3 and out[1]["n_queries"] == 3


def _lang_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_nb_classifier_learns_planted_vocab(spark):
    """Disjoint class vocabularies are perfectly separable; an all-OOV
    document falls back to the majority-prior label."""
    from kafka_spark_streaming_pipeline_spark.operators.classify import (
        nb_confusion,
        nb_score,
        nb_train,
    )

    rows = []
    for i in range(8):  # 'a' docs out-number 'b' docs 2:1 in training
        rows.append((2 * i, "alpha apple axe alpha", "a"))
    for i in range(4):
        rows.append((100 + 2 * i, "beta bolt bus beta", "b"))
    # odd ids = test split
    rows += [
        (1, "alpha axe apple", "a"),
        (3, "beta bus bolt", "b"),
        (5, "alpha alpha bolt", "a"),
        (7, "zzz qqq www", "b"),  # all OOV -> prior-only -> majority 'a'
    ]
    docs = _lang_docs(spark, rows)
    conf = {
        (r["label"], r["predicted"]): r["n_docs"]
        for r in nb_confusion(docs, label_col="lang").collect()
    }
    assert conf[("a", "a")] == 2
    assert conf[("b", "b")] == 1
    assert conf[("b", "a")] == 1  # the OOV doc took the prior fallback
    # score surface: the OOV doc carries a NULL score_q (no evidence)
    model = nb_train(docs.filter("doc_id % 2 = 0"), label_col="lang")
    preds = {
        r["doc_id"]: r
        for r in nb_score(docs.filter("doc_id % 2 = 1"), model).collect()
    }
    assert preds[7]["predicted"] == "a" and preds[7]["score_q"] is None
    assert preds[1]["predicted"] == "a" and preds[1]["score_q"] is not None


def test_nb_model_shape_and_priors(spark):
    """The dense model covers every (vocab token, label) pair exactly
    once, and priors reflect the doc-count ratio."""
    import math

    from kafka_spark_streaming_pipeline_spark.operators.classify import nb_train

    docs = _lang_docs(
        spark,
        [(0, "x y", "a"), (2, "y z", "a"), (4, "z w", "b")],
    )
    m = nb_train(docs, label_col="lang").collect()
    assert len(m) == 4 * 2  # |V|=4 tokens x |L|=2 labels
    by = {(r["label"], r["tok"]): r for r in m}
    assert by[("a", "x")]["prior_q"] == int(math.log(2 / 3) * 1e6)
    assert by[("b", "x")]["prior_q"] == int(math.log(1 / 3) * 1e6)
    # 'x' unseen under 'b': smoothed zero-count likelihood
    assert by[("b", "x")]["qll"] == int(math.log(0.5 / (2 + 0.5 * 4)) * 1e6)
    assert by[("a", "y")]["qll"] == int(math.log(2.5 / (4 + 0.5 * 4)) * 1e6)


def test_k_anonymity_audit_planted(spark):
    """A singleton QI class is risky at every k; the big class only
    below its size; l-diversity reports the worst at-risk class."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        k_anonymity_audit,
    )

    rows = [("a", 1, "s1")] + [("b", 1, f"s{i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, "lang STRING, len_bucket INT, src STRING")
    out = {
        r["k"]: r
        for r in k_anonymity_audit(df, ["lang", "len_bucket"], "src").collect()
    }
    assert out[2]["n_risky_classes"] == 1 and out[2]["n_risky_rows"] == 1
    assert out[2]["min_l_div_at_risk"] == 1  # the singleton has 1 source
    assert out[25]["n_risky_classes"] == 2 and out[25]["n_risky_rows"] == 7
    assert out[25]["risky_row_frac"] == 1.0
    assert out[5]["n_risky_rows"] == 1 and out[10]["n_risky_rows"] == 7
    assert out[2]["n_classes"] == 2 and out[2]["n_rows"] == 7


def test_welch_pairs_known_values(spark):
    """Hand-checked Welch t / df / Cohen's d on two small groups, and
    a shifted group flags while an identical one does not."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import welch_pairs

    rows = (
        [("a", v) for v in (10, 12, 14, 16)]  # m=13, s2=20/3
        + [("b", v) for v in (30, 34, 38, 42)]  # m=36, s2=80/3
        + [("c", v) for v in (10, 12, 14, 16)]  # == a
    )
    df = spark.createDataFrame(rows, "g STRING, v INT")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in welch_pairs(df, "g", "v").collect()
    }
    ab = out[("a", "b")]
    import math

    se = math.sqrt(20 / 3 / 4 + 80 / 3 / 4)
    assert abs(ab["t_stat"] - round(-23 / se, 4)) < 1e-9
    assert ab["z_flag"]
    pooled = math.sqrt((3 * 20 / 3 + 3 * 80 / 3) / 6)
    assert abs(ab["cohens_d"] - round(-23 / pooled, 4)) < 1e-9
    ac = out[("a", "c")]
    assert ac["t_stat"] == 0.0 and not ac["z_flag"]


def test_nb_calibration_buckets_margin_and_fallback(spark):
    """Disjoint-vocabulary classes give confidently-correct buckets; an
    all-OOV document lands in the -1 (prior-only) bucket and is scored
    against the truth like any other prediction."""
    from kafka_spark_streaming_pipeline_spark.operators.classify import (
        nb_calibration,
    )

    rows = []
    for i in range(4):  # even ids = train
        rows.append((2 * i, "alpha apple axe", "a"))
    for i in range(2):
        rows.append((100 + 2 * i, "beta bolt bus", "b"))
    rows += [
        (1, "alpha apple axe", "a"),   # strong margin, correct
        (3, "beta bolt bus", "b"),     # strong margin, correct
        (5, "zzz qqq www", "b"),       # all OOV -> prior-only 'a' -> wrong
    ]
    docs = _lang_docs(spark, rows)
    out = {r["margin_bucket"]: r for r in nb_calibration(docs).collect()}
    fb = out[-1]
    assert fb["n_docs"] == 1 and fb["n_correct"] == 0 and fb["accuracy"] == 0.0
    scored = {b: r for b, r in out.items() if b >= 0}
    assert sum(r["n_docs"] for r in scored.values()) == 2
    assert all(r["accuracy"] == 1.0 for r in scored.values())
    assert all(b >= 1 for b in scored)  # disjoint vocab -> real margin


def test_tokenizer_fertility_hand_case(spark):
    """'ab cd' -> 2 words / 2 sub-tokens (fertility 1); 'a-b c!d' ->
    2 words / 6 sub-tokens (letter runs split on punctuation,
    fertility 3).  Corpus-level ratios divide exact sums."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(0, "ab cd", "en"), (1, "a-b c!d", "xx"), (2, "a-b c!d", "xx")],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(docs).collect()}
    en = out["en"]
    assert en["n_words"] == 2 and en["n_tokens"] == 2
    assert en["fertility"] == 1.0
    xx = out["xx"]
    # per doc: words 'a-b','c!d' = 2; sub-tokens a,-,b + c,!,d = 6
    assert xx["n_docs"] == 2 and xx["n_words"] == 4 and xx["n_tokens"] == 12
    assert xx["fertility"] == 3.0
    assert xx["chars_per_word"] == round(14 / 4 + 1e-9, 6)


def test_t_closeness_hand_case(spark):
    """Hand arithmetic: two QI classes against a 50/50 global source
    mix — the skewed class (3:1) has TVD 0.25, the balanced one 0."""
    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        t_closeness_audit,
    )

    rows = (
        [("a", 0, "s1")] * 3 + [("a", 0, "s2")] * 1
        + [("b", 0, "s1")] * 1 + [("b", 0, "s2")] * 3
        + [("c", 0, "s1")] * 2 + [("c", 0, "s2")] * 2
    )
    df = spark.createDataFrame(rows, "lang string, len_bucket long, source string")
    out = {
        r.t: (r.n_classes, r.n_classes_over, r.n_rows_over, r.max_tvd)
        for r in t_closeness_audit(
            df, ["lang", "len_bucket"], "source", t_ppm=(100_000, 300_000)
        ).collect()
    }
    # global: s1 6/12, s2 6/12.  class a: (3/4, 1/4) -> TVD 0.25;
    # class b symmetric 0.25; class c: (1/2, 1/2) -> 0.
    assert out[0.1] == (3, 2, 8, 0.25)
    assert out[0.3] == (3, 0, 0, 0.25)
