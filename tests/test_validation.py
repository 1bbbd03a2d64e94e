"""Validation-suite operator tests: ground-truth diff, overlap recall,
proximity matching."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import Row

from datamine_v2_0_spark.operators.validation import (
    ground_truth_diff,
    overlap_recall,
    proximity_match,
)

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _t(s):
    return T0 + timedelta(seconds=s)


def test_ground_truth_diff(spark):
    pred = spark.createDataFrame(
        [Row(dev="a", ts=_t(0), pred="load"), Row(dev="a", ts=_t(1), pred="dump"),
         Row(dev="a", ts=_t(2), pred="load"), Row(dev="a", ts=_t(9), pred="x")]
    )
    truth = spark.createDataFrame(
        [Row(dev="a", ts=_t(0), actual="load"), Row(dev="a", ts=_t(1), actual="load"),
         Row(dev="a", ts=_t(2), actual="load")]
    )
    got = {(r["predicted"], r["actual"]): (r["n"], r["match"])
           for r in ground_truth_diff(pred, truth, ["dev", "ts"], "pred", "actual").collect()}
    assert got[("load", "load")] == (2, True)
    assert got[("dump", "load")] == (1, False)
    assert ("x", None) not in got  # unmatched rows excluded by inner join


def test_overlap_recall(spark):
    truth = spark.createDataFrame(
        [Row(gid=1, dev="a", s=_t(0), e=_t(10)),
         Row(gid=2, dev="a", s=_t(100), e=_t(110)),
         Row(gid=3, dev="b", s=_t(0), e=_t(10))]
    )
    det = spark.createDataFrame(
        [Row(ddev="a", ds=_t(8), de=_t(12)),     # overlaps gid 1
         Row(ddev="a", ds=_t(50), de=_t(60)),    # overlaps nothing
         Row(ddev="b", ds=_t(200), de=_t(210))]  # wrong window
    )
    r = overlap_recall(
        truth, det, "gid", [("dev", "ddev")], "s", "e", "ds", "de"
    ).first()
    assert (r["n_truth"], r["n_detected"]) == (3, 1)
    assert r["recall"] == pytest.approx(1 / 3)


def test_proximity_match(spark):
    truth = spark.createDataFrame(
        [Row(gid=1, dev="a", ts=_t(60)), Row(gid=2, dev="a", ts=_t(1000))]
    )
    cands = spark.createDataFrame(
        [Row(cdev="a", cts=_t(50)), Row(cdev="a", cts=_t(65)),
         Row(cdev="a", cts=_t(5000))]
    )
    got = {r["gid"]: r for r in proximity_match(
        truth, cands, [("dev", "cdev")], "ts", "cts", 120.0, "gid"
    ).collect()}
    assert got[1]["cts"].replace(tzinfo=timezone.utc) == _t(65)   # nearest within ±120s
    assert got[2]["cts"] is None                                  # no candidate in range


def test_integrity_report_full_bundle(spark):
    """The reference's post-load check bundle: count, PK uniqueness,
    null criticals, time range (05_load_candidates_to_db.py:197-259)."""
    from datetime import datetime, timezone

    from datamine_v2_0_spark.operators.aggregates import integrity_report

    t = lambda s: datetime(2025, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [(1, "a", t(0)), (2, None, t(30)), (2, "c", t(10))],
        "k long, v string, ts timestamp",
    )
    r = integrity_report(df, "k", ["v"], ts_col="ts").first()
    assert r["row_count"] == 3
    assert r["distinct_keys"] == 2       # duplicate PK surfaces here
    assert r["null_v"] == 1
    assert r["time_min"] == t(0).replace(tzinfo=None)
    assert r["time_max"] == t(30).replace(tzinfo=None)


def test_label_windows_grouping(spark):
    """Consecutive same-label events merge while the gap stays under the
    max; a label change OR an oversize gap opens a new window (the
    archived visual validator's grouping rules)."""
    from datetime import datetime, timezone

    from datamine_v2_0_spark.operators.validation import label_windows

    t = lambda s: datetime(2025, 1, 1, 0, 0, 0, tzinfo=timezone.utc).replace(
        second=s % 60, minute=s // 60
    )
    rows = [
        ("d1", t(0), "load", 1),
        ("d1", t(30), "load", 2),     # 30s gap, same label -> extends
        ("d1", t(120), "load", 3),    # 90s gap > 60 -> new window
        ("d1", t(150), "dump", 4),    # label change -> new window
        ("d2", t(0), "load", 5),      # other key, own windows
    ]
    df = spark.createDataFrame(
        rows, "device string, ts timestamp, label string, eid long"
    )
    out = {
        (r["device"], r["label"], r["n_events"]): (r["win_start"], r["win_end"])
        for r in label_windows(
            df, ["device"], "ts", "label", 60.0, tiebreak="eid"
        ).collect()
    }
    naive = lambda s: t(s).replace(tzinfo=None)
    assert out[("d1", "load", 2)] == (naive(0), naive(30))
    assert out[("d1", "load", 1)] == (naive(120), naive(120))
    assert out[("d1", "dump", 1)] == (naive(150), naive(150))
    assert out[("d2", "load", 1)] == (naive(0), naive(0))


def test_candidate_clustering_counts(spark):
    """Hand-built fixture: 3 truth windows, candidates inside / near /
    far — the summary must match the reference's per-window counting
    (a candidate near two windows counts toward each)."""
    from datetime import datetime, timezone

    from datamine_v2_0_spark.operators.validation import candidate_clustering

    ts = lambda m: datetime(2025, 1, 1, 0, m, 0, tzinfo=timezone.utc)
    truth = spark.createDataFrame(
        [("d1", ts(10), ts(20)), ("d1", ts(40), ts(50)), ("d2", ts(0), ts(5))],
        "device string, ws timestamp, we timestamp",
    )
    cands = spark.createDataFrame(
        [
            ("d1", ts(15)),  # inside window 1
            ("d1", ts(21)),  # near window 1 (within 2 min), not inside
            ("d1", ts(30)),  # >2min from both d1 windows -> nowhere
            ("d2", ts(59)),  # far from d2's window
        ],
        "device string, cts timestamp",
    )
    r = candidate_clustering(
        truth, cands, [("device", "device")], "ws", "we", "cts", 120.0
    ).first()
    assert r["total_candidates"] == 4
    assert r["total_truth_windows"] == 3
    assert r["candidates_in_windows"] == 1
    assert r["candidates_near_windows"] == 2
    assert r["empty_windows"] == 2
    assert abs(r["window_hit_rate"] - 100.0 / 3) < 0.01


def test_candidate_signal_context_exact(spark):
    """Before/after stats computed by hand: exclusive frames (the signal
    row AT the candidate timestamp belongs to neither side), NULL std for
    single-sample frames, NULL snr when pooled std is NULL."""
    from datetime import datetime, timezone

    from datamine_v2_0_spark.operators.validation import (
        candidate_signal_context,
    )

    ts = lambda s: datetime(2025, 1, 1, 0, 0, 0, tzinfo=timezone.utc).replace(
        minute=s // 60, second=s % 60
    )
    signal = spark.createDataFrame(
        [
            ("d1", ts(0), 10.0),
            ("d1", ts(50), 20.0),
            ("d1", ts(100), 99.0),   # exactly at candidate ts -> excluded
            ("d1", ts(150), 40.0),
            ("d1", ts(200), 60.0),
            ("d1", ts(500), 7.0),    # outside the 120s after-window
        ],
        "device string, ts timestamp, v double",
    )
    cand = spark.createDataFrame(
        [("d1", ts(100), 1)], "device string, ts timestamp, cid long"
    )
    r = candidate_signal_context(
        signal, cand, ["device"], "ts", "v", "cid", 120.0, 120.0
    ).first()
    assert r["n_before"] == 2 and r["n_after"] == 2
    assert r["mean_before"] == 15.0 and r["mean_after"] == 50.0
    assert r["mean_shift"] == 35.0
    # std_samp of {10,20} and {40,60}: sqrt(50), sqrt(200)
    assert abs(r["std_before"] - 50 ** 0.5) < 1e-4
    assert abs(r["std_after"] - 200 ** 0.5) < 1e-4
    # snr = 35 / sqrt((50+200)/2) = 35/sqrt(125)
    assert abs(r["snr"] - 35.0 / 125 ** 0.5) < 1e-4

    # single-sample frames: NULL stds -> NULL snr, means still defined
    cand2 = spark.createDataFrame(
        [("d1", ts(30), 2)], "device string, ts timestamp, cid long"
    )
    r2 = candidate_signal_context(
        signal, cand2, ["device"], "ts", "v", "cid", 40.0, 40.0
    ).first()
    assert r2["n_before"] == 1 and r2["std_before"] is None
    assert r2["snr"] is None


def test_candidate_signal_context_scaled_matches_float(spark):
    """The exact-integer-sum path (value_scale) is mirrored in the SQL
    oracle, so a mirrored formula bug would hash-match; this parity test
    checks it against the INDEPENDENT float implementation on a random
    2-decimal fixture — means, stds, counts, shift and snr must agree to
    well under the 6 dp output quantum (the fixture avoids rounding-tie
    values by construction: 120 random draws, any tie would need an
    exact x.xxxxxx5 half)."""
    import random
    from datetime import datetime, timedelta, timezone

    from datamine_v2_0_spark.operators.validation import (
        candidate_signal_context,
    )

    rng = random.Random(17)
    t0 = datetime(2025, 3, 1, tzinfo=timezone.utc)
    sig_rows = [
        ("k%d" % (i % 2), t0 + timedelta(seconds=i * 37), round(rng.uniform(0, 99), 2))
        for i in range(120)
    ]
    signal = spark.createDataFrame(sig_rows, "k string, ts timestamp, v double")
    cand = spark.createDataFrame(
        [(r[0], r[1], i) for i, r in enumerate(sig_rows) if i % 11 == 0],
        "k string, ts timestamp, cid long",
    )
    out = {}
    for scale in (None, 100):
        rows = candidate_signal_context(
            signal, cand, ["k"], "ts", "v", "cid", 300.0, 300.0,
            value_scale=scale,
        ).collect()
        out[scale] = {r["cid"]: r for r in rows}
    assert set(out[None]) == set(out[100]) and len(out[None]) == 11
    for cid, a in out[None].items():
        b = out[100][cid]
        assert (a["n_before"], a["n_after"]) == (b["n_before"], b["n_after"])
        for col in ("mean_before", "std_before", "mean_after", "std_after",
                    "mean_shift", "snr"):
            x, y = a[col], b[col]
            if x is None or y is None:
                assert x == y, (cid, col)
            else:
                assert abs(x - y) <= 2e-6, (cid, col, x, y)


def test_candidate_signal_context_string_id_ntz(spark):
    """The marker columns adopt the candidate frame's own types: string
    candidate ids union cleanly (no hard-coded long cast)."""
    from datetime import datetime

    from datamine_v2_0_spark.operators.validation import (
        candidate_signal_context,
    )

    ts = lambda s: datetime(2025, 1, 1, 0, 0, s)
    signal = spark.createDataFrame(
        [("d1", ts(0), 1.0), ("d1", ts(10), 3.0), ("d1", ts(40), 5.0)],
        "device string, ts timestamp, v double",
    )
    cand = spark.createDataFrame(
        [("d1", ts(20), "sha-abc")], "device string, ts timestamp, cid string"
    )
    r = candidate_signal_context(
        signal, cand, ["device"], "ts", "v", "cid", 30.0, 30.0
    ).first()
    assert r["cid"] == "sha-abc"
    assert r["n_before"] == 2 and r["mean_before"] == 2.0
    assert r["n_after"] == 1 and r["mean_after"] == 5.0
