"""Third-implementation parity: intricate registry queries checked
against an INDEPENDENT pure-Python/numpy ground truth on the sf0.001
tables — the defense-in-depth layer for MIRRORED operator+oracle
defects (both engines implementing the same mistake hash-match green).
The ground truths here share no code or SQL with either side."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF}/events.parquet'"
    ).df()


def test_evt_funnel_vs_python_loop(spark, events_pdf):
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["evt_funnel"]
    got = {r["step_name"]: r["users"] for r in fn(spark, SF).collect()}

    steps = ["view", "click", "purchase"]
    counts = [0, 0, 0]
    for _, grp in events_pdf.groupby("user_id"):
        evs = sorted(
            zip(grp["ts"], grp["event_type"]), key=lambda t: (t[0], t[1])
        )
        stage = 0
        last_t = None
        for t, ty in evs:
            if stage >= len(steps):
                break
            # strict ordering: stage i completes at the first steps[i]
            # event strictly after the stage i-1 completion
            if ty == steps[stage] and (last_t is None or t > last_t):
                counts[stage] += 1
                last_t = t
                stage += 1
    for i, s in enumerate(steps):
        assert got.get(s, 0) == counts[i], (s, got, counts)


def test_stat_kappa_vs_formula(spark):
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["stat_kappa"]
    row = fn(spark, SF).first()

    import re

    docs = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).df()
    a = ["long" if len(t) >= 200 else "short" for t in docs["text"]]
    b = [
        "long" if len(re.split(r"\s+", t.strip())) >= 40 else "short"
        for t in docs["text"]
    ]
    n = len(a)
    po = sum(x == y for x, y in zip(a, b)) / n
    pe = sum(
        (a.count(k) / n) * (b.count(k) / n) for k in ("long", "short")
    )
    kappa = (po - pe) / (1 - pe)
    assert row["n"] == n
    assert abs(row["po"] - po) < 1e-6
    assert abs(row["pe"] - pe) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-6


def test_win_rolling_corr_vs_numpy(spark, events_pdf):
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["win_rolling_corr"]
    got = {r["event_id"]: r["trend_corr"] for r in fn(spark, SF).collect()}

    EPOCH0 = 1704067200.0
    n_checked = 0
    for _, grp in events_pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        x = g["ts"].astype("int64").to_numpy() / 1e9 - EPOCH0  # ns -> sec
        y = g["value"].to_numpy(dtype=np.float64)
        for i in range(len(g)):
            lo = max(0, i - 99)
            yy, xx = y[lo : i + 1], x[lo : i + 1]
            ok = ~np.isnan(yy)
            yy, xx = yy[ok], xx[ok]
            exp = None
            if len(yy) >= 1:
                sx, sy = xx.std(), yy.std()
                if sx > 0 and sy > 0:
                    cov = ((xx - xx.mean()) * (yy - yy.mean())).mean()
                    c = cov / (sx * sy)
                    exp = math.floor(c * 1e6 + 0.5) / 1e6
            g_val = got[g["event_id"][i]]
            if exp is None:
                assert g_val is None, (g["event_id"][i], g_val)
            else:
                assert g_val is not None and abs(g_val - exp) <= 1e-6, (
                    g["event_id"][i], g_val, exp,
                )
            n_checked += 1
    assert n_checked == len(events_pdf)


def test_text_lm_bigram_vs_python(spark):
    """Leave-one-out interpolated bigram LM vs a from-scratch Counter
    implementation of the documented math — the round-4 defect class
    (self-training on own counts) stays dead only if the held-out
    arithmetic is exactly right on BOTH engines."""
    import re
    from collections import Counter

    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["text_lm_bigram"]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in fn(spark, SF).collect()
    }

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    streams = {}
    for doc_id, text in rows:
        if text is None:
            continue
        w = re.sub(r"\s+", " ", text).strip().split(" ")
        if len(w) < 2:
            continue
        streams[doc_id] = list(zip(w[:-1], w[1:]))

    c12, c1, c2 = Counter(), Counter(), Counter()
    N = 0
    for s in streams.values():
        for b in s:
            c12[b] += 1
            c1[b[0]] += 1
            c2[b[1]] += 1
            N += 1
    V = len({b[1] for s in streams.values() for b in s})
    lam, alpha = 0.7, 1.0

    assert set(got) == set(streams)
    for d, s in streams.items():
        nd = len(s)
        n12, n1, n2 = Counter(s), Counter(), Counter()
        for b in s:
            n1[b[0]] += 1
            n2[b[1]] += 1
        tot = 0.0
        for b in s:
            den = c1[b[0]] - n1[b[0]]
            cond = (c12[b] - n12[b]) / den if den > 0 else 0.0
            back = (c2[b[1]] - n2[b[1]] + alpha) / (N - nd + alpha * V)
            tot += math.log10(lam * cond + (1 - lam) * back)
        assert got[d][0] == nd
        assert abs(got[d][1] - tot / nd) <= 2e-6, (d, got[d][1], tot / nd)


def test_ts_ewma_vs_pandas(spark, events_pdf):
    """Hourly-resample + exact EWMA recurrence vs pandas
    groupby-resample + ewm(alpha, adjust=False) — an entirely separate
    implementation of both stages."""
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["ts_ewma"]
    got = {
        (r["event_type"], str(r["bucket"])): (r["value"], r["ewma"])
        for r in fn(spark, SF).collect()
    }

    pdf = events_pdf.copy()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    hourly = (
        pdf.groupby(["event_type", "bucket"])["value"].mean().reset_index()
    )
    hourly["value"] = np.floor(hourly["value"] * 1e4 + 0.5) / 1e4
    n_checked = 0
    for et, grp in hourly.groupby("event_type"):
        g = grp.sort_values("bucket")
        ew = g["value"].ewm(alpha=0.3, adjust=False).mean()
        for b, v, e in zip(g["bucket"], g["value"], ew):
            key = (et, str(b))
            assert key in got, key
            gv, ge = got[key]
            assert abs(gv - v) <= 1e-9
            assert abs(ge - round(e, 6)) <= 2e-6, (key, ge, e)
            n_checked += 1
    assert n_checked == len(got)


def test_win_savgol_vs_numpy_polyfit(spark, events_pdf):
    """Interior Savitzky-Golay points vs a per-window numpy quadratic
    least-squares fit evaluated at the center — no convolution
    coefficients shared with either engine."""
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["win_savgol"]
    got = {r["event_id"]: r["smoothed"] for r in fn(spark, SF).collect()}

    pos = np.arange(-5, 6, dtype=np.float64)
    n_checked = 0
    for _, grp in events_pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        y = g["value"].to_numpy(dtype=np.float64)
        for i in range(5, len(g) - 5):
            win = y[i - 5 : i + 6]
            if np.isnan(win).any():
                # kernel input NaNs: skip — covered by the operator's
                # own NULL-handling tests
                continue
            coef = np.polyfit(pos, win, 2)
            exp = round(float(np.polyval(coef, 0.0)), 6)
            assert g["event_id"][i] in got
            assert abs(got[g["event_id"][i]] - exp) <= 2e-6, (
                g["event_id"][i], got[g["event_id"][i]], exp,
            )
            n_checked += 1
    assert n_checked > 100  # the sf0.001 fixture has plenty of interior rows


def test_ts_cusum_vs_python_recurrence(spark, events_pdf):
    """Hourly-resample + one-sided CUSUM recurrences vs a pure-Python
    replay: s+ = max(0, s+ + (x - target - slack)),
    s- = max(0, s- + (target - x - slack)) over the independently
    computed quantized hourly means (target 50, slack 0.5,
    threshold 40)."""
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["ts_cusum"]
    got = {
        (r["event_type"], str(r["bucket"])): (
            r["cusum_up"], r["cusum_down"], r["alarm"]
        )
        for r in fn(spark, SF).collect()
    }

    pdf = events_pdf.copy()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    hourly = (
        pdf.groupby(["event_type", "bucket"])["value"].mean().reset_index()
    )
    hourly["value"] = np.floor(hourly["value"] * 1e4 + 0.5) / 1e4
    n_checked = 0
    for et, grp in hourly.groupby("event_type"):
        g = grp.sort_values("bucket")
        up = dn = 0.0
        for b, x in zip(g["bucket"], g["value"]):
            up = max(0.0, up + (x - 50.0 - 0.5))
            dn = max(0.0, dn + (50.0 - x - 0.5))
            gu, gd, alarm = got[(et, str(b))]
            assert abs(gu - round(up, 6)) <= 2e-6, (et, b, gu, up)
            assert abs(gd - round(dn, 6)) <= 2e-6
            assert alarm == (round(up, 6) > 40.0 or round(dn, 6) > 40.0), (
                et, b, up, dn, alarm,
            )
            n_checked += 1
    assert n_checked == len(got)


@pytest.mark.parametrize("sf_dir", [SF, "/root/testdata/sf0.01"])
def test_graph_pagerank_vs_numpy_power_iteration(spark, sf_dir):
    """graph_pagerank's 16x oracle is infeasible (DuckDB recursive-CTE
    disk wall, COVERAGE.md) and its pytest ground truths are small
    fixtures — this is the independent check on the real co-purchase
    graph (both sf0.001 and the driver-gate sf0.01): a dense numpy
    power iteration sharing NO code with the operator or the SQL
    oracle, including the per-iteration half-up floor quantization
    grid (floor(x*1e9 + 0.5)/1e9)."""
    from datamine_v2_0_spark.contract import QUERIES

    fn, _ = QUERIES["graph_pagerank"]
    got = {r["node"]: r["rank"] for r in fn(spark, sf_dir).collect()}

    li = duckdb.sql(
        f"SELECT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                edges.add((a, b))
                edges.add((b, a))
    nodes = sorted({a for a, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    rank = np.full(n, 1.0 / n)
    d = 0.85

    def q(x):
        return np.floor(x * 1e9 + 0.5) / 1e9

    for _ in range(5):
        contrib = np.zeros(n)
        share = rank / deg
        for a, b in edges:
            contrib[idx[b]] += share[idx[a]]
        rank = q((1.0 - d) / n + d * contrib)
    # final display rounding must be half-up like Spark's F.round —
    # Python's round() is banker's and diverges on exact .5 boundaries
    want = {
        node: math.floor(rank[i] * 1e6 + 0.5) / 1e6 for node, i in idx.items()
    }

    assert set(got) == set(want)
    worst = max(abs(got[k] - want[k]) for k in want)
    # summation-order float error inside one iteration is bounded well
    # below the quantization step; after the grid snap the two
    # implementations must agree to the printed 6dp
    assert worst <= 1e-6, worst
    exact = sum(1 for k in want if got[k] == pytest.approx(want[k], abs=5e-7))
    assert exact == len(want)


def _mini16_replica_rows(n_base=40):
    """16x id-offset duplicate replica of a small real-document sample —
    the make_scaled.py composition (every doc gains 15 identical twins)
    at a size where a pure-Python inverted index is exact ground truth."""
    base = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"ORDER BY doc_id LIMIT {n_base}"
    ).df()
    off = 1_000_000_000
    return [
        (int(r["doc_id"]) + c * off, r["text"])
        for c in range(16)
        for _, r in base.iterrows()
    ]


def _py_shingles(text, n=3):
    import re as _re

    w = _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _py_inverted_pairs(docs, df_cap=None):
    """Pure-Python inverted index: (pair -> shared count), capped sizes,
    and true sizes. Shares no code with the operator or its oracle."""
    from collections import defaultdict

    sh = {i: _py_shingles(t) for i, t in docs}
    sh = {i: s for i, s in sh.items() if s}
    dfreq = defaultdict(int)
    for s in sh.values():
        for g in s:
            dfreq[g] += 1
    kept = {
        i: (s if df_cap is None else {g for g in s if dfreq[g] <= df_cap})
        for i, s in sh.items()
    }
    post = defaultdict(list)
    for i, s in kept.items():
        for g in s:
            post[g].append(i)
    inter = defaultdict(int)
    for ids in post.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                inter[(ids[x], ids[y])] += 1
    true_sz = {i: len(s) for i, s in sh.items()}
    capped_sz = {i: len(s) for i, s in kept.items()}
    return inter, capped_sz, true_sz


@pytest.mark.parametrize("df_cap", [None, 24])
@pytest.mark.parametrize("collapse", ["always", "never"])
def test_dedup_jaccard_inverted_16x_vs_python(spark, df_cap, collapse):
    """The highest-alpha scaling query (0.68) at 16x duplication, where
    its DuckDB oracle takes hours: full-result parity against an
    independent pure-Python inverted index, uncapped AND with a df cap
    chosen to BITE only at 16x (cap 24: any shingle in >=2 base docs has
    replica df >=32 and is pruned; base-unique shingles, df 16, survive
    — exactly the scale-onset regime the cap path must stay exact in)."""
    from datamine_v2_0_spark.operators import dedup as dd

    docs = _mini16_replica_rows()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_pairs_inverted(
            sdf, "text", "doc_id", threshold=0.2, max_shingle_freq=df_cap,
            duplicate_collapse=collapse,
        ).collect()
    }
    inter, capped_sz, _ = _py_inverted_pairs(docs, df_cap)
    want = {}
    for (a, b), i in inter.items():
        j = i / (capped_sz[a] + capped_sz[b] - i)
        if j >= 0.2:
            want[(a, b)] = math.floor(j * 1e6 + 0.5) / 1e6
    assert set(got) == set(want)
    assert got and all(
        got[k] == pytest.approx(want[k], abs=1e-9) for k in want
    )
    # the duplicate twins must pair at exactly 1.0 — C(16,2) per base
    # doc; under the cap a base doc whose every shingle is shared loses
    # its whole (capped) universe and drops out, so the bound relaxes
    ones = sum(1 for v in want.values() if v == 1.0)
    assert ones >= (40 if df_cap is None else 36) * 120


@pytest.mark.parametrize("df_cap", [None, 24])
@pytest.mark.parametrize("collapse", ["always", "never"])
def test_dedup_containment_16x_vs_python(spark, df_cap, collapse):
    """Second-highest-alpha query (0.61) at 16x duplication: containment
    numerators use the capped universe but denominators the TRUE sizes
    (the documented lower-bound semantics) — a mixed contract that a
    mirrored operator+oracle bug could get consistently wrong, hence the
    independent ground truth."""
    from datamine_v2_0_spark.operators import dedup as dd

    docs = _mini16_replica_rows()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in dd.containment_pairs_inverted(
            sdf, "text", "doc_id", threshold=0.3, max_shingle_freq=df_cap,
            duplicate_collapse=collapse,
        ).collect()
    }
    inter, _, true_sz = _py_inverted_pairs(docs, df_cap)
    want = {}
    for (a, b), i in inter.items():
        ca, cb = i / true_sz[a], i / true_sz[b]
        if ca >= 0.3 or cb >= 0.3:
            want[(a, b)] = (
                math.floor(ca * 1e6 + 0.5) / 1e6,
                math.floor(cb * 1e6 + 0.5) / 1e6,
            )
    assert set(got) == set(want)
    assert got and all(
        got[k][0] == pytest.approx(want[k][0], abs=1e-9)
        and got[k][1] == pytest.approx(want[k][1], abs=1e-9)
        for k in want
    )
