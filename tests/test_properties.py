"""Property-based tests (hypothesis) for the parity-critical kernels:
Postgres timestamp rendering, clamp algebra, PELT invariants, binning."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datamine_v2_0_spark.functions.signal import pelt_l2, savgol_filter


def _pg_render(dt: datetime) -> str:
    """Independent reimplementation of Postgres timestamptz::text (UTC)."""
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    if dt.microsecond:
        frac = f"{dt.microsecond:06d}".rstrip("0")
        base += f".{frac}"
    return base + "+00"


TS_STRATEGY = st.datetimes(
    min_value=datetime(1990, 1, 1), max_value=datetime(2049, 12, 31)
)


class TestPgTimestampProperty:
    """Spark expression vs independent Python rendering over random
    timestamps — run in batches to amortize Spark jobs."""

    def test_batch_random_timestamps(self, spark):
        import random

        from pyspark.sql import Row, functions as F

        from datamine_v2_0_spark.functions.scalars import pg_timestamptz_text

        rng = random.Random(1234)
        dts = [
            datetime(
                rng.randint(1990, 2049), rng.randint(1, 12), rng.randint(1, 28),
                rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59),
                rng.choice([0, 1, 100, 1000, 120000, 500000, 734539, 999999]),
                tzinfo=timezone.utc,
            )
            for _ in range(300)
        ]
        df = spark.createDataFrame([Row(i=i, ts=d) for i, d in enumerate(dts)])
        got = {
            r["i"]: r["t"]
            for r in df.select(
                "i", pg_timestamptz_text(F.col("ts")).alias("t")
            ).collect()
        }
        for i, d in enumerate(dts):
            assert got[i] == _pg_render(d), (d, got[i])


@settings(max_examples=30, deadline=None)
@given(
    levels=st.lists(
        st.floats(min_value=-100, max_value=100), min_size=1, max_size=4
    ),
    seed=st.integers(0, 2**31 - 1),
)
def test_pelt_breakpoint_invariants(levels, seed):
    rng = np.random.default_rng(seed)
    sig = np.concatenate([rng.normal(lv, 0.1, 30) for lv in levels])
    bkps = pelt_l2(sig, penalty=5.0, min_size=10)
    n = len(sig)
    # invariants: sorted, interior, min_size respected on both flanks
    assert bkps == sorted(bkps)
    prev = 0
    for b in bkps:
        assert 0 < b < n
        assert b - prev >= 10
        prev = b
    if bkps:
        assert n - bkps[-1] >= 10


@settings(max_examples=30, deadline=None)
@given(
    ys=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_savgol_shape_and_finiteness(ys):
    y = np.array(ys, dtype=np.float64)
    out = savgol_filter(y, window=11, polyorder=3)
    assert out.shape == y.shape
    assert np.isfinite(out).all()


@settings(max_examples=50, deadline=None)
@given(
    x=st.floats(allow_nan=False, allow_infinity=False, width=32),
    lo=st.floats(min_value=-1000, max_value=0),
    hi=st.floats(min_value=1, max_value=1000),
)
def test_clamp_algebra(x, lo, hi):
    """clamp is idempotent and bounded — checked on the kernel math the
    Column expression mirrors (least/greatest)."""
    clamped = min(max(x, lo), hi)
    assert lo <= clamped <= hi
    assert min(max(clamped, lo), hi) == clamped


def test_chunk_documents_reconstruction_invariants(spark):
    """Randomized chunking invariants, one Spark pass per parameter set:
    full chunks everywhere except the tail, contiguous indices, and
    dropping each later chunk's first `overlap` tokens reconstructs the
    original token stream exactly."""
    import random
    from collections import defaultdict

    from datamine_v2_0_spark.operators.text import chunk_documents

    rng = random.Random(11)
    docs = [
        (i, " ".join(f"t{j}" for j in range(rng.randrange(0, 200))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk, overlap in ((16, 4), (32, 31), (8, 0)):
        rows = chunk_documents(df, "text", "doc_id", chunk, overlap).collect()
        by_doc = defaultdict(list)
        for r in rows:
            by_doc[r["doc_id"]].append(r)
        for doc_id, text in docs:
            toks = text.split()
            chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
            if not toks:
                assert chunks == []
                continue
            assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
            recon = chunks[0]["chunk_text"].split()
            for c in chunks[1:]:
                recon.extend(c["chunk_text"].split()[overlap:])
            assert recon == toks, (doc_id, chunk, overlap)
            for c in chunks[:-1]:
                assert c["n_tokens"] == chunk
            for c in chunks:
                assert c["n_tokens"] == len(c["chunk_text"].split())


@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=40, deadline=None)
def test_bpe_encode_reconstruction(words, num_merges):
    """encode_word output always concatenates back to word + </w>, for
    any merge table learned from any corpus slice (driver-side kernels
    only — no Spark job per example)."""
    from collections import Counter

    from datamine_v2_0_spark.operators import bpe

    # learn merges from the word multiset without Spark: replicate the
    # driver loop's input shape
    vocab = {}
    for w in words:
        syms = tuple(w) + (bpe.END,)
        vocab[syms] = vocab.get(syms, 0) + 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        vocab = {
            bpe._merge_word(syms, best): freq for syms, freq in vocab.items()
        }
        merges.append(best)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in words:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.END


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.floats(min_value=0.01, max_value=1.0),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=200, deadline=None)
def test_hash_split_assignment_total_function(weights, doc_id):
    """The split CASE is exhaustive and deterministic for ANY weight
    list (normalized or not) and any id — mirror of the Column logic in
    plain Python over the same portable hash."""
    u = ((doc_id % 1000000007) * 2654435761 + 3) % 4294967296 / 4294967296.0
    cum = 0.0
    label = None
    for name, wt in weights:
        cum += wt
        if u < cum:
            label = name
            break
    if label is None:
        label = weights[-1][0]
    assert label in [n for n, _ in weights]


def test_asof_merge_equals_broadcast_rank1_on_random_data(spark):
    """The union-merge as-of (one shuffle, zero joins) and the broadcast
    rank-1 as-of must produce identical matches on randomized data —
    two independent implementations cross-validating each other."""
    import random

    from pyspark.sql import functions as F

    from datamine_v2_0_spark.operators import joins as jn

    rng = random.Random(7)
    base = datetime(2024, 1, 1)
    keys = ["a", "b", "c"]
    left = [
        (i, rng.choice(keys), base.replace(hour=rng.randrange(24),
                                           minute=rng.randrange(60),
                                           second=rng.randrange(60)))
        for i in range(120)
    ]
    # unique right timestamps per key (determinism precondition)
    right = []
    seen = set()
    for j in range(60):
        k = rng.choice(keys)
        ts = base.replace(hour=rng.randrange(24), minute=rng.randrange(60),
                          second=rng.randrange(60))
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        right.append((k, ts, float(j)))
    ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(right, ["k", "rts", "val"])

    merged = {
        r["lid"]: r["asof_val"]
        for r in jn.asof_merge_join(
            ldf, rdf, ["k"], "ts", "rts", ["val"],
            tolerance_seconds=7200.0,
        ).collect()
    }
    rank1 = {
        r["lid"]: r["val"]
        for r in jn.asof_nearest_join(
            ldf,
            rdf.select(F.col("k").alias("rk"), "rts", "val"),
            [("k", "rk")],
            "ts", "rts", 7200.0, "lid", direction="backward",
        ).collect()
    }
    assert len(merged) == 120  # every left row survives the merge form
    for lid, val in merged.items():
        if val is None:
            assert lid not in rank1  # inner rank-1 drops unmatched
        else:
            assert rank1[lid] == val


class TestRound4Properties:
    """Invariants of the round-4 operators over randomized inputs —
    batched through one Spark job each to amortize session cost."""

    def test_ewma_bounded_and_converges(self, spark):
        """EWMA stays within [min, max] of the series prefix, and for a
        constant tail converges toward that constant."""
        import random

        from datamine_v2_0_spark.operators import timeseries as tsr

        rng = random.Random(7)
        rows = []
        for k in range(6):
            vals = [rng.uniform(-100, 100) for _ in range(30)] + [42.0] * 30
            rows += [(f"k{k}", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = tsr.ewma_smooth(df, ["k"], "ts", "v", alpha=0.4)
        by_key: dict[str, list] = {}
        for r in out.collect():
            by_key.setdefault(r["k"], []).append((r["ts"], r["v"], r["ewma"]))
        for k, seq in by_key.items():
            seq.sort()
            lo = hi = seq[0][1]
            for _, v, e in seq:
                lo, hi = min(lo, v), max(hi, v)
                assert lo - 1e-6 <= e <= hi + 1e-6
            # constant tail: last smoothed value within 1% of 42
            assert abs(seq[-1][2] - 42.0) < 0.42

    def test_psi_nonnegative_total(self, spark):
        """The summed PSI is non-negative (each term is (p-q)·ln(p/q),
        same-sign factors) and registers a real shift."""
        import random

        from datamine_v2_0_spark.operators import quality as qa

        rng = random.Random(11)
        a = spark.createDataFrame(
            [(rng.gauss(0, 1),) for _ in range(400)], ["v"]
        )
        b = spark.createDataFrame(
            [(rng.gauss(0.8, 1.3),) for _ in range(400)], ["v"]
        )
        fwd = qa.population_stability(a, b, "v")
        total = sum(r["psi_term"] for r in fwd.collect())
        assert total >= -1e-9
        assert total > 0.01  # genuinely shifted distributions register

    def test_rrf_rank_dominance(self, spark):
        """A doc ranked at least as well as another in EVERY list fuses
        to a score at least as high."""
        from datamine_v2_0_spark.operators import retrieval as rt

        lex = spark.createDataFrame(
            [(1, d, r) for d, r in [(10, 1), (11, 2), (12, 3)]],
            ["query_id", "doc_id", "rank"],
        )
        dense = spark.createDataFrame(
            [(1, d, r) for d, r in [(10, 2), (11, 3), (12, 1)]],
            ["query_id", "doc_id", "rank"],
        )
        out = {r["doc_id"]: r["rrf_score"] for r in rt.rrf_fuse(
            [lex, dense], k=10
        ).collect()}
        # doc 10 dominates doc 11 in both lists
        assert out[10] > out[11]

    def test_pagerank_mass_conservation_symmetric(self, spark):
        """On a symmetrized (no-dangling) random graph, ranks stay a
        probability distribution (sum 1) and all positive."""
        import random

        from datamine_v2_0_spark.operators import graph as gr

        rng = random.Random(3)
        edges = set()
        for _ in range(60):
            a, b = rng.randrange(20), rng.randrange(20)
            if a != b:
                edges |= {(a, b), (b, a)}
        df = spark.createDataFrame(sorted(edges), ["src", "dst"])
        got = [r["rank"] for r in gr.pagerank(df, n_iter=8).collect()]
        assert all(v > 0 for v in got)
        assert sum(got) == pytest.approx(1.0, abs=1e-3)

    def test_grid_radius_join_random_parity(self, spark):
        """Randomized brute-force parity for the spatial radius join."""
        import itertools
        import math
        import random

        from pyspark.sql import functions as F

        from datamine_v2_0_spark.operators.spatial import grid_radius_join

        rng = random.Random(5)
        pts = [
            (i, rng.uniform(0, 20), rng.uniform(0, 20)) for i in range(150)
        ]
        df = spark.createDataFrame(pts, ["pid", "lat", "lon"])
        r = 2.1
        got = {
            (x["id_a"], x["id_b"])
            for x in grid_radius_join(
                df, F.col("lat"), F.col("lon"), "pid", radius=r
            ).collect()
        }
        want = {
            (i, j)
            for (i, la, lo), (j, lb, lc) in itertools.combinations(pts, 2)
            if math.sqrt((la - lb) ** 2 + (lo - lc) ** 2) <= r
        }
        assert got == want


def test_quantile_bins_exact_random_ties_parity(spark):
    """Scale-safe NTILE (distributed prefix-sum rank + closed-form
    bucket arithmetic) vs Spark's own global F.ntile over random data
    WITH heavy duplicate values (ties resolved by the unique tiebreak):
    bit-for-bit bucket parity across sizes and bucket counts."""
    import random

    from pyspark.sql import Window, functions as F

    from datamine_v2_0_spark.operators import binning as bn

    rng = random.Random(77)
    for trial in range(4):
        n = rng.choice([1, 7, 64, 331])
        k = rng.choice([2, 5, 16, 40])
        # values drawn from a tiny domain -> massive tie groups
        rows = [(i, float(rng.randint(0, 4))) for i in range(n)]
        df = spark.createDataFrame(rows, "i long, x double").repartition(8)
        got = {
            r["i"]: r["q"]
            for r in bn.quantile_bins_exact(
                df, "x", k, "q", "i", buckets=6
            ).collect()
        }
        w = Window.orderBy(F.col("x"), F.col("i"))
        exp = {
            r["i"]: r["q"]
            for r in df.withColumn("q", F.ntile(k).over(w) - 1).collect()
        }
        assert got == exp, (n, k)


def test_label_windows_random_vs_bruteforce(spark):
    """label_windows vs an independent single-pass Python reimplementation
    of the reference's grouping loop over random event streams."""
    import random
    from datetime import datetime, timedelta

    from datamine_v2_0_spark.operators.validation import label_windows

    rng = random.Random(99)
    base = datetime(2025, 3, 1)
    rows = []
    eid = 0
    for dev in ("a", "b", "c"):
        t = base
        for _ in range(rng.randint(0, 40)):
            t += timedelta(seconds=rng.choice([5, 30, 59, 61, 200]))
            rows.append((dev, t, rng.choice(["load", "dump"]), eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "device string, ts timestamp, label string, eid long"
    ).repartition(5)
    got = sorted(
        (r["device"], r["label"], r["win_start"], r["win_end"], r["n_events"])
        for r in label_windows(
            df, ["device"], "ts", "label", 60.0, tiebreak="eid"
        ).collect()
    )
    # brute force: the reference's sequential loop
    exp = []
    for dev in ("a", "b", "c"):
        evs = sorted([r for r in rows if r[0] == dev], key=lambda r: (r[1], r[3]))
        cur = None
        for _, t, lab, _ in evs:
            if (
                cur is None
                or lab != cur[1]
                or (t - cur[3]).total_seconds() > 60.0
            ):
                if cur:
                    exp.append(cur)
                cur = [dev, lab, t, t, 1]
            else:
                cur[3] = t
                cur[4] += 1
        if cur:
            exp.append(cur)
    exp = sorted((d, l, s, e, n) for d, l, s, e, n in exp)
    assert got == exp


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_compress_invariants(stream, capacity):
    """_mg_compress keeps the MG guarantees on arbitrary streams: at most
    `capacity` survivors, every surviving estimate is a lower bound with
    error <= the total decrement, and any key with true count > total
    decrement SURVIVES (the frequent-items guarantee)."""
    from collections import Counter

    from datamine_v2_0_spark.operators.sketches import _mg_compress

    counts: dict = {}
    dec_total = 0
    true = Counter()
    for x in stream:
        true[x] += 1
        counts[x] = counts.get(x, 0) + 1
        counts, d = _mg_compress(counts, capacity)
        dec_total += d

    assert len(counts) <= capacity
    for k, est in counts.items():
        assert 0 < est <= true[k]
        assert true[k] - est <= dec_total
    for k, t in true.items():
        if t > dec_total:
            assert k in counts, (k, t, dec_total)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1, max_size=500,
    ),
)
@settings(max_examples=40, deadline=None)
def test_tdigest_quantile_rank_error(values):
    """t-digest quantile estimates stay within the digest's rank-error
    class on arbitrary inputs: for each probed q, the estimate lies
    between the exact values at ranks q +/- 10% (loose band; the scale
    function concentrates accuracy at the tails)."""
    from datamine_v2_0_spark.operators.sketches import (
        tdigest_quantile, tdigest_sketch,
    )

    arr = np.sort(np.asarray(values, dtype=np.float64))
    cent = tdigest_sketch(arr, max_centroids=100)
    n = len(arr)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        est = tdigest_quantile(cent, q)
        lo = arr[max(0, min(n - 1, int(np.floor((q - 0.1) * n))))]
        hi = arr[max(0, min(n - 1, int(np.ceil((q + 0.1) * n))))]
        assert lo <= est <= hi or np.isclose(est, lo) or np.isclose(est, hi), (
            q, est, lo, hi, n,
        )
