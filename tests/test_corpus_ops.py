"""Corpus-curation operators: repetition signals, decontamination,
corpus-frequency unit removal, stratum balancing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.operators import dedup as dd
from datamine_v2_0_spark.operators import filters as flt
from datamine_v2_0_spark.operators import text as tx


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x x x x"), (3, "unique words only here")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in tx.repetition_signals(df, "text", "doc_id").collect()
    }
    r1 = rows[1]
    assert r1["n_units"] == 3
    assert r1["dup_unit_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r1["dup_unit_char_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # bigrams 'a a' and 'a b' both count 1; tie breaks to the larger
    # gram string 'a b'; chars = 1 * (len('a b') - 1) = 2 of 3 total
    assert r1["top_bigram_char_frac"] == pytest.approx(2 / 3, abs=1e-6)
    r2 = rows[2]
    assert r2["dup_unit_frac"] == pytest.approx(3 / 4, abs=1e-6)
    # 'x x' occurs 3x overlapping — raw occurrence-chars (1.5) exceed
    # the document, so the fraction caps at 1.0 (all chars covered)
    assert r2["top_bigram_char_frac"] == pytest.approx(1.0, abs=1e-6)
    r3 = rows[3]
    assert r3["dup_unit_frac"] == 0.0
    assert r3["dup_unit_char_frac"] == 0.0


def test_repetition_signals_excludes_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "   ")], ["doc_id", "text"])
    out = tx.repetition_signals(df, "text", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_decontaminate_flags_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    tr = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday"),  # shares 3-grams
            (2, "completely different text with no overlap at all"),
            (3, "hi"),  # shorter than n: zero grams, never contaminated
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in tx.decontaminate(tr, ev, "text", "doc_id", n=3).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_eval_grams"] == 2
    assert not out[2]["contaminated"] and out[2]["n_eval_grams"] == 0
    assert not out[3]["contaminated"]
    assert set(out) == {1, 2, 3}  # every training doc reported


def test_decontaminate_counts_distinct_grams_once(spark):
    ev = spark.createDataFrame([(9, "p q r")], ["doc_id", "text"])
    tr = spark.createDataFrame(
        [(1, "p q r and p q r again")], ["doc_id", "text"]
    )
    out = tx.decontaminate(tr, ev, "text", "doc_id", n=3).collect()[0]
    assert out["n_eval_grams"] == 1  # 'p q r' hit once despite 2 occurrences


def test_remove_common_units_line_dedup(spark):
    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"{boiler}\nreal content one\nmore real text"),
            (2, f"{boiler}\nother interesting body"),
            (3, f"{boiler}\nthird unique line"),
            (4, boiler),  # only boilerplate: collapses to empty
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dd.remove_common_units(
            df, "text", "doc_id", min_doc_frac=0.75
        ).collect()
    }
    assert out[1]["clean_text"] == "real content one\nmore real text"
    assert out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "other interesting body"
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    # unit order preserved even with removals in the middle
    df2 = spark.createDataFrame(
        [(1, "keep1\nCOMMON\nkeep2"), (2, "COMMON"), (3, "COMMON")],
        ["doc_id", "text"],
    )
    out2 = dd.remove_common_units(df2, "text", "doc_id", min_doc_frac=0.9)
    r1 = {r["doc_id"]: r for r in out2.collect()}[1]
    assert r1["clean_text"] == "keep1\nkeep2"


def test_remove_common_units_no_common(spark):
    df = spark.createDataFrame(
        [(1, "alpha\nbeta"), (2, "gamma\ndelta")], ["doc_id", "text"]
    )
    out = dd.remove_common_units(df, "text", "doc_id", min_doc_frac=0.99)
    for r in out.collect():
        assert r["n_removed"] == 0


def test_balance_strata_equalizes(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(10)] + [(100, "small"), (101, "small")],
        ["id", "stratum"],
    )
    out = flt.balance_strata(df, "stratum", "id")
    got = sorted((r["stratum"], r["id"]) for r in out.collect())
    # both strata cut to the min size (2), keeping lowest ids
    assert got == [("big", 0), ("big", 1), ("small", 100), ("small", 101)]


def test_balance_strata_cap(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(5)] + [(i, "b") for i in range(10, 14)],
        ["id", "stratum"],
    )
    out = flt.balance_strata(df, "stratum", "id", cap=2)
    counts = out.groupBy("stratum").count().collect()
    assert {r["stratum"]: r["count"] for r in counts} == {"a": 2, "b": 2}


def test_sample_to_token_budget_semantics(spark):
    df = spark.createDataFrame(
        [(i, "s1", 40) for i in range(10)]
        + [(i, "s2", 400) for i in range(100, 103)],
        ["id", "src", "toks"],
    )
    out = flt.sample_to_token_budget(df, "src", "toks", "id", budget=100)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    # s1: 40-token docs fill a 100 budget with 3 docs (40+40 < 100, +1 overshoot)
    assert len(by_src["s1"]) == 3
    assert max(r["cum_tokens"] for r in by_src["s1"]) == 120
    # s2: a single 400-token doc overshoots but the first doc always lands
    assert len(by_src["s2"]) == 1
    # deterministic: same result on re-run
    again = flt.sample_to_token_budget(
        df, "src", "toks", "id", budget=100
    ).collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in rows)


def test_sample_to_token_budget_order_is_hash_not_id(spark):
    df = spark.createDataFrame(
        [(i, "s", 50) for i in range(20)], ["id", "src", "toks"]
    )
    out = flt.sample_to_token_budget(df, "src", "toks", "id", budget=150)
    kept = sorted(r["id"] for r in out.collect())
    assert len(kept) == 3
    # the Knuth-hash order should not simply take the lowest ids
    assert kept != [0, 1, 2]


def test_gopher_signals_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "- first\n- second\nplain text here"),
            (2, "wait for it...\nok"),
            (3, "abc 123 def"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r for r in tx.gopher_signals(df, "text", "doc_id").collect()
    }
    r1 = rows[1]
    assert r1["bullet_line_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r1["ellipsis_line_frac"] == 0.0
    r2 = rows[2]
    assert r2["ellipsis_line_frac"] == pytest.approx(1 / 2, abs=1e-6)
    # '...' counts as one symbol over 4 words
    assert r2["symbol_word_ratio"] == pytest.approx(1 / 4, abs=1e-6)
    r3 = rows[3]
    assert r3["n_words"] == 3
    assert r3["alpha_word_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r3["mean_word_len"] == pytest.approx(3.0, abs=1e-6)
    r4 = rows[4]
    assert r4["n_words"] == 0
    assert r4["mean_word_len"] == 0.0
    assert r4["alpha_word_frac"] == 0.0


def test_gopher_gate_thresholds(spark):
    good = "the quick brown fox jumps over that lazy sleeping dog with style"
    bad = "### ### ### ### ### ### ### ### ### ### ### ###"
    df = spark.createDataFrame([(1, good), (2, bad)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in tx.gopher_gate(df, "text", "doc_id", min_words=10).collect()
    }
    assert rows[1]["passes"] is True
    assert rows[1]["n_required_stopwords"] >= 2
    assert rows[2]["passes"] is False
    assert rows[2]["alpha_word_frac"] == 0.0


def test_unigram_logprob_known_values(spark):
    import math

    df = spark.createDataFrame([(1, "a a b"), (2, "b b")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in tx.unigram_logprob(df, "text", "doc_id").collect()
    }
    # corpus counts: a=2, b=3, total=5
    exp1 = (2 * math.log10(2 / 5) + math.log10(3 / 5)) / 3
    exp2 = math.log10(3 / 5)
    assert rows[1]["n_words"] == 3
    assert rows[1]["avg_logp"] == pytest.approx(exp1, abs=1e-6)
    assert rows[2]["avg_logp"] == pytest.approx(exp2, abs=1e-6)


def test_curate_corpus_end_to_end(spark):
    from datamine_v2_0_spark.pipeline.curation import curate_corpus

    good = "the quick brown fox jumps over that lazy sleeping dog today"
    contaminated = (
        "the alpha beta gamma delta words resting beside calm water today"
    )
    train = spark.createDataFrame(
        [
            (1, good),
            (2, good),  # exact duplicate -> dropped, id 1 kept
            (3, contaminated),  # shares a 4-gram with the eval set
            (4, "tiny doc"),  # fails min_words
            (5, "the solemn river winds through ancient valleys beneath pale skies"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    out = curate_corpus(train, ev, "text", "doc_id", min_stopwords=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [1, 5]
    assert rows[1]["n_tokens"] == 11
    assert 0.0 <= rows[1]["quality"] <= 1.0


def test_shard_shuffle_deterministic_and_complete(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = flt.shard_shuffle(df, "doc_id", n_shards=4, seed=7)
    rows = out.collect()
    assert len(rows) == 200
    # every shard numbers positions 1..n densely
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # order differs from id order (it is a shuffle)
    first_shard = sorted(by_shard)[0]
    ids_in_order = [
        r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["pos"]))
    ]
    assert ids_in_order != sorted(ids_in_order)
    # deterministic across runs
    again = flt.shard_shuffle(df, "doc_id", n_shards=4, seed=7).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    # different seed -> different order
    other = flt.shard_shuffle(df, "doc_id", n_shards=4, seed=8).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, rows))


def test_hash_split_disjoint_exhaustive_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = flt.hash_split(df, "doc_id", seed=3)
    rows = out.collect()
    assert len(rows) == 1000
    frac = {}
    for r in rows:
        frac[r["split"]] = frac.get(r["split"], 0) + 1
    assert set(frac) == {"train", "valid", "test"}
    assert frac["train"] > 800  # ~90%
    # growing the corpus never moves existing rows between splits
    bigger = {
        r["doc_id"]: r["split"]
        for r in flt.hash_split(
            spark.range(2000).withColumnRenamed("id", "doc_id"), "doc_id", seed=3
        ).collect()
    }
    for r in rows:
        assert bigger[r["doc_id"]] == r["split"]


def test_weighted_mix_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "code") for i in range(2000)],
        ["doc_id", "lang"],
    )
    out = flt.weighted_mix(
        df, "lang", {"en": 0.25, "code": 1.0}, "doc_id", seed=5
    ).collect()
    n_en = sum(1 for r in out if r["lang"] == "en")
    n_code = sum(1 for r in out if r["lang"] == "code")
    assert n_code == 1000  # rate 1.0 keeps everything
    assert 150 < n_en < 350  # ~25% of 1000
    # unknown stratum with default_rate=0 is dropped entirely
    df2 = spark.createDataFrame([(1, "other")], ["doc_id", "lang"])
    assert flt.weighted_mix(df2, "lang", {"en": 1.0}, "doc_id").count() == 0


def test_sampler_plans_are_narrow(spark):
    from datamine_v2_0_spark.plans import count_exchanges

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    # split and mix are pure projections/filters: zero exchanges
    assert count_exchanges(flt.hash_split(df, "doc_id")) == 0
    assert (
        count_exchanges(
            flt.weighted_mix(
                df.withColumn("lang", F.lit("en")), "lang", {"en": 0.5}, "doc_id"
            )
        )
        == 0
    )
    # shard shuffle is exactly one hash exchange (the per-shard window)
    assert count_exchanges(flt.shard_shuffle(df, "doc_id", n_shards=4)) == 1


def test_gopher_signals_null_text(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    df = spark.createDataFrame(
        [(1, None)],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
    )
    r = tx.gopher_signals(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 0
    assert r["mean_word_len"] == 0.0
    assert r["bullet_line_frac"] == 0.0
    assert r["n_required_stopwords"] == 0


def test_temperature_mix_upweights_small_strata(spark):
    # 900 'big' rows vs 100 'small' rows; alpha=0.5 compresses the gap
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "s"])
    out = flt.temperature_mix(df, "s", "id", target_rows=500, alpha=0.5)
    rates = {r["s"]: r["mix_rate"] for r in out.select("s", "mix_rate").distinct().collect()}
    # sqrt weighting: p_big = 30/40, p_small = 10/40
    assert rates["big"] == pytest.approx(500 * 0.75 / 900)
    assert rates["small"] == pytest.approx(1.0)  # 500*0.25/100 = 1.25 -> clamp
    # sampled fraction of the small stratum must exceed the big one
    frac = {
        s: out.filter(out["s"] == s).count() / n
        for s, n in [("big", 900), ("small", 100)]
    }
    assert frac["small"] > frac["big"]


def test_temperature_mix_alpha1_is_uniform_rate(spark):
    # alpha=1 degenerates to a single global rate: target/N for every stratum
    rows = [(i, "a" if i % 4 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "s"])
    out = flt.temperature_mix(df, "s", "id", target_rows=100, alpha=1.0)
    rates = {r["s"]: r["mix_rate"] for r in out.select("s", "mix_rate").distinct().collect()}
    for r in rates.values():
        assert r == pytest.approx(0.25)


def test_temperature_mix_deterministic(spark):
    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "s"])
    a = sorted(r["id"] for r in flt.temperature_mix(df, "s", "id", 50).collect())
    b = sorted(r["id"] for r in flt.temperature_mix(df, "s", "id", 50).collect())
    assert a == b and 0 < len(a) < 100


def test_bigram_logprob_hand_computed(spark):
    """Corpus 'a b', 'a b', 'a c': bigram stream {ab, ab, ac}; N=3,
    V=|{b,c}|=2, α=1. Leave-one-out per doc:
    doc1 (ab): cond=(2-1)/(3-1)=1/2, back=(2-1+1)/(3-1+2)=1/2,
      p=0.7/2+0.3/2=0.5 → log10 = -0.30103 (doc2 identical);
    doc3 (ac): cond=(1-1)/(3-1)=0, back=(1-1+1)/(3-1+2)=1/4,
      p=0.3·0.25=0.075."""
    import math

    import pandas as pd

    from datamine_v2_0_spark.operators import text as tx

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b", "a b", "a c"]})
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in tx.bigram_logprob(df, "text", "doc_id", lam=0.7).collect()
    }
    assert got[1] == (1, round(math.log10(0.5), 6))
    assert got[2] == got[1]
    assert got[3] == (1, round(math.log10(0.075), 6))


def test_bigram_logprob_skips_short_docs(spark):
    import pandas as pd

    from datamine_v2_0_spark.operators import text as tx

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["solo", "", "two words"]})
    )
    assert [r.doc_id for r in tx.bigram_logprob(df, "text", "doc_id").collect()] == [3]


def test_bigram_logprob_flags_gibberish_below_fluent(spark, sf_dir):
    """A doc made of corpus-frequent bigrams must score above one made
    of unique gibberish bigrams."""
    import pandas as pd

    from datamine_v2_0_spark.operators import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = docs.limit(200)
    extra = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [900001], "text": ["zqxv jkwp mmzr qqpl vvnn zzttk"],
             "lang": ["xx"], "source": ["t"], "n_chars": [30]}
        )
    )
    scored = tx.bigram_logprob(top.unionByName(extra), "text", "doc_id")
    rows = {r.doc_id: r.avg_logp for r in scored.collect()}
    fluent_median = sorted(v for k, v in rows.items() if k != 900001)[len(rows) // 2]
    assert rows[900001] < fluent_median


def test_decontaminate_case_insensitive(spark):
    """Regression: a re-cased copy of a benchmark item must be flagged."""
    import pandas as pd

    from datamine_v2_0_spark.operators import text as tx

    tr = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["The Quick Brown Fox Jumps"]})
    )
    ev = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["the quick brown fox jumps"]})
    )
    [r] = tx.decontaminate(tr, ev, "text", "doc_id", n=3).collect()
    assert r.contaminated and r.n_eval_grams == 3


def test_top_bigram_char_frac_bounded(spark):
    """Regression: overlapping top-bigram occurrences pushed the
    'fraction' above 1.0 ('a a a a' measured 1.5)."""
    import pandas as pd

    from datamine_v2_0_spark.operators import text as tx

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a a a a"]})
    )
    [r] = tx.repetition_signals(df, "text", "doc_id").collect()
    assert r.top_bigram_char_frac <= 1.0


def test_strip_duplicate_spans_preserves_case_outside_spans(spark):
    """Regression: reconstruction used normalize_text, silently
    lowercasing every document (even ones with no duplicate span)."""
    import pandas as pd

    from datamine_v2_0_spark.operators import dedup as dd

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"Original Casing Stays {quote}",
                f"Other Document Here {quote}",
                "No Duplicates In This One At All",
            ],
        }
    )
    out = {
        r.doc_id: r.text_clean
        for r in dd.strip_duplicate_spans(
            spark.createDataFrame(docs), "text", "doc_id", k=8
        ).collect()
    }
    assert out[3] == "No Duplicates In This One At All"
    assert out[1].startswith("Original Casing Stays")
    assert quote.split()[0] not in out[1].lower().split()


def test_duplicate_spans_merge_overlapping_regions(spark):
    """Regression: shared k-grams at positions with gap < k cover ONE
    contiguous region; pos - row_number split them into two overlapping
    'maximal' spans that double-counted tokens."""
    import pandas as pd

    # T holds tokens t1..t10; X shares t1..t8, Y shares t3..t10 — T's
    # shared 8-gram positions are {1, 3} (gap 2 < k=8): ONE span [1,10]
    toks = [f"tok{i}" for i in range(1, 11)]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                " ".join(toks),
                "xpre " + " ".join(toks[:8]),
                " ".join(toks[2:]) + " ypost",
            ],
        }
    )
    spans = {
        (r.doc_id, r.start_pos, r.end_pos): r.span_tokens
        for r in dd.duplicate_substring_spans(
            spark.createDataFrame(docs), "text", "doc_id", k=8
        ).collect()
        if r.doc_id == 1
    }
    assert spans == {(1, 1, 10): 10}


# ---------------------------------------------------------------------------
# weighted_sample_k (Efraimidis-Spirakis priority sampling)
# ---------------------------------------------------------------------------


def _es_priority_py(doc_id: int, w: int, seed: int) -> int:
    """Pure-python replica of the exact-method priority (max of w
    seeded md5-60 hashes) — the independent implementation the Spark
    output is checked against."""
    import hashlib

    return max(
        int(hashlib.md5(f"{seed}:{r}:{doc_id}".encode()).hexdigest()[:15], 16)
        for r in range(w)
    )


def test_weighted_sample_exact_matches_pure_python(spark):
    rows = [(i, i % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    got = flt.weighted_sample_k(
        df, "doc_id", "wt", k=25, seed=11, keep_priority=True
    ).collect()
    want = sorted(
        ((_es_priority_py(i, w, 11), i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    assert [(r.priority, r.doc_id, r.wt) for r in got] == want


def test_weighted_sample_law():
    # P(priority_a > priority_b) = wa/(wa+wb) for the u^(1/w) law; the
    # max-of-w integer form follows the same law exactly. Pure-python
    # over many seeds (the Spark parity above pins the implementation).
    wins = sum(
        _es_priority_py(1, 3, seed) > _es_priority_py(2, 1, seed)
        for seed in range(500)
    )
    assert 0.69 <= wins / 500 <= 0.81  # expect 0.75


def test_weighted_sample_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 2)], "doc_id long, wt int"
    )
    got = flt.weighted_sample_k(df, "doc_id", "wt", k=10)
    assert sorted(r.doc_id for r in got.collect()) == [1, 4]  # 0/NULL never sample
    assert "priority" not in got.columns
    # exactly min(k, n) rows
    assert flt.weighted_sample_k(df, "doc_id", "wt", k=1).count() == 1


def test_weighted_sample_overweight_raises(spark):
    df = spark.createDataFrame([(1, 2000)], "doc_id long, wt long")
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)):
        flt.weighted_sample_k(df, "doc_id", "wt", k=1, max_weight=1024).collect()


def test_weighted_sample_float_path(spark):
    rows = [(i, float(i % 9) + 0.5) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, wt double")
    a = flt.weighted_sample_k(df, "doc_id", "wt", k=40, method="float")
    b = flt.weighted_sample_k(
        df.repartition(7, "doc_id"), "doc_id", "wt", k=40, method="float"
    )
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b and len(ids_a) == 40  # layout-independent
    neg = spark.createDataFrame([(1, -2.0), (2, 1.0)], "doc_id long, wt double")
    assert [
        r.doc_id for r in flt.weighted_sample_k(neg, "doc_id", "wt", k=5, method="float").collect()
    ] == [2]


def test_weighted_sample_exact_fractional_raises(spark):
    # Round-11 ADVICE: exact mode used to cast (0,1) weights to long 0 and
    # silently return an EMPTY sample — the documented calibration_report
    # score-as-weight flow hit exactly this. Now it raises, pointing at
    # method='float'.
    import pytest

    scores = spark.createDataFrame(
        [(1, 0.7), (2, 0.3), (3, 0.9)], "doc_id long, wt double"
    )
    with pytest.raises(Exception, match="non-integral weight"):
        flt.weighted_sample_k(scores, "doc_id", "wt", k=2).collect()
    mixed = spark.createDataFrame([(1, 2.5), (2, 3.0)], "doc_id long, wt double")
    with pytest.raises(Exception, match="non-integral weight"):
        flt.weighted_sample_k(mixed, "doc_id", "wt", k=1).collect()
    # integral-valued doubles are fine (2.0 == long 2), and the same
    # scores sample cleanly under method='float'
    ok = spark.createDataFrame([(1, 2.0), (2, 3.0)], "doc_id long, wt double")
    assert flt.weighted_sample_k(ok, "doc_id", "wt", k=2).count() == 2
    assert flt.weighted_sample_k(scores, "doc_id", "wt", k=2, method="float").count() == 2


def test_weighted_sample_float_nan_excluded(spark):
    # NaN > 0 is TRUE under Spark's NaN-greatest ordering, and ln(u)/NaN
    # priorities sort first under desc() — before round 11 NaN-weight rows
    # silently occupied the whole sample.
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("nan")), (3, 1.0), (4, 2.0)],
        "doc_id long, wt double",
    )
    got = flt.weighted_sample_k(df, "doc_id", "wt", k=2, method="float")
    assert sorted(r.doc_id for r in got.collect()) == [3, 4]


def test_weighted_sample_strata(spark):
    rows = [(i, i % 5 + 1, "en" if i % 2 == 0 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, wt long, lang string")
    got = flt.weighted_sample_k(
        df, "doc_id", "wt", k=7, strata=["lang"], keep_priority=True
    ).collect()
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    assert {len(v) for v in by_lang.values()} == {7}
    # per-stratum winners == the global ES order restricted to the stratum
    for lang, members in by_lang.items():
        pool = sorted(
            ((_es_priority_py(i, w, 42), i) for i, w, l in rows if l == lang),
            key=lambda t: (-t[0], t[1]),
        )[:7]
        assert sorted((r.priority, r.doc_id) for r in members) == sorted(pool)


def test_fast_text_counters_match_regexp_forms(spark):
    """Round-12 hot-path rewrite: token_count_bpe's one-pass disjoint
    alternation and punct_count's translate char-map must be
    bit-identical to the original per-pattern regexp_count forms (the
    lone negated-class regexp_count measured ~20 us/doc at 6M docs —
    OPS_AT_SCALE_r12 — 20-45x the rewritten forms). Checked on ASCII,
    unicode letters, astral emoji (code-point counting), non-\\s
    unicode whitespace (NBSP, ideographic space), and boundary shapes."""
    from pyspark.sql import functions as F

    from datamine_v2_0_spark.operators import text as tx

    rows = [
        ("",), (" \t\n",), ("héllo, wörld! 😀🤖",), ("a.b,c;d:e",),
        ("x" * 500,), ("...…#…...",), (" nbsp",),
        ("ideo　space",), ("mixed 123 !@# ABC xyz\n\ttail",),
        ("the quick brown fox, and it is in that for with!",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    c = F.col("text")
    old_bpe = (
        F.coalesce(F.regexp_count(c, F.lit(r"[A-Za-z]+")), F.lit(0))
        + F.coalesce(F.regexp_count(c, F.lit(r"\d+")), F.lit(0))
        + F.coalesce(F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]")), F.lit(0))
    )
    old_punct = F.when(
        F.length(c) > 0,
        F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]")) / F.length(c),
    ).otherwise(F.lit(0.0))
    got = df.select(
        old_bpe.alias("ob"), tx.token_count_bpe(c).alias("nb"),
        old_punct.alias("op"), tx.punct_ratio(c).alias("np"),
    ).collect()
    for r in got:
        assert r["ob"] == r["nb"], r
        assert abs(r["op"] - r["np"]) < 1e-15, r


def test_word_shingles_from_words_matches_inline_form(spark):
    """Round-13 hot-path restructure: the two-step projection
    (words column -> word_shingles_from_words) must be bit-identical
    to the one-expression word_shingles form. The restructure exists
    because the inline form re-evaluates normalize+split inside the
    transform lambda once per gram (~28 ms/doc measured at sf0.1);
    checked on empty/short/whitespace/unicode/duplicate-gram shapes
    and both n=2 and n=3."""
    from datamine_v2_0_spark.operators.dedup import (
        normalize_text, word_shingles, word_shingles_from_words,
    )

    rows = [
        ("",), ("   ",), ("one",), ("one two",), ("one two three",),
        ("a b c d e f g",), ("x x x x x",), ("Héllo  Wörld déjà vu okay",),
        ("a b c a b c a b c",), ("tab\tand\nnewline separated words",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    for n in (2, 3):
        got = df.select(
            word_shingles(F.col("text"), n).alias("inline"),
            word_shingles_from_words(
                F.split(normalize_text(F.col("text")), " "), n
            ).alias("direct"),
        ).collect()
        for r in got:
            assert r["inline"] == r["direct"], (n, r)
