"""Empty-input robustness: the defect class tools/empty_sweep.py probes
(an empty ingest day / a filter matching nothing is routine at scale).
These pin the five crashes the round-7 sweep found, fixed operator-side."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_vecs(spark):
    return spark.createDataFrame([], "doc_id long, vec array<double>")


def test_psi_empty_sides(spark):
    from datamine_v2_0_spark.operators.quality import population_stability

    empty = spark.createDataFrame([], "value double")
    some = spark.createDataFrame([(float(i),) for i in range(20)], "value double")
    # both empty, and each side empty alone: no ANSI divide-by-zero;
    # the eps floor makes every psi_term 0 for the all-empty case
    rows = population_stability(empty, empty, "value").collect()
    assert len(rows) == 10 and all(r["psi_term"] == 0.0 for r in rows)
    rows2 = population_stability(some, empty, "value").collect()
    assert len(rows2) == 10
    assert all(r["n_cur"] == 0 for r in rows2)


def test_ivf_topk_empty_corpus(spark, empty_vecs):
    from datamine_v2_0_spark.operators.similarity import ivf_topk

    out = ivf_topk(empty_vecs, empty_vecs, "vec", "doc_id", dim=4)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim",
    ]


def test_train_pq_empty_corpus(spark, empty_vecs):
    from datamine_v2_0_spark.operators.similarity import pq_topk, train_pq

    books = train_pq(empty_vecs, "vec", dim=4, m=2, k_codes=4)
    assert books.shape == (2, 4, 2) and not books.any()
    assert pq_topk(
        empty_vecs, empty_vecs, "vec", "doc_id", dim=4, m=2, k_codes=4
    ).collect() == []


def test_decontaminate_embedding_empty_eval(spark, empty_vecs):
    from datamine_v2_0_spark.operators.semantic import decontaminate_by_embedding as decontaminate_embedding

    train = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "doc_id long, vec array<double>"
    )
    out = decontaminate_embedding(train, empty_vecs, "vec", "doc_id", 0.9)
    assert out.collect() == []


def test_assign_to_centroids_no_centroids(spark, empty_vecs):
    from datamine_v2_0_spark.operators.semantic import (
        assign_to_centroids, semantic_neardup_pairs,
    )

    out = assign_to_centroids(empty_vecs, "vec", [])
    assert out.collect() == []
    assert semantic_neardup_pairs(
        empty_vecs, "vec", "doc_id", n_clusters=4, threshold=0.9
    ).collect() == []


def test_ivf_topk_single_row_corpus(spark):
    """KMeans k must cap at the corpus row count: a 1-row corpus with
    n_cells=8 fits k=1 instead of raising (the 1-row sweep's find)."""
    from datamine_v2_0_spark.operators.similarity import ivf_topk

    one = spark.createDataFrame([(1, [1.0, 0.0])], "doc_id long, vec array<double>")
    q = spark.createDataFrame([(9, [1.0, 0.1])], "doc_id long, vec array<double>")
    rows = ivf_topk(one, q, "vec", "doc_id", dim=2, n_cells=8).collect()
    assert len(rows) == 1 and rows[0]["neighbor_id"] == 1


def test_null_vectors_skipped_everywhere(spark):
    """NULL embeddings (half-written upstream rows) are dropped, not
    crashed on: every vector operator must return the same result as on
    the NULL-free frame (the all-NULL-payload sweep's find)."""
    from datamine_v2_0_spark.operators.dedup import embedding_neardup_pairs
    from datamine_v2_0_spark.operators.semantic import semantic_neardup_pairs
    from datamine_v2_0_spark.operators.similarity import ivf_topk, lsh_topk

    clean = [(1, [1.0, 0.0]), (2, [0.99, 0.14]), (3, [0.0, 1.0])]
    dirty = clean + [(4, None), (5, None)]
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, vec array<double>"
    )
    for fn in (
        lambda df: embedding_neardup_pairs(
            df, "vec", "doc_id", dim=2, threshold=0.9, num_planes=4, bands=2
        ),
        lambda df: semantic_neardup_pairs(
            df, "vec", "doc_id", n_clusters=2, threshold=0.9
        ),
        lambda df: lsh_topk(df, df, "vec", "doc_id", dim=2, num_planes=4, bands=2),
        lambda df: ivf_topk(df, df, "vec", "doc_id", dim=2, n_cells=2),
    ):
        want = sorted(map(tuple, fn(mk(clean)).collect()))
        got = sorted(map(tuple, fn(mk(dirty)).collect()))
        assert got == want


def test_grouped_tdigest_null_date_key(spark):
    """A NULL date group key round-trips through the Arrow boundary
    (pandas renders it NaT; the kernel must hand Arrow a real None)."""
    from datamine_v2_0_spark.operators.sketches import grouped_tdigest

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0)], "d date, v double"
    )
    rows = grouped_tdigest(df, ["d"], "v", max_centroids=10).collect()
    assert len(rows) == 1 and rows[0]["d"] is None and rows[0]["n"] == 2


def test_ivf_topk_all_identical_vectors(spark):
    """An all-identical corpus breaks MLlib's k-means|| init (its
    aggregator throws ArrayIndexOutOfBounds when fewer than k distinct
    centers exist) — ivf_topk must fall back to the single-cell layout
    and still return exact results (the all-identical sweep's find)."""
    from datamine_v2_0_spark.operators.similarity import ivf_topk

    corpus = spark.createDataFrame(
        [(i, [0.5] * 64) for i in range(50)], "doc_id long, vec array<double>"
    )
    q = corpus.limit(2)
    rows = ivf_topk(corpus, q, "vec", "doc_id", dim=64, n_cells=8, k=3).collect()
    assert len(rows) == 6  # 2 queries x top-3
    assert all(r["cos_sim"] == 1.0 for r in rows)


def test_collapsed_posting_ops_degenerate_inputs(spark):
    """The round-8 collapsed paths (bm25 / jaccard / containment) must
    survive empty and single-row corpora in every collapse mode — the
    empty-ingest-day contract the whole registry holds."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.operators import retrieval as rt

    empty = spark.createDataFrame([], "doc_id long, text string")
    one = spark.createDataFrame([(1, "alpha beta gamma delta")],
                                "doc_id long, text string")
    q_empty = spark.createDataFrame([], "qid long, qtext string")
    q_one = spark.createDataFrame([(0, "alpha beta")], "qid long, qtext string")

    for mode in ("auto", "always", "never"):
        for corpus, queries in ((empty, q_one), (one, q_empty), (one, q_one)):
            assert rt.bm25_topk(
                corpus, queries, "text", "doc_id", "qtext", "qid",
                k=3, duplicate_collapse=mode,
            ).count() >= 0
        for corpus in (empty, one):
            assert dd.jaccard_pairs_inverted(
                corpus, "text", "doc_id", duplicate_collapse=mode
            ).count() == 0
            assert dd.containment_pairs_inverted(
                corpus, "text", "doc_id", duplicate_collapse=mode
            ).count() == 0
            assert dd.jaccard_pairs_inverted(
                corpus, "text", "doc_id", max_shingle_freq=2,
                duplicate_collapse=mode,
            ).count() == 0


def test_collapsed_posting_ops_all_identical_corpus(spark):
    """All-identical corpus: one representative group holds everything.
    Jaccard must emit every pair at exactly 1.0; bm25 must rank all
    twins of the probe's match set deterministically."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.operators import retrieval as rt

    docs = spark.createDataFrame(
        [(i, "same exact words repeated here") for i in range(10)],
        "doc_id long, text string",
    )
    pairs = dd.jaccard_pairs_inverted(
        docs, "text", "doc_id", duplicate_collapse="always"
    ).collect()
    assert len(pairs) == 45  # C(10,2)
    assert all(r["jaccard"] == 1.0 for r in pairs)
    q = spark.createDataFrame([(0, "same words")], "qid long, qtext string")
    rows = rt.bm25_topk(
        docs, q, "text", "doc_id", "qtext", "qid", k=4,
        duplicate_collapse="always",
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3]  # id tiebreak
    assert len({r["score"] for r in rows}) == 1
