"""Sparse lexical retrieval (BM25) over a document corpus.

Training-data pipelines use lexical retrieval constantly: pulling the
nearest training documents to an eval probe (contamination audits), mining
hard negatives, and quality-weighted corpus sampling. This is the
inverted-index counterpart of the dense-ANN operators in
``operators/similarity.py``.

BM25 (Robertson/Spärck Jones probabilistic relevance framework; the
``k1``/``b`` parameterization and the non-negative ``ln(1 + ...)`` idf are
the Lucene variant) is fully declarative here — the whole operator is
Column algebra that Catalyst keeps inside whole-stage codegen:

    scan → explode tokens → per-(doc, term) TF   [1 shuffle on (doc, term)]
         → doc length + corpus avgdl             [narrow re-aggs of TF]
         → per-term document frequency → idf     [1 shuffle on term]
         → broadcast the (small) query-term set  [map-side semi filter]
         → score matching postings → per-query top-k window

The broadcast of the query terms is the scale pivot: the posting join
filters the corpus down to query-matching (doc, term) rows BEFORE the
idf/doclen joins, so at 100 TB only the touched slice of the inverted
index ever shuffles into the scoring joins. Candidate generation is an
equality join on ``term`` — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datamine_v2_0_spark.operators.dedup import normalize_text


def _tokens(df: DataFrame, text_col: str, id_col: str, out: str) -> DataFrame:
    """(id, term) posting rows; normalization shared with the dedup/tfidf
    family so fingerprints and indexes agree on tokenization."""
    return (
        df.select(F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(out))
        .filter(F.col(out) != "")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str,
    query_id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 documents per query: (query_id, doc_id, score, rank).

    ``queries`` is expected to be small relative to the corpus (probes,
    eval sets) and is broadcast; ``docs`` is the 100 TB side. Scores are
    rounded to ``round_to`` decimals BEFORE ranking so ties break on
    ``doc_id`` identically across engines (same recipe as tfidf_top_terms).

    Reference parity: the reference has no retrieval operator — this is
    part of the beyond-reference LLM-data surface (SURVEY.md §2 extension),
    built per Robertson et al., "Okapi at TREC-3" (1994).
    """
    from datamine_v2_0_spark.operators.dedup import _spread

    tok = _tokens(_spread(docs), text_col, id_col, "term")
    # the TF table is the inverted index: dl, dfreq, corpus stats, and the
    # posting join all branch from it. Catalyst gets no exchange reuse
    # across those branches (different downstream groupings), so without
    # materialization the corpus scan+tokenize+TF shuffle runs 4x (plan-
    # audited: 5 scans, 0 ReusedExchange). Build the index ONCE.
    tf = (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    # doc length = sum of term frequencies; re-agg of tf, not a new scan
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    # distinct query terms (BM25 query-side tf saturates to presence here)
    qterms = (
        _tokens(queries, query_text_col, query_id_col, "term")
        .select(F.col(query_id_col).alias("query_id"), "term")
        .distinct()
    )
    # broadcast-semi the postings FIRST: everything downstream sees only
    # the query-matching slice of the inverted index
    matched = tf.join(F.broadcast(qterms), "term")
    scored = (
        matched.join(idf, "term")
        .join(dl, id_col)
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            (
                F.col("idf")
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("score"), round_to).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked: "list[DataFrame]",
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists into one hybrid
    top-k: score(d) = Σ_lists 1/(c + rank_d) (Cormack/Clarke/Büttcher
    RRF, the standard lexical+dense hybrid-retrieval merge). Each input
    holds (query_col, id_col, rank_col) with ranks from 1; a document
    missing from a list simply contributes nothing for it.

    The fusion is rank-only — scores from different retrievers never mix
    scales — and fully declarative: union the lists, one hash aggregate
    on (query, doc), one per-query top-k window. Each candidate list is
    already top-k-per-query sized, so the union is bounded by
    n_queries·k·n_lists regardless of corpus size.
    """
    if not ranked:
        raise ValueError("ranked lists must be non-empty")
    contribs = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col))).alias("__contrib"),
        )
        for r in ranked
    ]
    from datamine_v2_0_spark.operators.sets import union_all

    u = union_all(contribs)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__contrib"), round_to).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
