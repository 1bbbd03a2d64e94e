"""ANN similarity + multimodal contract queries + oracles.

Split out of the monolithic contract.py (r3 verdict: no file > ~800
lines); registry order lives in contract.py and is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamine_v2_0_spark.functions.scalars import (
    bool_from_text,
    clamp,
    device_date,
    json_string_literal,
    null_if_outside,
    parse_position,
    pg_timestamptz_text,
    raw_event_hash_id,
    validate_json,
)
from datamine_v2_0_spark.operators import aggregates as agg
from datamine_v2_0_spark.operators import bpe
from datamine_v2_0_spark.operators import dedup as dd
from datamine_v2_0_spark.operators import filters as flt
from datamine_v2_0_spark.operators import joins as jn
from datamine_v2_0_spark.operators import sets as st
from datamine_v2_0_spark.operators import similarity as sim
from datamine_v2_0_spark.operators import smoothing as sm
from datamine_v2_0_spark.operators import text as tx
from datamine_v2_0_spark.operators import windows as win
from datamine_v2_0_spark.operators.joins import resolve_priority
from datamine_v2_0_spark.pipeline import cpd
from datamine_v2_0_spark.pipeline.curation import curate_corpus
from datamine_v2_0_spark.pipeline.features import build_features
from datamine_v2_0_spark.pipeline.silver import silver_transform
from datamine_v2_0_spark.queries.base import (  # noqa: F401
    _PG_TS_SQL,
    _events_window,
    _t,
)


def q_sim_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.cosine_topk(emb, queries, "embedding", "vec_id", k=5)

SQL_SIM_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 5)
SELECT q.query_id, e.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> q.query_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q.query_id
    ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qe AS DOUBLE[])), 6) DESC,
             e.vec_id) <= 5
"""

def q_sim_bucketed_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.bucketed_topk(emb, queries, "embedding", "vec_id", "label", k=3)

SQL_SIM_BUCKETED_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label
           FROM embeddings ORDER BY vec_id LIMIT 5)
SELECT q.query_id, e.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e JOIN q ON e.label = q.label
WHERE e.vec_id <> q.query_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q.query_id
    ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qe AS DOUBLE[])), 6) DESC,
             e.vec_id) <= 3
"""

def q_sim_lsh_topk(spark, sf_dir):
    """Multi-probe LSH ANN, oracle-checked against the exact top-k SQL:
    at probe depth 3 the candidate set provably contains every true
    neighbor on this fixture (recall 1.0 at sf0.001 and sf0.01, measured
    in test_lsh_topk_recall), so the approximate result coincides with
    the exact one and can share its oracle. Hyperplanes are seeded —
    the plan is deterministic."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.lsh_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5, probe=3
    )

def q_sim_pq_topk(spark, sf_dir):
    """Two-stage product-quantization ANN (the FAISS IndexPQ shape):
    spherical PQ codebooks (16 subspaces × 32 centroids, seeded) encode
    the corpus to 16-code rows, the ADC scan shortlists 100 candidates
    per query with m lookups each, and only the shortlist joins back to
    full vectors for the exact cosine re-rank. At this operating point
    the shortlist provably contains the exact top-5 (hash-checked
    against the exact-SQL oracle) — the candidates→exact-verify
    certification the LSH and IVF tiers already use; recall@5 vs
    shortlist size is measured in test_pq_rerank_recall."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    # shortlist depth scales with corpus size (10%, floor 100): a fixed
    # depth that certifies at sf0.01 starts missing tail entries of the
    # exact top-5 by sf0.1 (measured: 100 misses 1-of-25 at 2000 vecs,
    # 200 is exact). Round 10: the operator's default representative
    # collapse makes the depth count DISTINCT vectors, so mass-duplicate
    # corpora (the skew replica's 200 identical embeddings) no longer
    # clog the shortlist — the round-10 skewed recall run measured the
    # direct form at 0.95 recall@5 here vs 1.0 collapsed (ANN.md).
    rerank_from = max(100, emb.count() // 10)
    return sim.pq_rerank_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5,
        m=16, k_codes=32, rerank_from=rerank_from,
    )

def q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN with a learned (seeded KMeans) coarse quantizer. Probing
    every cell makes the result provably equal to the exact top-k — the
    cells partition the corpus — so the exact SQL oracle applies without
    any recall measurement, while the plan still runs the full IVF
    machinery (fit, cell assignment, probe equi-join, per-cell scan).
    The nprobe < n_cells scan-fraction trade-off is exercised in
    test_ivf_topk (the fixture's uniform vectors have no cluster
    structure, so partial-probe recall there is data-limited)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return sim.ivf_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=5,
        n_cells=8, nprobe=8,
    )

def q_mm_features(spark, sf_dir):
    from datamine_v2_0_spark.operators import multimodal as mm

    media = mm.media_table_from_documents(_t(spark, sf_dir, "documents"))
    out = mm.extract_media_features(media)
    return out.select("media_id", "media_type", "n_bytes", "content_sha256")

SQL_MM_FEATURES = """
SELECT doc_id AS media_id, 'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha256
FROM documents
"""

def q_mm_frames(spark, sf_dir):
    """Frame sampling over media payloads (mapInPandas one-row-in /
    many-rows-out): every 2nd 64-char frame."""
    from datamine_v2_0_spark.operators import multimodal as mm

    media = mm.media_table_from_documents(_t(spark, sf_dir, "documents"))
    return mm.sample_frames(media, frame_size=64, every=2)

SQL_MM_FRAMES = """
WITH m AS (
  SELECT doc_id AS media_id, text AS payload,
         CAST(ceil(len(text) / 64.0) AS BIGINT) AS n_frames
  FROM documents WHERE len(text) > 0
)
SELECT media_id, i AS frame_idx,
       substr(payload, CAST(i * 64 + 1 AS BIGINT), 64) AS frame_payload,
       n_frames
FROM m, unnest(generate_series(0, n_frames - 1, 2)) AS t(i)
"""
