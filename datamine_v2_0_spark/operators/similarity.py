"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard ANN playbook:
- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Dot products are JVM-side (`zip_with` + `aggregate`), ranking is a
  window rank over (query, candidate) pairs.
- `lsh_topk`: random-hyperplane LSH (Charikar 2002) — sign-bit signatures
  bucket the corpus; only same-bucket pairs are scored. This is the
  100 TB path: candidate generation is an equi join on the bucket key,
  never all-pairs.

The hyperplanes are deterministic (seeded NumPy), generated driver-side
(KB of data), and inlined as literals — the same pattern as broadcasting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs_udf():
    """Vectorized pair-cosine: one numpy einsum per Arrow batch.

    Spark's higher-order functions (`zip_with`/`aggregate`) are
    interpreted per element — on a candidate-pair table they cost
    ~dim interpreted ops per row. This computes a whole batch with
    three einsums; use it wherever the pair table is the hot path."""

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
            np.einsum("ij,ij->i", B, B)
        )
        return pd.Series(num / den)

    return _cos


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); the corpus streams map-side, so the
    only shuffle is the per-query top-k window. Scores are rounded before
    ranking (with id tiebreak) for cross-engine determinism.

    Returns (query_id, neighbor_id, cos_sim) excluding self-matches."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    pairs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).crossJoin(q)
    scored = pairs.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), round_to).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    bucket_col: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """IVF-style partitioned ANN: score only candidates in the query's
    bucket (a coarse-quantizer cell / cluster id). The probe is an equi
    join on the bucket key — the canonical 100 TB layout: partition the
    corpus by bucket, broadcast the queries, never all-pairs."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col(bucket_col).alias("__bkt"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.col(bucket_col).alias("__bkt"),
        )
    )
    pairs = c.join(q, "__bkt").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), round_to).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 3,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer: KMeans cells partition
    the corpus, each query probes its ``nprobe`` nearest centroids, and
    only same-cell candidates are scored — the canonical
    inverted-file layout (`bucketed_topk` is the same plan with a
    user-supplied cell column). The probe join is an equi join on the
    cell id: at scale the corpus is partitioned/bucketed by cell once
    and queries broadcast, never all-pairs.

    ``nprobe = n_cells`` probes every cell, which is provably exact
    (the cells partition the corpus) while keeping the IVF plan shape;
    smaller nprobe trades recall for a ~nprobe/n_cells scan fraction.
    KMeans is seeded — the cell assignment (and thus the result) is
    deterministic for a fixed corpus.

    Vectors are L2-normalized before clustering and probing (spherical
    quantization): cosine ranking equals Euclidean ranking on the unit
    sphere, so cells align with cosine neighborhoods — without this,
    Euclidean cells on unnormalized data fragment each query's cosine
    neighborhood across many cells and recall collapses."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: x / F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda a, v: a + v * v,
            )
        ),
    )
    va = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        array_to_vector(unit).alias("__mlvec"),
    )
    km = KMeans(
        k=n_cells, seed=seed, featuresCol="__mlvec", predictionCol="__cell"
    )
    model = km.fit(va)
    cells = model.transform(va).select("neighbor_id", "__cvec", "__cell")

    C = np.array([np.asarray(c) for c in model.clusterCenters()])  # (n_cells, dim)
    probe = min(nprobe, len(C))

    @pandas_udf("array<int>")
    def _probe_cells(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)          # (n, dim)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        M = M / np.where(norms == 0, 1.0, norms)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :probe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(_probe_cells(F.col(vec_col))).alias("__cell"),
    )
    pairs = cells.join(F.broadcast(q), "__cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), round_to).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_signature(
    vec: Column, planes: np.ndarray
) -> Column:
    """Sign-bit LSH signature: one bit per hyperplane, packed into a long.
    `planes` is (num_planes<=63, dim)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + F.shiftleft(bit, i)
    return sig


def make_hyperplanes(dim: int, num_planes: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((num_planes, dim))


def banded_keys_udf(planes: np.ndarray, bands: int):
    """Vectorized band-key computation: ONE numpy matmul per Arrow batch
    instead of num_planes interpreted dot-product expressions per row
    (Spark higher-order functions don't participate in codegen — the
    expression form was ~50× slower). Returns array<long>, one key per
    band; pair with posexplode for the (band, key) join."""
    r = len(planes) // bands
    P = planes[: bands * r].T.astype(np.float64)          # (dim, bands*r)
    weights = (1 << np.arange(r)).astype(np.int64)

    @pandas_udf("array<long>")
    def _keys(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)        # (n, dim)
        bits = (M @ P) >= 0                               # (n, bands*r)
        ks = np.stack(
            [bits[:, b * r : (b + 1) * r] @ weights for b in range(bands)],
            axis=1,
        )                                                 # (n, bands)
        return pd.Series(list(ks))

    return _keys


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 5,
    num_planes: int = 24,
    bands: int = 8,
    seed: int = 42,
    round_to: int = 6,
    probe: int = 0,
) -> DataFrame:
    """Approximate top-k via banded random-hyperplane LSH: candidates are
    corpus vectors sharing >=1 of the query's band buckets. The join is an
    equi join on (band, key) — the scale path; tune recall/cost with
    (num_planes, bands): more bits per band → smaller buckets, more bands
    → more probes. 24 planes / 8 bands (3 bits per band) hit ~0.84
    recall@5 on the sf0.01 embeddings fixture; with multi-probe
    ``probe=3`` recall is 1.0 there (see test_lsh_topk_recall).

    ``probe``: multi-probe depth — additionally look up each query band
    key with bit j flipped, for j < probe (the classic multi-probe LSH
    trick: a near He miss usually differs by exactly one close-to-margin
    bit). Probing is QUERY-side only, so it multiplies the tiny broadcast
    side by (1+probe) and leaves the corpus-side index untouched."""
    planes = make_hyperplanes(dim, num_planes, seed)
    keys = banded_keys_udf(planes, bands)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.posexplode(keys(F.col(vec_col))).alias("__band", "__key"),
    )
    q_exact = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.posexplode(keys(F.col(vec_col))).alias("__band", "__key"),
    )
    if probe > 0:
        r = num_planes // bands
        variants = F.array(
            F.col("__key"),
            *[
                F.col("__key").bitwiseXOR(F.lit(1 << j))
                for j in range(min(probe, r))
            ],
        )
        q_exact = q_exact.select(
            "query_id", "__qvec", "__band",
            F.explode(variants).alias("__key"),
        )
    q = F.broadcast(q_exact)
    # score BEFORE the dedup shuffle: the band join is broadcast
    # (map-side), so computing cosine right there means the distinct
    # shuffles 3 narrow columns instead of two dim-wide float vectors
    # per candidate hit — cos_sim is deterministic per pair, so
    # distinct-on-(pair, score) equals distinct-on-pair
    scored = (
        c.join(q, ["__band", "__key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__cvec"), F.col("__qvec")), round_to
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
