"""Deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — the four
standard document-dedup families (Broder 1997 resemblance/minhash; Charikar
2002 simhash; banded LSH per Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch.3), plus embedding-cosine near-dup. Exact/Jaccard paths are
pure JVM-side Column algebra; the per-doc signature kernels (MinHash,
pair-cosine) are fused Arrow-batched numpy UDFs — Spark's higher-order
functions are interpreted per element, so a single vectorized eval node
beats a 64-transform expression tree. Either way a stage is one shuffle
(the groupBy on hash / band bucket).

Candidate generation NEVER does all-pairs: pairs come from equality
buckets (exact hash or LSH band bucket), so the join is an equi shuffle
join on the bucket key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from datamine_v2_0_spark.operators.ckpt import iter_checkpoint


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_hash(col: Column) -> Column:
    """sha256 of the normalized text — the exact-dedup key."""
    return F.sha2(normalize_text(col), 256)


def _spread(df: DataFrame) -> DataFrame:
    """Give compute-bound narrow stages full cluster parallelism.

    A small corpus parquet arrives as ONE input split (file size <
    ``maxPartitionBytes``), so the expensive per-doc stage downstream
    (shingling, signature kernels) runs on a single core — measured 32×
    under-parallelized on local[32]. If the scan yields fewer partitions
    than half the target parallelism, round-robin repartition; at real
    scale inputs already carry ≫ target splits and this is a no-op (no
    shuffle inserted). The target comes from _plan_parallelism (the
    configured shuffle partitioning, max'd with defaultParallelism) —
    the instantaneous executor count under-spreads before dynamic
    allocation registers executors, the same hazard the pair-family
    crossover had (round-9 ADVICE)."""
    target = _plan_parallelism(df.sparkSession)
    if df.rdd.getNumPartitions() < max(1, target // 2):
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-duplicate removal: keep the lowest id per content hash.

    ONE shuffle and ONE computation of the input: rank-1 per hash via a
    window instead of groupBy-min + semi join. The join form computes
    the upstream lineage twice (once per join branch) — ruinous when the
    input is itself an unmaterialized transform chain — and pays a
    second exchange; the window pays the same hash exchange once and
    its sort-within-partition is over tiny per-hash groups. AQE handles
    bucket skew (e.g. empty docs)."""
    from pyspark.sql import Window

    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h", content_hash(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def word_shingles_from_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED words-array
    column: sliding windows via transform(sequence(...)).

    ``words`` MUST be a projected column (same contract as
    :func:`hashed_shingles_from_words` / :func:`minhash_signature`):
    the transform lambda references ``words`` per gram index, and an
    inline expression there re-evaluates its whole subtree — for the
    normalize+split pipeline that measured ~28 ms/doc (one regexp +
    split per shingle) vs ~0.4 ms/doc through a projected column."""
    k = F.size(words) - F.lit(n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return F.array_distinct(grams)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>, JVM-side.

    Convenience one-expression form. HOT PATHS must not use this:
    the split+normalize lands inside the transform lambda and is
    re-evaluated once per gram (O(words) regexp passes per doc) —
    project the words array first and call
    :func:`word_shingles_from_words` on the column."""
    return word_shingles_from_words(F.split(normalize_text(col), " "), n)


def _rehash(i: int):
    # i-th MinHash function: xxhash64 of (base_hash, i) — fixed-width
    # native hashing of an 8-byte value, no per-function pass over the
    # text, and no long arithmetic (ANSI mode throws on wraparound).
    return lambda h: F.xxhash64(h, F.lit(i))


def shingle_hashes(shingles: Column) -> Column:
    """Base 64-bit hash per distinct shingle (computed once per doc)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def word_hashes(col: Column) -> Column:
    """xxhash64 per word of the normalized text — the base layer for
    hashed shingling."""
    return F.transform(F.split(normalize_text(col), " "), lambda w: F.xxhash64(w))


def hashed_shingles_from_words(wh: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle hashes composed from word hashes:
    ``xxhash64(wh[i], …, wh[i+n-1])`` — never materializes shingle strings
    (string slice+join was ~half the MinHash cost).

    ``wh`` MUST be a projected column (e.g. from :func:`word_hashes` in a
    prior select): referencing an inline expression would re-evaluate the
    word-hash array once per gram (O(words²))."""
    k = F.size(wh) - F.lit(n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.xxhash64(*[F.get(wh, i + j) for j in range(n)])
    )
    return F.array_distinct(grams)


def minhash_signature(hashes: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from precomputed shingle hashes: per hash function
    i, min over shingles of ``xxhash64(h, i)``. Empty sets → nulls.

    Callers MUST materialize ``hashes`` as its own projected column first
    (e.g. ``.select(..., shingle_hashes(...).alias("__h"))``): referencing
    an inline expression here would duplicate the whole shingle pipeline
    into each of the num_hashes branches (Catalyst's CollapseProject keeps
    a multiply-referenced non-cheap alias materialized, so the two-step
    select is what makes this single-pass)."""
    sigs = [
        F.array_min(F.transform(hashes, _rehash(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_text_udf(num_hashes: int = 64, shingle_n: int = 3):
    """Fused text→MinHash-signature pandas UDF: normalize, word-hash
    (crc32), compose n-gram shingle hashes, dedup, splitmix64 ×
    num_hashes min — all inside one Arrow batch.

    Versus the layered Column pipeline (regexp → split → transform ×
    xxhash → shingle transform → 64 rehash transforms), this collapses
    an enormous interpreted/codegen expression tree into one Python
    eval node: ~2× faster steady-state and much cheaper to plan/compile,
    which dominates one-shot query latency. Same API contract, different
    (still deterministic, seed-free) hash family.

    The returned UDF is marked ``asNondeterministic()`` — the kernel is
    pure, but the marker pins ONE evaluation per row (filter pushdown
    otherwise re-evaluates the UDF below the exchange: two
    ArrowEvalPython nodes, the kernel run twice per doc). Consequence
    for callers: Spark only allows nondeterministic expressions in
    Project / Filter / Aggregate / Window, so use the UDF in a
    projection and reference the result column in joins or grouping
    keys — embedding the call directly in a join condition raises
    AnalysisException."""
    import zlib

    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xBF58476D1CE4E5B9)
    C3 = np.uint64(0x94D049BB133111EB)
    offs = np.arange(1, num_hashes + 1, dtype=np.uint64) * C1
    # odd multipliers positionally mix the word hashes inside a shingle
    wmul = (C2 * np.arange(1, shingle_n + 1, dtype=np.uint64)) | np.uint64(1)

    def _mix(z: np.ndarray) -> np.ndarray:
        z = (z ^ (z >> np.uint64(30))) * C2
        z = (z ^ (z >> np.uint64(27))) * C3
        return z ^ (z >> np.uint64(31))

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        empty = [None] * num_hashes
        norm = (
            texts.fillna("")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        out = []
        with np.errstate(over="ignore"):
            for doc in norm:
                words = doc.split(" ") if doc else []
                if len(words) < shingle_n:
                    out.append(empty)
                    continue
                wh = np.array(
                    [zlib.crc32(w.encode("utf-8")) for w in words],
                    dtype=np.uint64,
                )
                sh = np.zeros(len(words) - shingle_n + 1, dtype=np.uint64)
                for j in range(shingle_n):
                    sh += wmul[j] * wh[j : len(wh) - shingle_n + 1 + j]
                sh = np.unique(_mix(sh))
                z = _mix(sh[:, None] + offs)
                out.append(z.min(axis=0).view(np.int64).tolist())
        return pd.Series(out)

    # asNondeterministic: the callers filter on the signature column
    # (all-null → unshingleable), and filter pushdown re-evaluates a
    # deterministic UDF below the exchange — one ArrowEvalPython for the
    # pushed filter, a second for the projection (guide §4.4 shape;
    # plan-audited: dedup_minhash_lsh ran the signature kernel TWICE per
    # doc). The kernel is pure; the marker only pins a single evaluation.
    return _sig.asNondeterministic()


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of (band_id, band_hash) structs. Docs
    sharing ANY band bucket are candidate pairs (banding amplifies the
    Jaccard s-curve: P(candidate) = 1-(1-s^r)^b)."""
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return F.array(*entries)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Plan shape: scan → signature (map-only) → explode bands → self equi-join
    on (band, bucket) → distinct pairs. The join key is the band bucket, so
    this is shuffle-on-bucket — never a cross join. Returns (id_a, id_b)
    with id_a < id_b."""
    df = _spread(df)
    sig_udf = minhash_text_udf(num_hashes, shingle_n)
    sig = df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("__sig"))
    # docs too short to shingle get an all-null signature; they can't be
    # MinHash near-dups of anything, and left in they'd all share the
    # same (null-skipping) band buckets — a quadratic false-pair blowup
    # on corpora with many tiny docs
    sig = sig.filter(F.get(F.col("__sig"), 0).isNotNull())
    rows_per_band = num_hashes // bands
    banded = sig.select(
        F.col(id_col),
        F.explode(lsh_bands(F.col("__sig"), bands, rows_per_band)).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    # pairs come from grouping each (band, bucket) and expanding in-bucket
    # combinations with higher-order functions — NOT a banded self-join:
    # the join form scans the corpus and evaluates the signature UDF TWICE
    # (once per side) and shuffles both copies; this form is one UDF pass
    # and one shuffle. Bucket pair-count is quadratic in bucket size either
    # way — that's the LSH operating point's job to keep small.
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    n = F.size("__ids")
    pairs = F.flatten(
        F.transform(
            "__ids",
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.0,
    reliable: bool = False,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity
    (JVM-side array_intersect/array_union on hashed shingle arrays —
    64-bit collisions are negligible vs string sets and ~2× cheaper).

    Only docs that appear in a candidate pair are shingled: the semi
    join prunes the (expensive, map-side) shingle computation to the
    candidate set, which LSH already shrank by orders of magnitude —
    at corpus scale verifying is proportional to candidates, not docs."""
    # the candidate plan is referenced three times (both union arms and
    # the pair join) — checkpoint it so LSH candidate generation runs
    # once, not three times (it's the expensive upstream)
    candidates = iter_checkpoint(candidates, reliable)
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = docs.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), word_hashes(F.col(text_col)).alias("__wh")
    ).select(
        F.col(id_col),
        hashed_shingles_from_words(F.col("__wh"), shingle_n).alias("__sh"),
    )
    out = (
        candidates.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )
    return out.filter(F.col("jaccard") >= threshold)


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.2,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    round_to: int = 6,
    duplicate_collapse: str = "auto",
    dup_stats: tuple[int, float, int] | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Banded MinHash-LSH candidates → exact n-gram Jaccard verify, with
    the adaptive representative collapse (see
    :func:`jaccard_pairs_inverted` — same ``duplicate_collapse``
    contract, result-exact on every input). Unlike the posting-join
    family, ``auto`` here collapses on the MAX-GROUP statistic
    (``PAIR_COLLAPSE_BETA`` break-even), not the ratio or total
    blowup: LSH banding is linear in n and in-bucket verify
    parallelizes across groups, so even 16x uniform duplication
    measured 1.7x faster direct — but one mega group's |g|² candidate
    pairs land in a single band bucket (one task, serial), which is
    where the 40%-viral corpus measured 5x collapse-wins
    (SCALING.md, tools/collapse_band.py).

    Why the composed operator exists: on a duplicate-heavy corpus every
    member of an exact-duplicate group lands in the same band buckets
    (signatures are functions of the normalized text), so the candidate
    set contains all |group|² member pairs AND each pays a full
    shingle-set intersection in the verify — the skewed-replica bench
    measured 13× time under a 1.66 docs-per-distinct corpus. Collapsed,
    LSH + verify run on one representative per distinct text, verified
    rep pairs fan out to member pairs (signatures and Jaccard scores
    are text-determined, so member candidacy ⟺ rep candidacy and the
    scores carry over), and within-group pairs are emitted in closed
    form at Jaccard 1.0 — only for groups whose text shingles at all,
    matching the direct path, where a signature-less doc never pairs.
    Only the (inherently output-sized) fan-out scales with duplication.

    ``dup_stats``: precomputed probe tuple (see :func:`dup_stats`) so
    composed flows pay one probe across operators; ``reliable``: durable
    lineage truncation (see :func:`_rep_groups` / ckpt.iter_checkpoint).
    Probe results are cached per (session, plan, column): if this session OVERWRITES the files behind ``df`` and re-runs on an identical plan, call :func:`clear_dup_stats_cache` first or the auto switch plans from stale stats (plan choice only — both plans are result-exact).
    """
    df = _spread(df)
    if _resolve_pair_collapse(
        df, text_col, duplicate_collapse, stats=dup_stats, id_col=id_col
    ):
        return _minhash_near_dup_collapsed(
            df, text_col, id_col, threshold, num_hashes, bands,
            shingle_n, round_to, reliable,
        )
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    out = ngram_jaccard_pairs(
        cands, df, text_col, id_col, shingle_n, threshold, reliable=reliable
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", round_to).alias("jaccard")
    )


def _minhash_near_dup_collapsed(
    df, text_col, id_col, threshold, num_hashes, bands, shingle_n, round_to,
    reliable=False,
) -> DataFrame:
    """Representative-collapsed LSH near-dup (see minhash_near_dup_pairs)."""
    fpmap, groups, members = _rep_groups(df, text_col, id_col, reliable)
    reps = df.join(groups.select(F.col("__rep").alias(id_col)), id_col)
    cands = minhash_lsh_candidates(
        reps, text_col, id_col, num_hashes, bands, shingle_n
    )
    rep_pairs = ngram_jaccard_pairs(
        cands, reps, text_col, id_col, shingle_n, threshold,
        reliable=reliable,
    ).select("id_a", "id_b", F.round("jaccard", round_to).alias("jaccard"))
    ma = members.select(F.col("__rep").alias("id_a"), F.col("__m").alias("__ma"))
    mb = members.select(F.col("__rep").alias("id_b"), F.col("__m").alias("__mb"))
    cross = rep_pairs.join(ma, "id_a").join(mb, "id_b").select(
        F.least("__ma", "__mb").alias("id_a"),
        F.greatest("__ma", "__mb").alias("id_b"),
        "jaccard",
    )
    if threshold > 1.0:
        return cross
    # within-group pairs: identical texts, exact Jaccard 1.0 — emitted
    # only when the group's text produces >=1 shingle (the direct path's
    # all-null-signature filter drops shingle-less docs from banding)
    # shingle-eligibility without building grams: >=1 n-gram shingle
    # exists iff the normalized words array has >= n elements
    elig = reps.select(
        F.col(id_col).alias("__rep"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") >= shingle_n).select("__rep")
    m1 = members.join(elig, "__rep").select(
        "__rep", F.col("__m").alias("id_a")
    )
    m2 = members.select("__rep", F.col("__m").alias("id_b"))
    within = (
        m1.join(m2, "__rep")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


def _estimate_duplication(df: DataFrame, text_col: str, ratio: float) -> bool:
    """One narrow scan deciding the collapse switch: raw-byte xxhash64
    (no normalization pass) is enough for a docs-per-distinct-text ratio
    estimate — crawl duplicates are byte-identical."""
    probe = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.xxhash64(F.col(text_col))).alias("nd"),
    ).first()
    return probe["n"] >= ratio * max(probe["nd"], 1)


def _dup_blowup(df: DataFrame, text_col: str) -> float:
    """Exact candidate-pair blowup factor: Σ|group|² / n over raw-byte
    xxhash64 duplicate groups — the expected duplicate-group size seen
    by a random document, i.e. the factor by which exact duplication
    multiplies per-pair candidate/verify work in a bucketed pipeline.

    The docs-per-distinct RATIO cannot drive the pair-family collapse
    switch because it is blind to group-size CONCENTRATION: a 4x
    uniform-duplicate corpus (ratio 4.0, blowup 4 — tiny groups, the
    direct path's per-pair work stays trivial) measured 2.1x FASTER
    direct, while the skewed corpus (ratio 1.66, blowup 80 — one viral
    group holding 40% of docs) measured 5x faster collapsed, and a
    corpus with 1% of a billion docs on one viral text (ratio 1.01,
    blowup 10^5) NEEDS the collapse while never moving the ratio.
    Blowup orders all of these correctly; ratio orders them backwards.

    One narrow shuffle of 8-byte keys (map-side combine bounds the
    shuffle by per-partition distincts). The decision path uses this
    EXACT probe (via ``_dup_stats``) up to SAMPLED_PROBE_MIN_N docs —
    at measurable scales the full probe is noise next to the operator
    (the round-5 sampled gate measured 6× slower than the probe it was
    gating, commit 7f070f6, because it paid df.count() + a sampling
    pass on a corpus where one exact pass was already cheap). Above the
    cutoff the resolvers switch to :func:`_dup_stats_sampled` with an
    at-threshold exact fallback — calibrated decision-parity in
    tools/probe_calibration.py / SCALING.md."""
    return _dup_stats(df, text_col)[1]


# Session-scoped probe cache keyed on (session id, analyzed-plan
# semantic hash, column): composed flows (bm25 inside rrf_fuse, several
# dedup operators over the same gated corpus) each call the probe on a
# semantically identical frame, and without the cache each call pays a
# full scan of the text column. Safety: a stale entry (the one hazard —
# an external process overwriting the parquet files behind an identical
# plan mid-session) can only mis-CHOOSE a plan, never change a result —
# both physical plans are result-exact on every input by construction.
# Bounded; cleared wholesale rather than LRU-tracked (the probe is
# cheap enough that a rare full re-probe beats per-hit bookkeeping).
_DUP_STATS_CACHE: dict[tuple[int, int, str], tuple[int, float, int]] = {}
_DUP_STATS_CACHE_MAX = 256

# Sampled-probe results live in their own cache (same key) because the
# value shape differs: (min_detect_cmax the draw was sized for,
# (n, blowup_est, cmax_est)). A cached sampled entry is only reusable
# by a caller whose detection requirement is no finer than the cached
# draw's — _planning_stats checks that before sharing.
_SAMPLED_STATS_CACHE: dict[
    tuple[int, int, str], tuple[float, tuple[int, float, int]]
] = {}

# Number of probe scans actually EXECUTED this session (cache hits and
# caller-supplied stats don't count) — instrumentation for the
# probe-sharing contract (pytest asserts scan counts; the SCALING.md
# round-10 table records measured per-query scan reductions).
DUP_STATS_PROBE_RUNS = 0


def clear_dup_stats_cache() -> None:
    """Drop every cached probe result (e.g. after overwriting the files
    a live DataFrame reads, which the cache key cannot see)."""
    _DUP_STATS_CACHE.clear()
    _SAMPLED_STATS_CACHE.clear()


def dup_stats(df: DataFrame, text_col: str) -> tuple[int, float, int]:
    """Public form of the exact duplication probe: (n, blowup, cmax)
    over raw-byte xxhash64 duplicate groups of ``text_col``.

    Compose-and-share contract: a pipeline running several
    collapse-capable operators over the SAME corpus should call this
    once and pass the tuple to each operator's ``dup_stats=`` parameter
    — every ``duplicate_collapse='auto'`` resolution then reuses the one
    probe instead of re-scanning the text column per operator. (Repeat
    calls on a semantically identical DataFrame within a session hit a
    plan-keyed cache even without the parameter.)"""
    return _dup_stats(df, text_col)


def _dup_stats(df: DataFrame, text_col: str) -> tuple[int, float, int]:
    """Exact (n, blowup, cmax) over raw-byte xxhash64 duplicate groups:
    blowup = Σ|group|²/n (total candidate-work multiplier), cmax = the
    largest group (the single-task hotspot — all of one group's
    candidate pairs land in ONE bucket of a bucketed pipeline, so cmax²
    bounds the serial work no amount of executors parallelizes away).

    One narrow shuffle of (8-byte key, count) pairs with map-side
    combine — ~16 bytes/doc, vs the ≥ full-text shuffle the operator
    being planned will itself run; the probe is noise next to the cost
    of picking the wrong plan. Results are memoized per (session,
    analyzed plan, column) so multi-operator flows pay one scan — see
    :func:`dup_stats` for the caveat and :func:`clear_dup_stats_cache`."""
    global DUP_STATS_PROBE_RUNS
    key = None
    try:
        key = (id(df.sparkSession), df.semanticHash(), text_col)
    except Exception:  # pragma: no cover - Connect/analysis corner
        pass
    if key is not None and key in _DUP_STATS_CACHE:
        return _DUP_STATS_CACHE[key]
    g = df.groupBy(F.xxhash64(F.col(text_col)).alias("__h")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    r = g.agg(
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
        F.sum("__c").alias("__n"),
        F.max("__c").alias("__mx"),
    ).first()
    DUP_STATS_PROBE_RUNS += 1
    n = r["__n"] or 0
    out = (n, (r["__ss"] / n) if n else 0.0, r["__mx"] or 0)
    if key is not None:
        if len(_DUP_STATS_CACHE) >= _DUP_STATS_CACHE_MAX:
            _DUP_STATS_CACHE.clear()
        _DUP_STATS_CACHE[key] = out
    return out


def _dup_blowup_sampled(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_m: int | None = None,
) -> float:
    """Unbiased blowup estimate from a DETERMINISTIC member-level
    sample: rows with pmod(xxhash64(id), K) == 0, K sized so ~target_m
    rows survive. With per-member inclusion at rate s = 1/K,
    E[c_s(c_s-1)] = s²·c(c-1) per group, so

        blowup ≈ 1 + Σ_sample c_s(c_s-1) / (s²·n).

    Detection math (why the default target_m = max(2·10⁵, 20·√n) is
    enough at ANY corpus size): the signal is same-group sample
    collisions, E ≈ s²·n·(blowup-1)/2 = target_m²·(blowup-1)/(2n).
    With target_m = 20·√n that is 200·(blowup-1) collisions regardless
    of n — the detection floor is a CONSTANT blowup ≈ 1.25, safely
    under every family threshold, while the sample stays ≤ ~2M rows
    even at 10¹⁰ docs (0.02%). Groups that drive a large blowup
    contribute proportionally more collisions themselves, so
    concentration is exactly what samples most reliably.

    Id-hash selection keeps the probe layout- and seed-free (same
    decision on every run/replica), and samples MEMBERS independently —
    sampling whole text-groups would make the one-mega-group corpus an
    all-or-nothing coin flip. Cost: one column scan + a shuffle of only
    the sampled rows; small corpora (n ≤ 4·target_m) use the exact
    probe outright."""
    n = df.count()
    if n == 0:
        return 0.0
    if target_m is None:
        target_m = max(200_000, int(20 * n ** 0.5))
    if n <= 4 * target_m:
        return _dup_blowup(df, text_col)
    k = max(2, round(n / target_m))
    sample = df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(k)) == 0)
    g = sample.groupBy(F.xxhash64(F.col(text_col)).alias("__h")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    r = g.agg(
        F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__cc")
    ).first()
    cc = r["__cc"] or 0
    s = 1.0 / k
    return 1.0 + cc / (s * s * n)


# --- Sampled planning probe (round 11) -------------------------------------
#
# Above SAMPLED_PROBE_MIN_N docs the plan-time exact probe's full scan
# (xxhash64 of EVERY text) is the single largest planning cost left at
# 100x scale, and the collapse decisions only need (trimmed blowup,
# cmax) to ONE decision bit each. The sampled probe estimates both from
# a deterministic member-level sample and decides outright when the
# estimates sit FAR from every threshold; inside a +/-PROBE_GUARD_BAND
# multiplicative band of any threshold it falls back to the exact probe
# (the at-threshold fallback), so a decision flip requires the estimate
# to be wrong by more than the guard factor. tools/probe_calibration.py
# measures the residual flip rate at matched sampling intensity on the
# full stress band + skew/16x replicas + 16x-scaled hot bands where the
# sample genuinely estimates a mega-group cmax (85 corpus x rule cells,
# 50 genuinely sampled, 20 salted draws each — PROBE_CALIB.jsonl /
# SCALING.md): 0 flips in 1000 draws, including with the guard band
# disabled; 340 draws landed in-band and would defer to the exact probe.
#
# Detectability is the sizing rule, not a fixed rate: a constant-cmax
# ceiling (containment's 3,464) is INVISIBLE to a fixed 2M-row sample
# at n=10^10 (0.7 expected sampled members), so target_m is bumped to
# keep >= PROBE_MIN_HITS expected members in a threshold-sized group:
# the pair family's sqrt(beta*n/P) threshold needs only the default
# 20*sqrt(n) sample, while containment at n=10^10 needs a ~3% sample —
# still a 30x cut over hashing every text, and priced honestly here
# rather than silently undetected.
SAMPLED_PROBE_MIN_N = 5_000_000
PROBE_GUARD_BAND = 2.0
PROBE_MIN_HITS = 50
# target_m floor (the 20*sqrt(n) detection-math default's absolute
# minimum) — module constant so the cutoff-boundary pytest can scale
# the whole mechanism down to test-sized corpora.
SAMPLED_PROBE_TARGET_M_FLOOR = 200_000

# Executed SAMPLED probe scans this session (cache hits don't count) —
# companion to DUP_STATS_PROBE_RUNS for the probe-count plan audit.
DUP_STATS_SAMPLED_RUNS = 0


def _dup_stats_sampled(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    min_detect_cmax: float,
    target_m: int | None = None,
    salt: str | None = None,
) -> tuple[int, float, int]:
    """(n, blowup_est, cmax_est) from one deterministic member-level
    sample pass — the sampled counterpart of :func:`_dup_stats`, same
    tuple shape so the resolvers consume either.

    Estimators (inclusion rate s = 1/K, member-level id-hash sample):
    blowup_est = 1 + (sum c_s(c_s-1)) / (s^2 n) — the COLLISION form,
    unbiased since E[c_s(c_s-1)] = s^2 c(c-1), and its noise comes only
    from same-group pair collisions (a sum-of-squares form would add
    the sample-size fluctuation amplified by 1/(s^2 n), which
    calibration measured flipping decisions at low rates; the collision
    form's per-draw sigma is ~(blowup-1)/sqrt(collisions), pinned to a
    constant by the 20*sqrt(n) floor below). cmax_est = max(c_s)/s
    (multiplicative error ~1/sqrt(s*cmax), which the guard-band
    fallback in the resolvers absorbs). ``target_m`` defaults to
    max(floor, 20*sqrt(n)) — the blowup detectability term: collisions
    at the spread threshold are ~200*(blowup-1) regardless of n — and
    is raised to n*PROBE_MIN_HITS/min_detect_cmax so a group at the
    caller's smallest decision-relevant cmax keeps >= PROBE_MIN_HITS
    expected sampled members. ``salt`` perturbs the sampling hash —
    calibration tooling only (tools/probe_calibration.py sweeps salts
    to measure the flip-rate distribution); production planning is
    salt-free so every run/replica makes the same decision."""
    global DUP_STATS_SAMPLED_RUNS
    if n == 0:
        return (0, 0.0, 0)
    if target_m is None:
        target_m = max(SAMPLED_PROBE_TARGET_M_FLOOR, int(20 * n ** 0.5))
    if min_detect_cmax > 0:
        target_m = max(target_m, int(n * PROBE_MIN_HITS / min_detect_cmax) + 1)
    if n <= 4 * target_m:
        return _dup_stats(df, text_col)
    k = max(2, round(n / target_m))
    key_expr = (
        F.col(id_col)
        if salt is None
        else F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    sample = df.filter(F.pmod(F.xxhash64(key_expr), F.lit(k)) == 0)
    g = sample.groupBy(F.xxhash64(F.col(text_col)).alias("__h")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    r = g.agg(
        F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__cc"),
        F.max("__c").alias("__mx"),
    ).first()
    DUP_STATS_SAMPLED_RUNS += 1
    s = 1.0 / k
    cc = r["__cc"] or 0
    mx = r["__mx"] or 0
    blowup_est = 1.0 + cc / (s * s * n)
    cmax_est = max(1, round(mx / s)) if mx else 0
    return (n, blowup_est, cmax_est)


# Plan-estimated input bytes below which the exact probe is run
# outright, WITHOUT the standalone df.count() cutoff test (round-11
# ADVICE: every first auto resolution on a sub-cutoff corpus paid a
# count job whose answer the exact probe's own aggregation re-derives).
# The exact probe's cost is the same column scan the count pays plus a
# 16-byte/doc shuffle, so below this many scan bytes it is strictly
# cheaper to fold n discovery into the probe. A mispredict
# (pathologically compressible texts putting n > SAMPLED_PROBE_MIN_N
# under the byte gate) costs one exact scan on a small-bytes corpus —
# the round-10 price — and yields strictly MORE precise stats, never a
# worse decision. Module constant so the cutoff-boundary pytest can
# scale the whole mechanism down.
EXACT_PROBE_CHEAP_BYTES = 128 * 1024 * 1024


def _plan_leaves_sized(df: DataFrame) -> bool:
    """True when every leaf of the optimized plan is a relation whose
    Catalyst sizeInBytes is grounded in real data (file scans: file
    size × compression factor; local/cached relations: materialized
    rows). Generated leaves (Range) report 8 bytes/row regardless of
    what later projections synthesize — a spark.range-derived 6M-doc
    text corpus estimates ~48 MB — so the byte gate must not trust
    them (round-12 ADVICE: such a corpus above SAMPLED_PROBE_MIN_N was
    routed to the full exact probe; bounded plan-time cost, never a
    wrong result, but the gate should simply not fire there)."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        k = leaves.size()
        if k == 0:  # pragma: no cover - defensive
            return False
        for i in range(k):
            name = leaves.apply(i).getClass().getSimpleName()
            # Relations (file scan, local rows, cached) carry real sizes;
            # LogicalRDD (createDataFrame) reports either computed stats
            # or the defaultSizeInBytes MAX — which the <= cheap-bytes
            # comparison rejects on its own, so trusting it is safe in
            # both directions. Everything else (Range & friends) is
            # generated: 8 bytes/row fantasy, ungated.
            if "Relation" not in name and name != "LogicalRDD":
                return False
        return True
    except Exception:  # pragma: no cover - Connect/analysis corner
        return False


def _plan_scan_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate in bytes (for file-scan
    frames: total input file size × the configured compression factor),
    or None where plan statistics aren't reachable (e.g. Spark
    Connect). Driver-side plan metadata only — launches no job."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala.math.BigInt to a Python int when it fits;
        # fall back to the string rendering for a boxed object
        return size if isinstance(size, int) else int(size.toString())
    except Exception:  # pragma: no cover - Connect/analysis corner
        return None


def _planning_stats(
    df: DataFrame,
    text_col: str,
    id_col: str | None,
    min_detect_cmax,
) -> tuple[tuple[int, float, int], bool]:
    """(stats, sampled?) for an ``auto`` collapse resolution: the exact
    probe below SAMPLED_PROBE_MIN_N docs (or when a cached exact result
    is already free, when the plan-estimated input is small enough that
    the exact probe costs no more than the count it would replace, or
    when the caller has no id column to sample on), else the sampled
    probe sized to detect the caller's thresholds. ``min_detect_cmax``
    is a callable n -> smallest cmax the caller's rule must see (the
    lower guard-band edge of its ceiling)."""
    if id_col is None:
        return _dup_stats(df, text_col), False
    key = None
    try:
        key = (id(df.sparkSession), df.semanticHash(), text_col)
    except Exception:  # pragma: no cover - Connect/analysis corner
        pass
    if key is not None and key in _DUP_STATS_CACHE:
        return _DUP_STATS_CACHE[key], False
    size = _plan_scan_bytes(df)
    if (
        size is not None
        and size <= EXACT_PROBE_CHEAP_BYTES
        and _plan_leaves_sized(df)
    ):
        return _dup_stats(df, text_col), False
    n = df.count()
    if n <= SAMPLED_PROBE_MIN_N:
        return _dup_stats(df, text_col), False
    detect = min_detect_cmax(n)
    # Sampled results share across a composed flow too, but only when
    # the cached draw was at least as precise (smaller min_detect =
    # larger sample) as this caller needs.
    if key is not None and key in _SAMPLED_STATS_CACHE:
        cached_detect, est = _SAMPLED_STATS_CACHE[key]
        if cached_detect <= detect:
            return est, True
    est = _dup_stats_sampled(df, text_col, id_col, n, detect)
    if key is not None:
        if len(_SAMPLED_STATS_CACHE) >= _DUP_STATS_CACHE_MAX:
            _SAMPLED_STATS_CACHE.clear()
        _SAMPLED_STATS_CACHE[key] = (detect, est)
    return est, True


# Historical docs-per-distinct-text ratio threshold, retained for the
# ratio probe's tooling uses. Round 9 retired RATIO as a switch
# statistic entirely: it is blind to group-size concentration in both
# directions (a 4x uniform corpus has ratio 4 but cheap direct plans; a
# 1%-viral corpus has ratio 1.01 and a quadratic direct blow-up), and
# the stress band (tools/collapse_band.py, SCALING.md) measured it
# mispicking on every uniform band at or below 2x.
COLLAPSE_RATIO = 1.25

# ``auto`` collapse thresholds, calibrated by tools/collapse_band.py
# on sf0.1 across uniform (u1.5-u16) and one-viral-group (h5-h40)
# duplication shapes (SCALING.md stress-band table). Duplication hurts
# the direct plans through two INDEPENDENT mechanisms, so the switch
# needs two statistics from the exact probe (_dup_stats):
#
#   trimmed blowup = (Σ|g|² - cmax²)/n — the work multiplier from
#   duplication SPREAD ACROSS the corpus (every duplicated text
#   lengthens its posting lists / multiplies its bucket pairs, and the
#   work parallelizes, so it prices TOTAL extra work). The single
#   largest group is excluded: its cost is localized (only its own
#   text's lists/buckets grow) and is priced separately by cmax.
#
#   cmax — the largest duplicate group: its |g|² candidate pairs land
#   on one join key / one band bucket, i.e. a serial hotspot no
#   executor count absorbs.
#
# posting-join self-join (jaccard/containment inverted index): direct
# work grows ~trimmed² (every duplicate lengthens lists on BOTH join
# sides) — measured direct-wins 2-3x at trimmed 2, tie at 4, collapse-
# wins 4.7x/29x at 8/16. A lone mega group measured CHEAP direct at
# cmax 1000 (its pairs spread over its ~50 shingle keys), so the
# hotspot ceiling sits high.
POSTING_COLLAPSE_BLOWUP = 4.5
# bm25 (doc-side × query-side posting join): the spread multiplier is
# the PRODUCT of doc-side trimmed blowup and query-side FULL blowup
# (any duplicated probe re-pays every matched list — a query-side mega
# group is a global multiplier, not a localized hotspot) — measured at
# constant probes: tie at doc-blowup 4, collapse-wins 1.7x at 8.
BM25_COLLAPSE_BLOWUP = 6.0
# pair family (minhash LSH, dedup_against): spread duplication measured
# direct-wins at EVERY uniform band through blowup 16 (in-bucket verify
# is vectorized and parallelizes across groups; the collapse fan-out
# joins cost more than it saves), so the pair family has NO spread
# threshold — only the mega-group hotspot flips it: one group's pairs
# expand inside ONE band bucket = one task.
#
# Hotspot ceilings. The pair-family crossover is NOT a constant cmax:
# the break-even is serial hotspot work (∝ cmax², one band bucket =
# one task) against the per-core share of the collapse overhead
# (∝ n / parallelism P), i.e. collapse iff
#
#     cmax ≥ sqrt(PAIR_COLLAPSE_BETA · n / P).
#
# PAIR_COLLAPSE_BETA is calibrated from the measured single-node
# crossover — the h20/h40 bracket (direct wins at cmax 1000, loses
# 1.8x at 2000 → crossover ≈ 1500 at n = 5000 docs, P = 32 cores):
# 1500² · 32 / 5000 = 14,400. The same formula reproduces every other
# measured cell: sf0.01 skew (n=500, P=32 → threshold 474; measured
# direct-wins at cmax 200 ✓) and all uniform bands (cmax ≤ 16 ≪
# threshold ✓). On a 1000-executor cluster P grows, the threshold
# falls as sqrt(1/P), and a mega group that would stall one task while
# thousands idle collapses much earlier — exactly the scale behavior a
# fixed constant cannot express. PAIR_COLLAPSE_CMAX_MIN floors the
# formula so trivial corpora never collapse on noise-level cmax.
# minhash: bracket h20 (direct-wins at cmax 1000) / h40 (loses 1.8x at
# 2000) → crossover ≈ 1500 → beta = 1500²·32/5000.
PAIR_COLLAPSE_BETA = 14_400
# dedup_against pays a smaller collapse overhead (survival fans out by
# fingerprint — no member-pair fan-out joins), so its crossover sits
# lower: bracket h10 (direct-wins at cmax 500) / h20 (loses 1.7x at
# 1000) → crossover ≈ 700 → beta = 700²·32/5000. The formula then
# reproduces its sf0.01-skew reading too (threshold 221, measured
# direct-wins at cmax 200).
AGAINST_COLLAPSE_BETA = 3_136
# embedding_neardup_pairs: same serial-hotspot mechanism on vectors —
# a g-strong identical-embedding group is one g×g verify matmul in one
# bucket task plus g² passing pairs shuffled once per band. Round 10
# calibrated a single sqrt(beta·n/P) beta from ONE n (2000 → beta
# 3,841); round 11 added two more n points (tools/embed_band.py,
# EMBED_BAND.jsonl — uniquified 4x backgrounds so replica duplication
# doesn't confound the planted hotspot) and the single-beta form broke:
# measured crossover brackets at P=32 are
#     n=500:  g* in (200, 300)    [direct 0.88 vs 0.96 at 200]
#     n=2000: g* in (300, 500)    [direct 0.92 vs 1.19 at 300]
#     n=8000: g* in (500, 800)    [collapse 1.65 vs 1.91 at 800]
# i.e. g* grows ~n^0.34 here, not sqrt(n) — no single beta satisfies
# all three brackets (the n=500 lower bound and n=8000 upper bound
# pinch at exactly 2,560). The affine model
#     g*² = EMBED_COLLAPSE_INTERCEPT + EMBED_COLLAPSE_BETA · n/P
# fits all three with margin (intercept = the FIXED collapse overhead —
# the rep-group build + fan-out join stages cost ~constant wall-clock
# at small n — in hotspot-pair units; beta = the per-core linear
# fan-out work): fit through the n=500/n=8000 bracket centers gives
# intercept 37,400 / beta 1,448 and predicts g*(n=2000) = 358, inside
# its bracket. At cluster scale the beta term dominates and the
# sqrt(1/P) earlier-collapse-on-bigger-clusters behavior is retained;
# at small n the threshold floors at sqrt(intercept) ≈ 193 instead of
# the old form's coincidental 245.
EMBED_COLLAPSE_BETA = 1_448
EMBED_COLLAPSE_INTERCEPT = 37_400
PAIR_COLLAPSE_CMAX_MIN = 64
# posting hotspot: a mega group's posting pairs spread over its own
# ~doc-length distinct shingle keys, so the serial fraction is far
# smaller and the ceiling sits much higher than the pair family's.
# Round-10 grounding (verdict task 6): the h80 cell (n=5000, cmax=4000,
# trimmed 0.2) measured jaccard DIRECT still winning 8.8 s vs 14.5 s —
# the 10,000 ceiling for jaccard/bm25 remains extrapolated, but the
# measured direct-wins floor moved 2000 → 4000 (COLLAPSE_BAND.jsonl).
POSTING_COLLAPSE_CMAX = 10_000
# Containment crosses EARLIER than jaccard — the same h80 cell measured
# collapse winning 2.1x (direct 23.9 s vs 11.2 s) while the h60 cell
# (cmax=3000) still favored direct (6.6 vs 10.5): containment's
# one-sided OR threshold keeps every subset pair a mega group's
# postings touch, so its direct join output-amplifies faster in cmax.
# Bracket (3000 direct-wins, 4000 collapse-wins) → geometric-mean
# crossover sqrt(3000·4000) ≈ 3,464. One bracket cell cannot fix the
# functional form (constant vs sqrt(n)-scaled), so this is a constant
# within the measured bracket, re-derivable from COLLAPSE_BAND.jsonl.
CONTAINMENT_COLLAPSE_CMAX = 3_464




def _resolve_posting_collapse(
    df,
    text_col,
    duplicate_collapse: str,
    stats: tuple[int, float, int] | None = None,
    cmax_ceiling: int = POSTING_COLLAPSE_CMAX,
    id_col: str | None = None,
    blowup_threshold: float | None = None,
) -> bool:
    """``auto`` plan pick for the posting-join family: trimmed blowup
    against the measured spread crossover, cmax against the hotspot
    ceiling (per-operator — containment crosses earlier, see
    CONTAINMENT_COLLAPSE_CMAX). No docs-per-distinct ratio gate — ratio
    stays near 1 on exactly the concentrated compositions where the
    hotspot matters. ``stats`` short-circuits the probe with a
    caller-supplied (n, blowup, cmax) — see :func:`dup_stats`. With an
    ``id_col`` and > SAMPLED_PROBE_MIN_N docs the probe runs SAMPLED
    (:func:`_dup_stats_sampled`); estimates inside the guard band of
    either threshold re-run the exact probe before deciding."""
    if duplicate_collapse not in ("auto", "always", "never"):
        raise ValueError(f"duplicate_collapse: {duplicate_collapse!r}")
    if duplicate_collapse != "auto":
        return duplicate_collapse == "always"
    if blowup_threshold is None:
        blowup_threshold = POSTING_COLLAPSE_BLOWUP
    if stats is not None:
        (n, blowup, cmax), sampled = stats, False
    else:
        (n, blowup, cmax), sampled = _planning_stats(
            df, text_col, id_col, lambda _n: cmax_ceiling / PROBE_GUARD_BAND
        )
    if n == 0:
        return False
    trimmed = blowup - cmax * cmax / n
    if sampled:
        G = PROBE_GUARD_BAND
        near = (
            blowup_threshold / G <= trimmed <= blowup_threshold * G
            or cmax_ceiling / G <= cmax <= cmax_ceiling * G
        )
        if near:  # at-threshold fallback: the exact probe decides
            n, blowup, cmax = _dup_stats(df, text_col)
            trimmed = blowup - cmax * cmax / n
    return trimmed >= blowup_threshold or cmax >= cmax_ceiling


# The parallelism the pair-family betas were calibrated at. The
# beta·n/P term models the CLUSTER regime — per-core fan-out work
# dominating the collapse plan's cost, so more executors collapse
# earlier. BELOW the calibration parallelism that premise inverts: a
# P=8 embed band (SCALING.md round 11) measured collapse winning at
# EVERY planted size down to g=400 while the n/P form predicts the
# crossover should RISE to 632 — with few cores the DIRECT plan's
# parallel candidate work slows as 1/P while the collapsed plan is
# fixed-stage-overhead-bound and stays flat. Clamping P up to the
# calibration point keeps the threshold at its measured-P level on
# smaller sessions (collapse-leaning — the safe direction given the
# unbounded hotspot cost vs the bounded collapse overhead; the clamp
# reproduces all four measured P=8 cells) and leaves cluster-scale
# behavior unchanged.
PAIR_CALIBRATION_P = 32


def _pair_cmax_threshold(
    n: int, parallelism: int, beta: float = PAIR_COLLAPSE_BETA,
    intercept: float = 0.0,
) -> float:
    """Scale-aware pair-family hotspot crossover (see the
    PAIR_COLLAPSE_BETA block): sqrt(intercept + beta · n / P), floored,
    with P clamped up to PAIR_CALIBRATION_P (the n/P model is for the
    at-or-above-calibration regime; see that constant's block). The
    intercept is 0 for the text family; the embedding family's
    measured fixed collapse overhead makes it affine (see the
    EMBED_COLLAPSE_INTERCEPT block)."""
    p = max(parallelism, PAIR_CALIBRATION_P)
    return max(PAIR_COLLAPSE_CMAX_MIN, (intercept + beta * n / p) ** 0.5)


def _plan_parallelism(spark) -> int:
    """Target parallelism P for plan-time cost decisions.

    The instantaneous ``sparkContext.defaultParallelism`` is wrong under
    dynamic allocation: before executors register it can be tiny, which
    INFLATES the sqrt(beta·n/P) hotspot threshold and leaves a
    mega-group corpus on the direct plan that will later stall one task
    on the full cluster. Use the configured shuffle partitioning — the
    stable statement of intended parallelism, and the partition count
    the planned operator's own shuffles will actually run at — and take
    the max with defaultParallelism so an interactive local session
    with shuffle.partitions lowered still sees its real core count."""
    sc = spark.sparkContext
    try:
        conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):  # e.g. "auto" under some AQE setups
        conf_p = 0
    return max(conf_p, sc.defaultParallelism, 1)


_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _broadcast_threshold_bytes(spark) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes (Spark renders
    it as a plain count or with a b/k/m/g suffix; -1 = disabled → 0)."""
    import re

    try:
        raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
        m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", raw)
        if not m:
            return 0
        n = int(m.group(1))
        if n < 0:
            return 0
        return n * _BYTE_SUFFIX.get(m.group(2).lower(), 1)
    except Exception:  # pragma: no cover - Connect/conf corner
        return 0


def _cluster_pair_stream(ex: DataFrame, id_col: str) -> DataFrame:
    """Hash-partition the STREAM side of the posting self-join by doc id
    — exactly when the planner will broadcast the build side.

    In the broadcast regime the join preserves the stream side's
    partitioning, and ``HashPartitioning(id)`` satisfies the pair
    aggregation's ``ClusteredDistribution([id_a, id_b])`` — so the pair
    exchange (69 MiB / 1.13 M rows at sf0.1, and the largest shuffle
    left in the posting family; partial agg combines <11% because most
    candidate pairs share exactly one shingle) disappears outright,
    replaced by one much narrower posting shuffle. The repartition must
    come AFTER the checkpoint: a localCheckpoint leaf reports
    UnknownPartitioning under AQE, so partitioning established upstream
    does not survive it.

    Gated on the SAME statistic the planner's broadcast decision reads
    (optimized-plan sizeInBytes vs autoBroadcastJoinThreshold): when the
    posting table is too big to broadcast the join is SMJ/SHJ keyed on
    the shingle, the join output is shingle-partitioned regardless, and
    a doc-keyed repartition would be a pure extra corpus-sized shuffle —
    at scale this helper is a no-op by construction."""
    spark = ex.sparkSession
    size = _plan_scan_bytes(ex)
    if size is not None and 0 < size <= _broadcast_threshold_bytes(spark):
        return ex.repartition(F.col(id_col))
    return ex


def _resolve_pair_collapse(
    df,
    text_col,
    duplicate_collapse: str,
    cmax_threshold: float | None = None,
    beta: float = PAIR_COLLAPSE_BETA,
    stats: tuple[int, float, int] | None = None,
    id_col: str | None = None,
    intercept: float = 0.0,
) -> bool:
    """``auto`` plan pick for the pair family (minhash LSH /
    dedup_against): collapse iff the largest exact-duplicate group
    reaches the serial-hotspot crossover — by default the scale-aware
    sqrt(beta·n/P) break-even (beta calibrated per operator, see the
    PAIR_COLLAPSE_BETA block; P from :func:`_plan_parallelism`),
    overridable with an explicit ``cmax_threshold``. ``stats``
    short-circuits the probe with a caller-supplied (n, blowup, cmax).
    With an ``id_col`` and > SAMPLED_PROBE_MIN_N docs the probe runs
    SAMPLED — the sqrt(beta*n/P) threshold grows with n at exactly the
    rate that keeps a threshold-sized group's expected sampled-member
    count constant under the 20*sqrt(n) sample, so detectability holds
    at any n (see _dup_stats_sampled); a cmax estimate inside the guard
    band re-runs the exact probe before deciding."""
    if duplicate_collapse not in ("auto", "always", "never"):
        raise ValueError(f"duplicate_collapse: {duplicate_collapse!r}")
    if duplicate_collapse != "auto":
        return duplicate_collapse == "always"
    if stats is not None:
        (n, _, cmax), sampled = stats, False
    else:
        p = _plan_parallelism(df.sparkSession)
        (n, _, cmax), sampled = _planning_stats(
            df,
            text_col,
            id_col,
            lambda _n: (
                cmax_threshold
                if cmax_threshold is not None
                else _pair_cmax_threshold(_n, p, beta, intercept)
            )
            / PROBE_GUARD_BAND,
        )
    if cmax_threshold is None:
        cmax_threshold = _pair_cmax_threshold(
            n, _plan_parallelism(df.sparkSession), beta, intercept
        )
    if sampled:
        G = PROBE_GUARD_BAND
        if cmax_threshold / G <= cmax <= cmax_threshold * G:
            n, _, cmax = _dup_stats(df, text_col)  # at-threshold fallback
    return cmax >= cmax_threshold


def _rep_groups(df: DataFrame, text_col: str, id_col: str, reliable: bool = False):
    """(fpmap, groups, members) for representative collapse: fpmap =
    narrow (id, sha256-of-normalized-text), groups = one row per
    distinct text (rep = min member id, cnt = multiplicity), members =
    (rep, member id). Text itself never shuffles — the fingerprint map
    is two thin columns, checkpointed because groups and the pair
    fan-out both consume it. ``reliable`` routes every lineage
    truncation through the durable checkpoint dir (ckpt.iter_checkpoint)
    so the collapsed path survives executor loss like the iterative
    operators do."""
    fpmap = iter_checkpoint(
        df.select(F.col(id_col), content_hash(F.col(text_col)).alias("__fp")),
        reliable,
    )
    groups = fpmap.groupBy("__fp").agg(
        F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__cnt")
    )
    members = fpmap.join(groups, "__fp").select(
        "__rep", F.col(id_col).alias("__m")
    )
    return fpmap, groups, members


def jaccard_pairs_inverted(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
    round_to: int = 6,
    duplicate_collapse: str = "auto",
    dup_stats: tuple[int, float, int] | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted-index join: explode
    distinct shingles, equi-join on the shingle, count shared shingles
    per pair, Jaccard = |∩| / (|A| + |B| - |∩|).

    Fully SQL-expressible (unlike the MinHash candidate path), so it is
    the oracle-checkable exact-dedup variant. The join key is the
    shingle string — the classic blocking layout; at corpus scale,
    stop-shingles (n-grams appearing in thousands of docs) dominate the
    join, so pass ``max_shingle_freq`` to drop shingles with document
    frequency above the cap; the Jaccard is then measured over the
    CAPPED shingle universe — sizes and intersections consistently
    exclude the dropped shingles, so the score is the similarity of the
    docs' informative content (mixing capped intersections with uncapped
    sizes would bias every affected pair downward).

    ``duplicate_collapse`` (result-exact on every input, like
    bm25_topk's): on duplicate-heavy corpora the posting join was the
    repo's highest scaling exponent (α 0.68 — every duplicate multiplies
    every posting list, so join work grows ~quadratically in the
    duplication factor). The collapsed path shingles and joins one
    REPRESENTATIVE per distinct normalized text (multiplicity-weighted
    document frequency for the cap), then fans representative pairs
    back out to member pairs — the join is sized by distinct content,
    and only the (inherently output-sized) member fan-out scales with
    duplication. ``"auto"`` probes trimmed blowup + cmax against the
    posting family's measured crossovers (POSTING_COLLAPSE_BLOWUP /
    POSTING_COLLAPSE_CMAX — the self-join grows ~trimmed², so the
    spread threshold sits low). ``dup_stats``: precomputed probe tuple
    (see :func:`dup_stats`); ``reliable``: durable lineage truncation.
    Probe results are cached per (session, plan, column): if this session OVERWRITES the files behind ``df`` and re-runs on an identical plan, call :func:`clear_dup_stats_cache` first or the auto switch plans from stale stats (plan choice only — both plans are result-exact)."""
    df = _spread(df)
    if _resolve_posting_collapse(
        df, text_col, duplicate_collapse, stats=dup_stats, id_col=id_col
    ):
        return _jaccard_pairs_collapsed(
            df, text_col, id_col, shingle_n, threshold,
            max_shingle_freq, round_to, reliable,
        )
    # two-step projection: words materialize once, shingles build from
    # the column (word_shingles_from_words contract). No size(__g) > 0
    # filter — explode already emits nothing for empty/null arrays, and
    # the filter predicate was pushdown-duplicated below the _spread
    # exchange, re-running the whole shingle pipeline per doc in the
    # (single-task at small inputs) scan stage.
    sh = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).select(
        F.col(id_col),
        word_shingles_from_words(F.col("__w"), shingle_n).alias("__g"),
    )
    if max_shingle_freq is None:
        ex = sh.select(
            F.col(id_col), F.size("__g").alias("__sz"), F.explode("__g").alias("__s")
        )
    else:
        ex = sh.select(F.col(id_col), F.explode("__g").alias("__s"))
        rare = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__df")).filter(
            F.col("__df") <= max_shingle_freq
        )
        ex = ex.join(rare.select("__s"), "__s")
        # per-doc sizes over the SAME capped universe as the intersection
        # counts — uncapped sizes would bias Jaccard downward for pairs
        # whose overlap includes capped shingles
        sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
        ex = ex.join(sizes, id_col)
    # the self-join's two branches carry different aliases above the
    # exchange, so Catalyst gets no ReusedExchange and would scan +
    # shingle + explode the corpus TWICE (plan-audited). Materialize the
    # posting table once — same recipe as the BM25 inverted index.
    ex = iter_checkpoint(ex, reliable)
    # stream side doc-clustered in the broadcast regime: the pair
    # aggregation below then needs NO exchange (see _cluster_pair_stream)
    a = _cluster_pair_stream(ex, id_col).select(
        F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"), "__s"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"), "__s"
    )
    inter = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        # sizes ride as grouping keys (functionally dependent on the ids,
        # so groups are unchanged): no first() agg buffers, and in the
        # SMJ regime the pair-exchange row narrows 7 -> 5 fields
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    j = F.col("__i") / (F.col("__sza") + F.col("__szb") - F.col("__i"))
    return (
        inter.withColumn("jaccard", F.round(j, round_to))
        .filter(j >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_pairs_collapsed(
    df, text_col, id_col, shingle_n, threshold, max_shingle_freq, round_to,
    reliable=False,
) -> DataFrame:
    """Representative-collapsed exact Jaccard (see jaccard_pairs_inverted).

    Result-exact: members of an exact-duplicate group share a shingle
    set, so every member pair of a qualifying representative pair gets
    the representative pair's score, within-group pairs score exactly
    1.0 over the capped universe (emitted only when that universe is
    non-empty — matching the direct path, where shingle-less docs never
    join), and the df cap counts documents with multiplicity."""
    fpmap, groups, members = _rep_groups(df, text_col, id_col, reliable)
    # shingle ONLY representatives: one (id, text)-shuffle join replaces
    # per-duplicate shingling (the collapsed path runs on duplicate-heavy
    # input by construction, so rep shingling is the cheap side)
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col), "__cnt"), id_col
    )
    base = reps.select(
        F.col(id_col), "__cnt",
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    sh = base.select(
        F.col(id_col), "__cnt",
        word_shingles_from_words(F.col("__w"), shingle_n).alias("__g"),
    )
    if max_shingle_freq is None:
        ex = sh.select(
            F.col(id_col), F.size("__g").alias("__sz"),
            F.explode("__g").alias("__s"),
        )
        # shingle-eligibility without building grams: >=1 n-gram shingle
        # exists iff the words array has >= n elements
        eligible = base.filter(F.size("__w") >= shingle_n).select(
            F.col(id_col).alias("__rep")
        )
    else:
        ex0 = sh.select(F.col(id_col), "__cnt", F.explode("__g").alias("__s"))
        # document frequency counts DOCUMENTS, so weight by multiplicity
        rare = ex0.groupBy("__s").agg(F.sum("__cnt").alias("__df")).filter(
            F.col("__df") <= max_shingle_freq
        )
        ex = ex0.join(rare.select("__s"), "__s")
        sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
        ex = ex.drop("__cnt").join(sizes, id_col)
        eligible = sizes.filter(F.col("__sz") > 0).select(
            F.col(id_col).alias("__rep")
        )
    ex = iter_checkpoint(ex, reliable)
    # same stream-side clustering + sizes-as-keys layout as the direct
    # path (see jaccard_pairs_inverted / _cluster_pair_stream)
    a = _cluster_pair_stream(ex, id_col).select(
        F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"), "__s"
    )
    b = ex.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"), "__s")
    inter = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    j = F.col("__i") / (F.col("__sza") + F.col("__szb") - F.col("__i"))
    rep_pairs = (
        inter.withColumn("jaccard", F.round(j, round_to))
        .filter(j >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # fan representative pairs out to member pairs, re-normalizing the
    # (id_a < id_b) order across interleaved member ids
    ma = members.select(F.col("__rep").alias("id_a"), F.col("__m").alias("__ma"))
    mb = members.select(F.col("__rep").alias("id_b"), F.col("__m").alias("__mb"))
    cross = rep_pairs.join(ma, "id_a").join(mb, "id_b").select(
        F.least("__ma", "__mb").alias("id_a"),
        F.greatest("__ma", "__mb").alias("id_b"),
        "jaccard",
    )
    if threshold > 1.0:
        return cross
    # within-group pairs: identical docs, Jaccard exactly 1.0 over a
    # non-empty capped universe
    m1 = members.join(eligible, "__rep").select(
        "__rep", F.col("__m").alias("id_a")
    )
    m2 = members.select("__rep", F.col("__m").alias("id_b"))
    within = (
        m1.join(m2, "__rep")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


def containment_pairs_inverted(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    round_to: int = 6,
    duplicate_collapse: str = "auto",
    dup_stats: tuple[int, float, int] | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Asymmetric n-gram containment pairs via the same inverted-index
    join as :func:`jaccard_pairs_inverted`:
    ``cont_a_in_b = |A∩B| / |A|`` and ``cont_b_in_a = |A∩B| / |B|``.

    Containment is the subset-duplication detector Jaccard structurally
    misses: a 100-word quote fully embedded in a 10k-word article has
    Jaccard ≈ 0.01 but containment 1.0 (Broder 1997 distinguishes the
    two resemblance measures). Pairs emit when EITHER direction clears
    ``threshold``; both scores are returned so callers can pick the
    smaller doc as the duplicate.

    With ``max_shingle_freq`` set, the intersection is counted over the
    frequency-pruned shingle universe (stop-shingles never join) but the
    denominators stay the TRUE |A| and |B|, computed before the prune —
    containment's meaning is "what fraction of A appears in B", and
    dividing by the pruned size would inflate scores for docs dominated
    by common shingles (unlike Jaccard, where capped-universe semantics
    are consistent on both numerator and denominator). The pruned
    intersection makes capped containment a lower bound on the true
    score.

    ``duplicate_collapse``: same adaptive representative collapse (and
    the same result-exactness argument) as jaccard_pairs_inverted —
    this operator carried the repo's second-highest scaling exponent
    (α 0.61) on duplicate-heavy growth before the collapse — and its
    OWN, lower hotspot ceiling (CONTAINMENT_COLLAPSE_CMAX: the
    one-sided OR threshold keeps every subset pair a mega group's
    postings touch, so the direct join crosses at cmax ≈ 3.5k where
    jaccard still wins at 4k — measured h60/h80 bracket).
    ``dup_stats``: precomputed probe tuple (see :func:`dup_stats`);
    ``reliable``: durable lineage truncation.
    Probe results are cached per (session, plan, column): if this session OVERWRITES the files behind ``df`` and re-runs on an identical plan, call :func:`clear_dup_stats_cache` first or the auto switch plans from stale stats (plan choice only — both plans are result-exact)."""
    df = _spread(df)
    if _resolve_posting_collapse(
        df, text_col, duplicate_collapse, stats=dup_stats,
        cmax_ceiling=CONTAINMENT_COLLAPSE_CMAX, id_col=id_col,
    ):
        return _containment_pairs_collapsed(
            df, text_col, id_col, shingle_n, threshold,
            max_shingle_freq, round_to, reliable,
        )
    # two-step words → shingles projection, no redundant size filter:
    # same rationale as jaccard_pairs_inverted
    sh = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).select(
        F.col(id_col),
        word_shingles_from_words(F.col("__w"), shingle_n).alias("__g"),
    )
    if max_shingle_freq is None:
        ex = sh.select(
            F.col(id_col), F.size("__g").alias("__sz"), F.explode("__g").alias("__s")
        )
    else:
        ex = sh.select(
            F.col(id_col), F.size("__g").alias("__sz"), F.explode("__g").alias("__s")
        )
        rare = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__df")).filter(
            F.col("__df") <= max_shingle_freq
        )
        ex = ex.join(rare.select("__s"), "__s")
    # materialize once: the aliased self-join otherwise recomputes the
    # scan+shingle+explode per branch (no ReusedExchange; see
    # jaccard_pairs_inverted)
    ex = iter_checkpoint(ex, reliable)
    # stream side doc-clustered in the broadcast regime: the pair
    # aggregation below then needs NO exchange (see _cluster_pair_stream)
    a = _cluster_pair_stream(ex, id_col).select(
        F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"), "__s"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"), "__s"
    )
    inter = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        # sizes ride as grouping keys (functionally dependent on the ids,
        # so groups are unchanged): no first() agg buffers, and in the
        # SMJ regime the pair-exchange row narrows 7 -> 5 fields
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    ca = F.col("__i") / F.col("__sza")
    cb = F.col("__i") / F.col("__szb")
    return (
        inter.filter((ca >= threshold) | (cb >= threshold))
        .select(
            "id_a",
            "id_b",
            F.round(ca, round_to).alias("cont_a_in_b"),
            F.round(cb, round_to).alias("cont_b_in_a"),
        )
    )


def _containment_pairs_collapsed(
    df, text_col, id_col, shingle_n, threshold, max_shingle_freq, round_to,
    reliable=False,
) -> DataFrame:
    """Representative-collapsed containment (see containment_pairs_inverted).

    Exactness mirrors the Jaccard collapse, with containment's mixed
    contract carried through: intersections over the (multiplicity-
    weighted) capped universe, denominators the TRUE pre-cap sizes.
    Within-group (identical-doc) pairs score capped_size / true_size in
    both directions, emitted only when the capped universe is non-empty
    (a doc whose every shingle is pruned has no postings in the direct
    path either) and the score clears the threshold. The fan-out swaps
    the direction columns when member-id order inverts the
    representative order — containment is asymmetric."""
    fpmap, groups, members = _rep_groups(df, text_col, id_col, reliable)
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col), "__cnt"), id_col
    )
    base = reps.select(
        F.col(id_col), "__cnt",
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    sh = base.select(
        F.col(id_col), "__cnt",
        word_shingles_from_words(F.col("__w"), shingle_n).alias("__g"),
    )
    if max_shingle_freq is None:
        ex = sh.select(
            F.col(id_col), F.size("__g").alias("__sz"),
            F.explode("__g").alias("__s"),
        )
        # identical docs: intersection == true size in both directions;
        # shingle-eligibility via the words array (>= n words)
        within_rep = base.filter(F.size("__w") >= shingle_n).select(
            F.col(id_col).alias("__rep"), F.lit(1.0).alias("__wscore")
        )
    else:
        ex0 = sh.select(
            F.col(id_col), "__cnt", F.size("__g").alias("__tsz"),
            F.explode("__g").alias("__s"),
        )
        rare = ex0.groupBy("__s").agg(F.sum("__cnt").alias("__df")).filter(
            F.col("__df") <= max_shingle_freq
        )
        kept = ex0.join(rare.select("__s"), "__s")
        csz = kept.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("__csz"), F.first("__tsz").alias("__tsz")
        )
        # postings carry the TRUE size as denominator; the intersection
        # count comes from the capped postings themselves
        ex = kept.select(F.col(id_col), F.col("__tsz").alias("__sz"), "__s")
        within_rep = csz.filter(F.col("__csz") > 0).select(
            F.col(id_col).alias("__rep"),
            (F.col("__csz").cast("double") / F.col("__tsz")).alias("__wscore"),
        )
    ex = iter_checkpoint(ex, reliable)
    # same stream-side clustering + sizes-as-keys layout as the direct
    # path (see jaccard_pairs_inverted / _cluster_pair_stream)
    a = _cluster_pair_stream(ex, id_col).select(
        F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"), "__s"
    )
    b = ex.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"), "__s")
    inter = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    ca = F.col("__i") / F.col("__sza")
    cb = F.col("__i") / F.col("__szb")
    rep_pairs = inter.filter((ca >= threshold) | (cb >= threshold)).select(
        "id_a", "id_b",
        F.round(ca, round_to).alias("__ca"),
        F.round(cb, round_to).alias("__cb"),
    )
    ma = members.select(F.col("__rep").alias("id_a"), F.col("__m").alias("__ma"))
    mb = members.select(F.col("__rep").alias("id_b"), F.col("__m").alias("__mb"))
    fwd = F.col("__ma") <= F.col("__mb")
    cross = rep_pairs.join(ma, "id_a").join(mb, "id_b").select(
        F.least("__ma", "__mb").alias("id_a"),
        F.greatest("__ma", "__mb").alias("id_b"),
        F.when(fwd, F.col("__ca")).otherwise(F.col("__cb")).alias("cont_a_in_b"),
        F.when(fwd, F.col("__cb")).otherwise(F.col("__ca")).alias("cont_b_in_a"),
    )
    w = F.round(F.col("__wscore"), round_to)
    m1 = members.join(within_rep, "__rep").filter(
        F.col("__wscore") >= threshold
    ).select("__rep", F.col("__m").alias("id_a"), w.alias("__ws"))
    m2 = members.select("__rep", F.col("__m").alias("id_b"))
    within = (
        m1.join(m2, "__rep")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.col("__ws").alias("cont_a_in_b"),
            F.col("__ws").alias("cont_b_in_a"),
        )
    )
    return cross.unionByName(within)


def _bucket_cosine_verify(threshold: float):
    """applyInPandas kernel for per-bucket cosine verification: normalized
    matmul screens all in-bucket pairs (with a 1e-9 margin for the
    different summation order), then the survivors are recomputed with
    the exact einsum arithmetic of :func:`similarity.cosine_pairs_udf` so
    emitted doubles are bit-identical to the pair-table verify path (and
    its oracle). Emits (id_a, id_b, __cos) with id_a < id_b."""
    empty = pd.DataFrame({"id_a": [], "id_b": [], "__cos": []})

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        # always a fresh frame: callers (e.g. the SemDeDup wrapper) may
        # insert grouping columns in place, and one Arrow task handles
        # many groups — a shared empty would be mutated across groups
        pdf = pdf[pdf["__vec"].notna()]  # belt-and-braces: a None row
        # would turn the batch into an object array and break the einsum
        m = len(pdf)
        if m < 2:
            return empty.copy()
        order = np.argsort(pdf["__id"].to_numpy(), kind="stable")
        ids = pdf["__id"].to_numpy()[order]
        V = np.array(pdf["__vec"].tolist(), dtype=np.float64)[order]
        with np.errstate(divide="ignore", invalid="ignore"):
            norms = np.sqrt(np.einsum("ij,ij->i", V, V))
            Vn = V / norms[:, None]
            C = Vn @ Vn.T
            ia, ib = np.triu_indices(m, 1)
            screen = C[ia, ib] >= threshold - 1e-9
            ia, ib = ia[screen], ib[screen]
            if not len(ia):
                return empty.copy()
            A, B = V[ia], V[ib]
            num = np.einsum("ij,ij->i", A, B)
            den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                np.einsum("ij,ij->i", B, B)
            )
            cos = num / den
        keep = cos >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "__cos": cos[keep]}
        )

    return _verify


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 32,
    bands: int = 16,
    seed: int = 42,
    round_to: int = 6,
    exact: bool = False,
    duplicate_collapse: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) for
    every pair with cosine >= threshold, id_a < id_b.

    Two modes, per the ANN playbook:
    - ``exact=True``: brute-force all-pairs — the O(n²) correctness
      baseline, only for small corpora / oracle checks.
    - default: random-hyperplane LSH prefilter (same banding machinery as
      :mod:`similarity`) — candidates are pairs sharing >=1 band bucket,
      then exact cosine verification. The candidate join is an equi join
      on (band, key): at 100 TB the corpus shuffles once on the bucket
      key and no all-pairs product ever forms. Recall is tuned by
      (num_planes, bands): for pair similarity s the per-pair miss
      probability is (1-(1-acos(s)/pi)^r)^b with r = num_planes/bands.

    ``duplicate_collapse`` (LSH mode): representative collapse — band
    and verify one rep per DISTINCT vector, fan verified rep pairs out
    to member pairs, and emit within-group pairs in closed form at
    cosine exactly 1.0 — the pair-family hazard transplanted from the
    text family: a g-strong identical-embedding group otherwise lands
    whole in each of its ``bands`` buckets, so ONE task runs a serial
    g×g verify matmul (cmax² work no executor count absorbs) and the
    distinct shuffles the group's g² passing pairs once per band.
    Result-exact on every input: cosine and band keys are
    vector-determined, so member candidacy ⟺ rep candidacy and scores
    transfer; identical non-zero vectors score bitwise 1.0 on the
    direct path too (num == den in the same arithmetic), while an
    all-zero group verifies NaN there and is correspondingly excluded
    from the closed form here. ``"auto"`` (default) probes the vector
    column (the same cached _dup_stats scan — xxhash64 hashes arrays)
    against the measured affine crossover
    sqrt(EMBED_COLLAPSE_INTERCEPT + EMBED_COLLAPSE_BETA·n/P),
    calibrated from a planted-group band on the sf0.1 embeddings (see
    the constant's derivation block); the exact brute-force mode never
    probes or collapses — it is the small-corpus oracle baseline."""
    from datamine_v2_0_spark.operators.similarity import (
        banded_keys_udf,
        cosine_pairs_udf,
        make_hyperplanes,
    )

    if duplicate_collapse not in ("auto", "always", "never"):
        raise ValueError(f"duplicate_collapse: {duplicate_collapse!r}")
    # NULL vectors can't hash into a band or verify a cosine — drop them
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col)
    )
    if not exact and _resolve_pair_collapse(
        base, vec_col, duplicate_collapse, beta=EMBED_COLLAPSE_BETA,
        id_col=id_col, intercept=EMBED_COLLAPSE_INTERCEPT,
    ):
        from datamine_v2_0_spark.operators.similarity import (
            vector_rep_groups,
        )

        rep_base, members0 = vector_rep_groups(base, vec_col, id_col)
        members = members0.select(
            F.col("neighbor_id").alias("__rep"), "__m"
        )
        rep_pairs = embedding_neardup_pairs(
            rep_base, vec_col, id_col, dim, threshold, num_planes,
            bands, seed, round_to, exact=False, duplicate_collapse="never",
        )
        ma = members.select(
            F.col("__rep").alias("id_a"), F.col("__m").alias("__ma")
        )
        mb = members.select(
            F.col("__rep").alias("id_b"), F.col("__m").alias("__mb")
        )
        cross = rep_pairs.join(ma, "id_a").join(mb, "id_b").select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            "cos_sim",
        )
        if threshold > 1.0:
            return cross
        # within-group pairs: identical vectors, cosine exactly 1.0 —
        # emitted only for non-zero vectors (a zero-vector group
        # verifies NaN on the direct path and never passes)
        nonzero = rep_base.filter(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
            > 0
        ).select(F.col(id_col).alias("__rep"))
        m1 = members.join(nonzero, "__rep").select(
            "__rep", F.col("__m").alias("id_a")
        )
        m2 = members.select("__rep", F.col("__m").alias("id_b"))
        within = (
            m1.join(m2, "__rep")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(1.0).alias("cos_sim"))
        )
        return cross.unionByName(within)
    if exact:
        a = base.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
        )
        b = base.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
        )
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        # verify INSIDE the bucket: each (band, key) group runs one
        # vectorized kernel (normalized matmul screen with an ulp margin,
        # then the exact per-pair einsum recompute — bit-identical to
        # cosine_pairs_udf) and emits only the pairs clearing the
        # threshold. The previous form expanded every in-bucket
        # combination into (id_a, id_b) rows, distinct-ed them, and
        # re-joined the vectors twice: at a high-recall operating point
        # (few planes per band => big buckets) the candidate table is
        # quadratic in bucket size — measured 50M pair rows for 5k
        # vectors at 32/16 — while the passing set is 1000× smaller.
        # Emitting post-verify pairs keeps the shuffle linear
        # (bands × corpus vector rows in, passing pairs out).
        keys = banded_keys_udf(make_hyperplanes(dim, num_planes, seed), bands)
        banded = base.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            F.posexplode(keys(F.col(vec_col))).alias("__band", "__key"),
        )
        id_type = dict(df.dtypes)[id_col]
        verify = _bucket_cosine_verify(threshold)
        pairs_v = banded.groupBy("__band", "__key").applyInPandas(
            verify, schema=f"id_a {id_type}, id_b {id_type}, __cos double"
        )
        # the same pair from different bands carries the identical double
        # (same arithmetic on the same vectors), so distinct dedups bands
        return (
            pairs_v.distinct()
            .select("id_a", "id_b", F.round("__cos", round_to).alias("cos_sim"))
        )
    pair_cos = cosine_pairs_udf()
    return (
        pairs.withColumn("__cos", pair_cos(F.col("__va"), F.col("__vb")))
        .filter(F.col("__cos") >= threshold)
        .select(
            "id_a", "id_b", F.round("__cos", round_to).alias("cos_sim")
        )
    )


def _cc_hop(edges: DataFrame, lab: DataFrame) -> DataFrame:
    """One min-label propagation hop: every node adopts the minimum of
    its own label and its 1-hop neighborhood's labels.

    ``edges`` is the symmetrized edge set, hash-partitioned on ``dst``
    and persisted by :func:`connected_components` — the join on ``dst``
    reads the cache co-partitioned, so only the label table shuffles.
    Batching several hops between convergence checks keeps the eager
    checkpoint + changed-count (fixed-overhead JOBS per cycle) amortized
    — an extra in-lineage hop is just one more join+groupBy in the same
    job, and a block that changes nothing still proves convergence.

    PRECONDITION: every ``edges.src`` must appear in ``lab.node``
    (src ⊆ lab). The union-based fold keys the output on nbr ∪ own
    rather than lab alone, so an edge whose src is absent from lab
    would inject a new node with a NULL old_comp row that evades the
    ``comp < old_comp`` convergence check. True by construction for the
    one caller (:func:`connected_components` symmetrizes edges and
    derives labels from src); any new caller must guarantee it."""
    # neighbor labels UNIONed with each node's own row, then ONE min
    # aggregate: min over (own ∪ neighborhood) == least(own,
    # min(neighbors)) exactly, so this folds the old `lab LEFT JOIN
    # nbr_min` (a second label-sized exchange + join per hop) into the
    # same exchange as the neighborhood aggregation (guide §2.4).
    # old_comp rides as max-ignoring-nulls: each node has exactly one
    # own row carrying it; neighbor rows contribute null.
    has_old = "old_comp" in lab.columns
    comp_t = dict(lab.dtypes)["comp"]
    nbr = edges.join(
        lab.select(F.col("node").alias("dst"), F.col("comp").alias("__c")),
        "dst",
    ).select(F.col("src").alias("node"), "__c")
    if not has_old:
        own = lab.select("node", F.col("comp").alias("__c"))
        return nbr.unionAll(own).groupBy("node").agg(
            F.min("__c").alias("comp")
        )
    own = lab.select("node", F.col("comp").alias("__c"), "old_comp")
    u = nbr.withColumn("old_comp", F.lit(None).cast(comp_t)).unionByName(own)
    return u.groupBy("node").agg(
        F.min("__c").alias("comp"), F.max("old_comp").alias("old_comp")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    checkpoint: bool = True,
    steps_per_check: int = 2,
    reliable: bool = False,
    pin_partitioning: bool = False,
) -> DataFrame:
    """Resolve near-duplicate candidate PAIRS into duplicate GROUPS:
    returns (node, comp) where comp is the minimum node id reachable
    through the pair graph — the canonical-representative labeling a
    dedup pipeline needs (pairs alone can't tell you which docs to keep
    when A~B and B~C but A!~C).

    Algorithm: iterative min-label propagation — each round every node
    adopts the minimum label in its 1-hop neighborhood, so the component
    minimum travels one hop per round and the loop stops when no label
    changes (or at max_iterations). Rounds needed = component diameter;
    near-dup components are small dense clusters (diameter 1-3), so this
    settles in 2-4 rounds.

    The symmetrized edge set — the LARGEST relation here, touched by
    every hop's join on ``dst`` — is computed once and served from
    executor blocks: ``localCheckpoint`` by default (the checkpointed
    LogicalRDD is a constant-size plan leaf; a plain ``persist`` keeps
    the whole pair-graph subtree in the logical plan and re-pays its
    analysis/AQE cost on every convergence-check job — measured +~1.4 s
    per run at sf0.1). With ``pin_partitioning=True`` it is instead
    hash-partitioned on ``dst`` and ``persist``-ed: a cached
    ``InMemoryRelation`` is the one construct whose output partitioning
    survives reuse under AQE (a checkpointed LogicalRDD reports
    UnknownPartitioning when the captured plan is an un-finalized
    AdaptiveSparkPlan, so it re-shuffles every hop). Pinned, every hop
    shuffles only the label table — the win where that exchange is
    an all-to-all NETWORK pass, i.e. a multi-node cluster. OPT-IN
    because on a single node it measured a wash at 6M pairs (min-of-4
    interleaved: 21.7 s pinned vs 25.1 s unpinned, inside noise) and the
    fixed partition count defeats AQE's small-shuffle coalescing on
    small graphs. With ``reliable=True`` the edge derivation is first
    cut to a durable checkpoint so an executor loss recomputes the
    blocks from the checkpoint rather than replaying the (possibly
    expensive) candidate-pair job. Per-round lineage truncation of the LABEL table
    keeps plan size constant — ``localCheckpoint`` by default (fast, but
    unreplicated executor blocks: an executor loss mid-job fails the job
    loudly and needs a re-run), or durable ``checkpoint`` with
    ``reliable=True`` (needs ``setCheckpointDir``; survives executor
    loss — see operators/ckpt). For adversarial long-chain graphs prefer
    the alternating large-star/small-star formulation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — same join
    machinery, O(log n) rounds."""
    if max_iterations < 1:
        raise ValueError("max_iterations must be >= 1")
    edges_raw = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    if reliable:
        edges_raw = iter_checkpoint(edges_raw, reliable)
    spark = pairs.sparkSession
    cached = None
    if pin_partitioning:
        # avoid re-shipping the edge set through an exchange every hop
        # — an all-to-all network pass on a cluster; OPT-IN because on a
        # single node local shuffle is page-cache cheap and the pinned
        # cache scan measured no better (see class docstring)
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edges = cached = edges_raw.repartition(n_shuffle, "dst").persist()
    elif reliable:
        # already durably checkpointed: hops re-read checkpoint blocks
        edges = edges_raw
    else:
        # localCheckpoint, NOT persist: both compute once and serve the
        # hops from executor blocks, but a persisted frame keeps its
        # full logical subtree, so every convergence-check job pays the
        # pair-graph subplan through analysis/AQE again — measured
        # +~1.4 s per CC run at sf0.1 (interleaved min-of-4 A/B),
        # while the checkpointed LogicalRDD is a constant-size leaf
        edges = edges_raw.localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    changed = 0
    steps_done = 0
    while steps_done < max_iterations:
        block = min(max(1, steps_per_check), max_iterations - steps_done)
        stepped = labels.select(
            "node", "comp", F.col("comp").alias("old_comp")
        )
        for _ in range(block):
            stepped = _cc_hop(edges, stepped)
            steps_done += 1
        if checkpoint:
            stepped = iter_checkpoint(stepped, reliable, eager=True)
        changed = stepped.filter(F.col("comp") < F.col("old_comp")).limit(1).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            break
    if checkpoint and cached is not None:
        # every completed block cut the label lineage at an eager
        # checkpoint, so the returned frame no longer references the
        # edge cache — release the executor memory now (lazily; without
        # per-block checkpoints the labels still read through the cache
        # and it must stay)
        cached.unpersist(blocking=False)
    if changed != 0:
        # silently-wrong groups would make a keep-one-per-group dedup
        # retain duplicates; refuse instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (component diameter exceeds the budget); raise "
            "max_iterations or switch to the large-star/small-star variant"
        )
    return labels


def _star_adjacency(edges: DataFrame) -> DataFrame:
    """Symmetrized adjacency with per-center minimum: (src, dst, m) where
    m = min over src's closed neighborhood."""
    adj = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = adj.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return adj.join(mins, "src")


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    checkpoint: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    each round rewires edges toward neighborhood minima —
    large-star hangs every strictly-larger neighbor off the center's
    minimum, small-star hangs the smaller-or-equal neighbors — which
    contracts component diameter geometrically, so convergence takes
    O(log n) rounds regardless of shape (the min-label propagation in
    :func:`connected_components` needs diameter rounds, fine for dense
    near-dup clusters, unbounded for adversarial chains). At fixpoint
    every edge points directly at its component minimum.

    Each round is two grouped shuffles + a distinct; edges are
    checkpointed per round to keep plan depth constant
    (``localCheckpoint`` by default; ``reliable=True`` for durable
    checkpoints that survive executor loss — see operators/ckpt).

    Returns (node, comp) like :func:`connected_components`."""
    all_nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        edges = iter_checkpoint(edges, reliable)
    for _ in range(max_rounds):
        # large-star: (v, m) for every neighbor v > center
        adj = _star_adjacency(edges)
        large = (
            adj.filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star: (v, m) for every neighbor v <= center, plus (center, m)
        adj2 = _star_adjacency(large)
        small = (
            adj2.filter(F.col("dst") <= F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(adj2.select("src", F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        if checkpoint:
            small = iter_checkpoint(small, reliable, eager=True)
        # fixpoint: the edge SET is unchanged. Both frames are distinct
        # sets, so equal cardinality + one-sided inclusion ⇒ equality —
        # two cheap counts and at most one exceptAll join per round
        # instead of two
        if (
            small.count() == edges.count()
            and small.exceptAll(edges).limit(1).count() == 0
        ):
            edges = small
            break
        edges = small
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} rounds"
        )
    # at fixpoint each edge is (node, component_min); minima map to
    # themselves, and nodes whose only pairs were self-pairs (filtered
    # from the edge set) rejoin as their own singleton component so the
    # output covers every node that appeared in `pairs`, matching
    # connected_components
    nodes = edges.select(F.col("src").alias("node"), F.col("dst").alias("comp"))
    singletons = all_nodes.withColumn("comp", F.col("node"))
    return (
        nodes.union(singletons)
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )


def dedup_groups(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "label",
) -> DataFrame:
    """(id, group_id) for EVERY doc: near-dup components share a group_id
    (the component's minimum id); unpaired docs group with themselves.
    Keeping ``group_id == id`` rows yields the deduplicated corpus with
    the smallest-id representative per duplicate cluster.

    ``algorithm``: 'label' (min-label propagation — diameter rounds,
    right for dense near-dup clusters) or 'star' (large-star/small-star
    — O(log n) rounds, right for long-chain / adversarial graphs)."""
    if algorithm == "label":
        comp = connected_components(pairs, id_a, id_b)
    elif algorithm == "star":
        comp = connected_components_star(pairs, id_a, id_b)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("group_id"),
        )
    )


def canonical_ids(groups: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deduplicated-corpus ids from a ``dedup_groups`` output: keep the
    smallest-id representative per duplicate cluster (the rows where
    ``group_id == id``).

    This is THE one-pass pattern for 'groups AND canonical corpus':
    compute ``dedup_groups`` once (persist/write it), then derive the
    canonical set with this narrow filter — NOT by re-running the pair
    graph + connected components. At corpus scale the pair graph is
    hours of work; this filter is a single scan of the (id, group_id)
    relation."""
    return groups.filter(F.col("group_id") == F.col(id_col)).select(id_col)


def portable_shingle_hash(s: Column) -> Column:
    """60-bit shingle hash any ANSI-SQL engine can reproduce bit-for-bit:
    the first 15 hex chars of md5, parsed base 16 (fits a signed 64-bit
    int, so no ANSI overflow on either side). The xxhash64 path is faster
    and preferred at scale; this one exists so SimHash outputs are
    oracle-checkable against an independent SQL engine."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def simhash_from_hashes(hashes: Column, n_bits: int = 64) -> Column:
    """SimHash over the low ``n_bits`` of a precomputed array<long> of
    shingle hashes, fully JVM-side: per bit position, sum sign
    contributions and take the majority sign. Expressed with aggregate()
    — no Python UDF. Empty/NULL hash arrays yield signature 0.

    Project the hash array into its own column first so the shingle
    transform is evaluated once, not n_bits times."""
    def _bit_vote(bit: int):
        # closure factory, not a default-arg lambda (arity matters — see
        # _salted_hash): aggregate's merge fn must be exactly 2-arg
        def merge(acc, h):
            set_bit = F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1
            return acc + F.when(set_bit, 1).otherwise(-1)

        return merge

    bits = []
    for bit in range(n_bits):
        # +1 if bit set else -1, summed across shingles
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _bit_vote(bit))
        bits.append(F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0)))
    expr = F.lit(0).cast("long")
    for bit, bcol in enumerate(bits):
        expr = expr + F.shiftleft(bcol, bit)
    return expr


def simhash_text_udf(shingle_n: int = 2, portable: bool = False):
    """Fused text→SimHash pandas UDF: normalize, shingle, hash, and the
    full n_bits bit-vote inside one Arrow batch.

    The Column-algebra form (:func:`simhash_from_hashes`) folds the hash
    array once PER BIT — 60-64 interpreted ``aggregate()`` passes per
    doc, measured ~15 s for 5k docs at sf0.1 — where numpy does the
    whole vote as one (shingles × bits) matrix op. Same recipe as
    :func:`minhash_text_udf`.

    ``portable=True`` reproduces :func:`portable_shingle_hash`
    bit-for-bit (first 15 md5 hex chars, base 16 — the oracle-checkable
    family); the default uses the kernel's own deterministic crc32/
    splitmix shingle family (fast scale path — families are not
    comparable to each other). Docs too short to shingle return NULL;
    callers decide whether that means "drop" or "signature 0".

    Like :func:`minhash_text_udf`, the returned UDF is marked
    ``asNondeterministic()`` to pin one evaluation per row (the kernel
    itself is pure) — use it in a projection, not directly inside a
    join condition or grouping key (Spark restricts nondeterministic
    expressions to Project/Filter/Aggregate/Window)."""
    import hashlib
    import zlib

    n_bits = 60 if portable else 64
    C2 = np.uint64(0xBF58476D1CE4E5B9)
    C3 = np.uint64(0x94D049BB133111EB)
    wmul = (C2 * np.arange(1, shingle_n + 1, dtype=np.uint64)) | np.uint64(1)
    bit_idx = np.arange(n_bits, dtype=np.uint64)

    def _mix(z: np.ndarray) -> np.ndarray:
        z = (z ^ (z >> np.uint64(30))) * C2
        z = (z ^ (z >> np.uint64(27))) * C3
        return z ^ (z >> np.uint64(31))

    @pandas_udf("long")
    def _sig(texts: pd.Series) -> pd.Series:
        norm = (
            texts.fillna("")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        out = []
        with np.errstate(over="ignore"):
            for doc in norm:
                words = doc.split(" ") if doc else []
                if len(words) < shingle_n:
                    out.append(None)
                    continue
                if portable:
                    grams = {
                        " ".join(words[i : i + shingle_n])
                        for i in range(len(words) - shingle_n + 1)
                    }
                    h = np.array(
                        [
                            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                            for g in grams
                        ],
                        dtype=np.uint64,
                    )
                else:
                    wh = np.array(
                        [zlib.crc32(w.encode("utf-8")) for w in words],
                        dtype=np.uint64,
                    )
                    k = len(wh) - shingle_n + 1
                    g = np.zeros(k, dtype=np.uint64)
                    for j in range(shingle_n):
                        g += wh[j : j + k] * wmul[j]
                    h = np.unique(_mix(g))
                bits = (h[:, None] >> bit_idx) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sig = int(((votes > 0).astype(np.uint64) << bit_idx).sum())
                out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pd.Series(out, dtype="object")

    # same single-evaluation pin as minhash_text_udf: drop_empty filters
    # on the signature column and pushdown would re-run the kernel below
    # the exchange (guide §4.4)
    return _sig.asNondeterministic()


def simhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    shingle_n: int = 2,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature into
    ``max_hamming + 1`` block keys; by pigeonhole, any pair within
    Hamming distance ≤ max_hamming has all differing bits confined to at
    most max_hamming blocks, so it shares ≥1 identical block — candidates
    come from an equi join on (block index, block value), never
    all-pairs — then an exact ``bit_count(xor)`` verify. Fully JVM-side.

    ``portable=True`` uses the SQL-reproducible 60-bit md5 signature
    family (see :func:`simhash_signatures`) so the pair output is
    oracle-checkable; default is the faster 64-bit xxhash64 family.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    n_bits = 60 if portable else 64
    n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= n_bits:
        raise ValueError(f"max_hamming must be in [0, {n_bits - 1}]")
    width = n_bits // n_blocks
    # drop docs too short to shingle: their empty hash set gives simhash 0,
    # and left in they'd all join into one hamming-0 clique — the same
    # quadratic tiny-doc blowup the MinHash path filters above
    sigs = simhash_signatures(
        df, text_col, id_col, shingle_n, drop_empty=True, portable=portable
    )

    def _block(i: int) -> Column:
        # block i covers bits [i*width, ...); the last block takes the
        # remaining high bits so all n_bits are covered
        shift = i * width
        w = n_bits - shift if i == n_blocks - 1 else width
        if n_blocks == 1:  # single block = the whole signature
            return F.col("simhash")
        # mask also clears the sign-extension bits of the arithmetic shift
        return F.shiftright(F.col("simhash"), shift).bitwiseAND(
            F.lit((1 << w) - 1)
        )

    blocks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("bi"), _block(i).alias("bv"))
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.bi", "b.bv")
    # in-bucket combination expansion, not a blocked self-join: the join
    # form evaluates the (60-64-term bit-vote) signature expression twice
    # — once per side — and shuffles both copies; grouping each block
    # bucket and expanding pairs with higher-order functions is one
    # signature pass and one shuffle. array_sort on struct(id, sig)
    # orders by id, so emitted pairs already satisfy id_a < id_b.
    buckets = (
        blocks.groupBy("bi", "bv")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("__e")
        )
        .filter(F.size("__e") >= 2)
    )
    n = F.size("__e")
    pairs = F.flatten(
        F.transform(
            "__e",
            lambda x, i: F.transform(
                F.slice(F.col("__e"), i + 2, n - i - 1),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.bit_count(
                        x["simhash"].bitwiseXOR(y["simhash"])
                    ).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    drop_empty: bool = False,
    portable: bool = False,
) -> DataFrame:
    """(id, simhash) table; near-dups = signatures within small Hamming
    distance, found by banding the bits into max_hamming+1 block keys
    (any equal block ⇒ candidate, by pigeonhole).

    ``drop_empty=True`` removes docs with no shingles (fewer than
    shingle_n words) — they all share simhash 0 and have no meaningful
    similarity to anything.

    ``portable=True`` uses the md5-based 60-bit
    :func:`portable_shingle_hash` family over string shingles, making
    the whole signature reproducible in any ANSI-SQL engine (the oracle
    path); the default is the kernel's fast deterministic crc32/splitmix
    family. Signatures from the two families are not comparable to each
    other. Both run through the fused Arrow kernel
    (:func:`simhash_text_udf`) — one vectorized vote instead of one
    interpreted fold per bit."""
    df = _spread(df)
    sig = simhash_text_udf(shingle_n, portable)
    out = df.select(F.col(id_col), sig(F.col(text_col)).alias("__sig"))
    if drop_empty:
        out = out.filter(F.col("__sig").isNotNull())
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("__sig"), F.lit(0).cast("long")).alias("simhash"),
    )


def remove_common_units(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_doc_frac: float = 0.5,
    delim: str = r"\n",
    joiner: str = "\n",
) -> DataFrame:
    """Corpus-frequency unit removal: split every document into units
    (lines by default — RefinedWeb-style line-level dedup; pass
    ``delim=r"\\s+"``/``joiner=" "`` for corpus-adaptive token scrub),
    drop every unit that occurs in at least ``min_doc_frac`` of all
    documents (boilerplate: nav bars, cookie banners, license headers),
    and reassemble each document preserving original unit order.

    Plan shape at scale: posexplode → groupBy(unit) distinct-doc count
    (partial-agg) → the common-unit set is SMALL by construction (only
    units crossing the corpus-wide threshold), so AQE turns the
    left_anti into a broadcast; reassembly is one shuffle on id with
    array_sort(collect_list(struct(pos, unit))) — no global sort. The
    document count rides in as a broadcast 1-row aggregate, never a
    driver collect.

    Returns every (non-empty) document: (id, clean_text, n_removed)."""
    t = F.trim(F.col(text_col))
    base = df.select(
        F.col(id_col), F.split(t, delim).alias("__u")
    ).filter(F.length(t) > 0)
    units = base.select(
        F.col(id_col), F.posexplode("__u").alias("pos", "unit")
    )
    total = base.select(F.count(F.lit(1)).alias("__n_docs"))
    freq = units.groupBy("unit").agg(
        F.count_distinct(F.col(id_col)).alias("__nd")
    )
    common = (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("__nd") >= F.col("__n_docs") * F.lit(min_doc_frac))
        .select("unit")
    )
    kept = units.join(common, "unit", "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda x: x["unit"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return base.select(F.col(id_col), F.size("__u").alias("__n_units")).join(
        clean, id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("__n_units") - F.coalesce("__n_kept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def dedup_paragraph_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = r"\n\n",
    joiner: str = "\n\n",
) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup (the RefinedWeb/CCNet
    boilerplate scrub at occurrence granularity): every repeated
    paragraph keeps ONLY its first occurrence in (doc, position) order;
    later copies are cut out of their documents and the documents are
    reassembled in original paragraph order. Complements
    `remove_common_units`, which drops units by corpus FREQUENCY — this
    one preserves a single canonical copy.

    Plan shape at scale: posexplode → one exchange on the paragraph
    content (window rank-1; group sizes = duplication counts, AQE
    handles boilerplate skew) → one exchange back on the doc id for
    ordered reassembly. Two shuffles total, no joins, single
    computation of the input. Whitespace-only paragraphs are dropped;
    docs with no surviving paragraph are excluded.

    Returns (id, text) with the cleaned text.
    """
    from pyspark.sql import Window

    paras = F.split(F.col(text_col), sep)
    exploded = df.select(
        F.col(id_col), F.posexplode(paras).alias("__pos", "__para")
    ).filter(F.trim("__para") != "")
    w = Window.partitionBy("__para").orderBy(F.col(id_col).asc(), F.col("__pos").asc())
    kept = exploded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__para"))
                    ),
                    lambda s: s["__para"],
                ),
                joiner,
            ).alias(text_col)
        )
    )


def dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    method: str = "near",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    duplicate_collapse: str = "auto",
    dup_stats: tuple[int, float, int] | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Cross-corpus dedup: drop ``new_df`` docs that duplicate ANY
    ``ref_df`` doc — the incremental-ingest shape (dedup a fresh crawl
    against the corpus you already trained on).

    ``duplicate_collapse`` (``method='near'`` only; the exact path is
    already hash-collapsed by construction): survival is a function of
    the normalized text alone, so on duplicate-heavy corpora the whole
    candidate+verify pipeline runs on one representative per distinct
    text PER SIDE and the surviving representatives fan back to members
    by fingerprint — without it, a duplicated text pays its cross-side
    bucket product and a shingle verify per member pair for an ANY-match
    answer the first pair already settles (the skewed-replica bench
    measured 3.8× uniform time). Result-exact on every input; ``"auto"``
    uses the pair family's max-group probe on the pooled corpora (see
    ``PAIR_COLLAPSE_BETA``): banding is linear in corpus size and
    in-bucket work parallelizes across groups, so only one group's
    serial hotspot, not uniform duplication, pays for the collapse
    machinery.

    ``method='exact'``: content-hash left-anti join — one shuffle on the
    hash, ref side reduced to distinct hashes first.

    ``method='near'``: one MinHash signature pass over the tagged union
    of both corpora, banded buckets expanded to CROSS-SIDE pairs only
    (new x ref inside each bucket — in-corpus pairs are never emitted),
    exact hashed-shingle Jaccard verify on the candidates, then an
    anti join removes matched new docs. Candidates come from (band,
    bucket) equality — never all-pairs — and the signature UDF runs
    once over each corpus.

    Returns the surviving ``new_df`` rows (original columns). Auto
    probe results are cached per (session, plan, column): if this
    session OVERWRITES the files behind either corpus and re-runs on an
    identical plan, call :func:`clear_dup_stats_cache` first or the
    auto switch plans from stale stats (plan choice only — both plans
    are result-exact).
    """
    if method == "exact":
        rh = ref_df.select(content_hash(F.col(text_col)).alias("__h")).distinct()
        return (
            new_df.withColumn("__h", content_hash(F.col(text_col)))
            .join(rh, "__h", "left_anti")
            .drop("__h")
        )
    if method != "near":
        raise ValueError(f"method must be 'exact' or 'near', got {method!r}")
    # ``dup_stats``, if supplied, must be the probe of the POOLED corpora
    # (new ∪ ref on the text column) — that is what auto probes here.
    # The probe id is SIDE-TAGGED before pooling (round-11 ADVICE): the
    # sampled probe selects members on a hash of the id, and the
    # re-ingest shape this operator exists for puts the same (id, text)
    # on both sides — untagged, such a doc's two copies enter the
    # sample together or not at all, so its same-group collisions occur
    # at rate s instead of s² and blowup_est/cmax_est inflate by up to
    # the sampling factor (plan-choice only, but it defeats the
    # calibrated decision parity). Distinct per-side prefixes
    # decorrelate inclusion while staying deterministic and salt-free.
    if _resolve_pair_collapse(
        new_df.select(
            F.concat(F.lit("n:"), F.col(id_col).cast("string")).alias("__pid"),
            F.col(text_col),
        ).unionAll(
            ref_df.select(
                F.concat(F.lit("r:"), F.col(id_col).cast("string")).alias("__pid"),
                F.col(text_col),
            )
        ),
        text_col,
        duplicate_collapse,
        beta=AGAINST_COLLAPSE_BETA,
        stats=dup_stats,
        id_col="__pid",
    ):
        return _dedup_against_collapsed(
            new_df, ref_df, text_col, id_col, threshold, num_hashes,
            bands, shingle_n, reliable,
        )

    sig_udf = minhash_text_udf(num_hashes, shingle_n)
    tagged = new_df.select(
        F.col(id_col), F.col(text_col), F.lit(True).alias("__is_new")
    ).unionByName(
        ref_df.select(
            F.col(id_col), F.col(text_col), F.lit(False).alias("__is_new")
        )
    )
    sig = tagged.select(
        id_col, "__is_new", sig_udf(F.col(text_col)).alias("__sig")
    ).filter(F.get(F.col("__sig"), 0).isNotNull())  # unshingleable docs out
    rows_per_band = num_hashes // bands
    banded = sig.select(
        id_col,
        "__is_new",
        F.explode(lsh_bands(F.col("__sig"), bands, rows_per_band)).alias("bb"),
    ).select(id_col, "__is_new", "bb.band", "bb.bucket")
    # per-bucket arrays of each side; expand new x ref pairs in place —
    # same single-pass layout as minhash_lsh_candidates, but the
    # expansion is the cross-side product only
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("__is_new"), F.col(id_col)))
            ).alias("__new"),
            F.sort_array(
                F.collect_list(F.when(~F.col("__is_new"), F.col(id_col)))
            ).alias("__ref"),
        )
        .filter((F.size("__new") > 0) & (F.size("__ref") > 0))
    )
    pairs = F.flatten(
        F.transform(
            "__new",
            lambda x: F.transform(
                F.col("__ref"),
                lambda y: F.struct(x.alias("id_new"), y.alias("id_ref")),
            ),
        )
    )
    cands = iter_checkpoint(
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_new", "p.id_ref")
        .distinct(),
        reliable,
    )
    # exact verify: shingle only candidate docs, per side
    def _shingles(side_df, ids, alias):
        pruned = side_df.join(ids, id_col, "left_semi")
        # two-step select: materialize the word-hash array as a column
        # FIRST (hashed_shingles_from_words' documented precondition) —
        # inlining it re-evaluates the array once per gram, O(words^2)
        wh = pruned.select(
            F.col(id_col).alias(alias),
            word_hashes(F.col(text_col)).alias("__wh"),
        )
        return wh.select(
            F.col(alias),
            hashed_shingles_from_words(F.col("__wh"), shingle_n).alias(
                f"__sh_{alias}"
            ),
        )

    sh_new = _shingles(
        new_df, cands.select(F.col("id_new").alias(id_col)).distinct(), "id_new"
    )
    sh_ref = _shingles(
        ref_df, cands.select(F.col("id_ref").alias(id_col)).distinct(), "id_ref"
    )
    matched = (
        cands.join(sh_new, "id_new")
        .join(sh_ref, "id_ref")
        .withColumn(
            "__j",
            F.size(F.array_intersect("__sh_id_new", "__sh_id_ref"))
            / F.size(F.array_union("__sh_id_new", "__sh_id_ref")),
        )
        .filter(F.col("__j") >= threshold)
        .select(F.col("id_new").alias(id_col))
        .distinct()
    )
    return new_df.join(matched, id_col, "left_anti")


def _dedup_against_collapsed(
    new_df, ref_df, text_col, id_col, threshold, num_hashes, bands, shingle_n,
    reliable=False,
) -> DataFrame:
    """Representative-collapsed cross-corpus near-dedup (see
    dedup_against): run the candidate+verify pipeline on one
    representative per distinct normalized text per side, then fan the
    surviving representatives back to members by fingerprint. Exact:
    signatures and Jaccard scores are text-determined, so a member
    survives iff its representative does."""
    nfp = iter_checkpoint(
        new_df.select(
            F.col(id_col), content_hash(F.col(text_col)).alias("__fp")
        ),
        reliable,
    )
    nrep = nfp.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    nreps_df = new_df.join(nrep.select(F.col("__rep").alias(id_col)), id_col)
    rreps = (
        ref_df.select(F.col(id_col), content_hash(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias("__rep"))
        .select(F.col("__rep").alias(id_col))
    )
    rreps_df = ref_df.join(rreps, id_col)
    surviving = dedup_against(
        nreps_df, rreps_df, text_col, id_col, "near",
        threshold, num_hashes, bands, shingle_n,
        duplicate_collapse="never", reliable=reliable,
    ).select(F.col(id_col).alias("__rep"))
    surv_fp = nrep.join(surviving, "__rep").select("__fp")
    keep = nfp.join(surv_fp, "__fp").select(id_col)
    return new_df.join(keep, id_col, "left_semi")


def _token_kgrams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, gram-hash) for every token k-gram, 1-based positions.

    The gram travels as xxhash64 of the joined token window — 8 bytes
    through the shuffle instead of a k-token string (collision odds
    ~n²/2⁶⁴: immaterial against corpus sizes, and any collision only
    ever ADDS a candidate span, mirroring the hashed variants of the
    suffix-array protocol)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = _spread(df).select(F.col(id_col), words.alias("__w")).filter(
        F.size("__w") >= k
    )
    idx = F.sequence(F.lit(1), F.size("__w") - F.lit(k - 1))
    grams = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.array_join(F.slice("__w", i, k), " ")).alias("h"),
        ),
    )
    return (
        base.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(F.col(id_col), F.col("__g.pos").alias("pos"), F.col("__g.h").alias("h"))
    )


def duplicate_substring_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    scope: str = "cross",
) -> DataFrame:
    """Exact-substring duplicate spans — the suffix-array dedup protocol
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), re-expressed Spark-first for a fixed minimum match
    length ``k``: any span of ≥ k consecutive tokens that also appears
    in another document is reported as a duplicated region.

    A span of length L ≥ k is shared iff ALL of its L-k+1 token k-grams
    are shared, so a k-gram posting join finds exactly the same regions
    a corpus suffix array would for match threshold k: explode token
    k-grams with positions, keep grams seen in ≥ 2 distinct documents
    (``scope='cross'``) or ≥ 2 occurrences anywhere incl. within-doc
    repeats (``scope='any'``), then merge consecutive shared positions
    per document (gaps-and-islands) into maximal spans.

    Plan shape at 100 TB: one explode (rows ≈ corpus token count, but
    only (id, pos, hash8) wide), one partial-agg groupBy on the gram
    hash, one equi join back, one window on (id) — three linear
    shuffles, no all-pairs, no global sort. Skew: a stop-gram shared by
    millions of docs costs groupBy+join fan-out; AQE skew-join splits
    it, and the count-distinct partial agg caps the groupBy side.

    Returns (id, start_pos, end_pos, span_tokens), positions 1-based
    over whitespace tokens of the normalized text.
    """
    from pyspark.sql import Window

    if scope not in ("cross", "any"):
        raise ValueError(f"scope must be cross/any, got {scope!r}")
    # the posting table feeds TWO consumers (the shared-gram aggregate
    # and the join back) with different downstream shapes, so Catalyst
    # gets no exchange reuse and the scan+normalize+k-gram explode ran
    # twice (plan-audited: two Generate nodes over the corpus scan).
    # Materialize once — the same recipe as the jaccard posting table
    # and the BM25 inverted index.
    ex = iter_checkpoint(_token_kgrams(df, text_col, id_col, k), False)
    if scope == "cross":
        # "gram appears in >= 2 DISTINCT docs" == min(id) != max(id):
        # count_distinct plans as TWO aggregation exchanges (a (h, id)
        # dedup pass, then the count by h — 2 x 5.4 MiB / 235k records
        # at sf0.1, the operator's dominant shuffles); min/max is one
        # exchange with perfect map-side combining. Result-identical,
        # null-identical (min/max and count_distinct both ignore nulls).
        shared = (
            ex.groupBy("h")
            .agg(F.min(F.col(id_col)).alias("__lo"), F.max(F.col(id_col)).alias("__hi"))
            .filter(F.col("__lo") != F.col("__hi"))
        )
    else:
        shared = (
            ex.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__nd"))
            .filter(F.col("__nd") >= 2)
        )
    # left_semi, not inner: identical rows (shared has one row per h),
    # but the semi join pins the BUILD side to the aggregated gram set —
    # as a plain inner join the planner built the hash relation from the
    # FULL posting table (24 MB broadcast at sf0.1, plan-audited) because
    # the post-filter aggregate side carries no usable size estimate.
    marked = ex.join(shared.select("h"), "h", "left_semi")
    # islands must merge OVERLAPPING/adjacent covered regions, not only
    # CONSECUTIVE gram positions: shared grams at positions p and p+2
    # (gap < k) cover one contiguous token range, and pos - row_number
    # split them into two overlapping "maximal" spans that double-count
    # tokens. Break only when the gap exceeds k (regions [p, p+k-1] and
    # [q, q+k-1] are disjoint with a hole iff q > p + k).
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    brk = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") - F.lag("pos").over(w) > k),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = marked.withColumn(
        "__grp",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_pos"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias("span_tokens"),
        )
        .drop("__grp")
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    scope: str = "cross",
) -> DataFrame:
    """Remove every token covered by a duplicated ≥ k-token span (see
    :func:`duplicate_substring_spans`) and reassemble the document —
    the destructive half of the Lee et al. 2022 ExactSubstr protocol
    (their tool likewise cuts ALL copies of a duplicated byte range;
    dropping all occurrences is the conservative-contamination variant).

    Spans per doc are few and short (they are merged maximal islands),
    so they ride back to the document as ONE collected array per doc —
    an equi join on id, never a positions×tokens blow-up — and the
    token filter is a zero-shuffle higher-order expression over the
    token array.

    Returns (id, n_tokens, n_removed, text_clean) for EVERY input doc.
    Span DETECTION runs on normalized (lowercased) tokens, but
    reconstruction keeps the ORIGINAL token casing — positions align
    1:1 because normalization only lowercases and collapses whitespace,
    so a doc with no duplicated span passes through with its casing
    intact (newline runs still collapse to single spaces: tokenization
    is whitespace-collapsing by construction).
    """
    spans = duplicate_substring_spans(df, text_col, id_col, k, scope)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_pos", "end_pos")).alias("__spans")
    )
    words = F.split(
        F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "
    )
    base = df.select(F.col(id_col), words.alias("__w"))
    joined = base.join(per_doc, id_col, "left").withColumn(
        "__spans",
        F.coalesce(
            "__spans",
            F.array().cast("array<struct<start_pos:bigint,end_pos:bigint>>"),
        ),
    )

    def _kept(i):
        return ~F.exists(
            "__spans",
            lambda s: (i >= s["start_pos"]) & (i <= s["end_pos"]),
        )

    kept_idx = F.filter(
        F.sequence(F.lit(1), F.size("__w")).cast("array<bigint>"), _kept
    )
    kept = F.transform(kept_idx, lambda i: F.element_at("__w", i.cast("int")))
    return joined.select(
        F.col(id_col),
        F.size("__w").cast("long").alias("n_tokens"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("text_clean"),
    )
