"""Plan-shape assertions: the scale contract of the flagship queries.

These encode "would this survive 100×": filters reach the scan, small
dims broadcast, window stacks share exchanges, projections prune columns.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    python_eval_nodes,
    read_schema,
)

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata absent"
)


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30.0).select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert any("l_quantity" in f for f in pf), pf
    rs = read_schema(q)
    assert set(rs) == {"l_orderkey", "l_quantity"}, rs


def test_small_dim_join_broadcasts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    j = li.join(o, "l_orderkey")
    assert has_broadcast_join(j)


def test_flagship_revenue_plan(spark):
    from datamine_v2_0_spark.contract import QUERIES

    df = QUERIES["join_equi_revenue"][0](spark, SF)
    # joins broadcast (dims are small), so shuffles = final groupBy only
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 2
    # the relational hot path must never cross into Python
    assert python_eval_nodes(df) == 0


def test_window_stack_shares_exchange(spark):
    from datamine_v2_0_spark.contract import QUERIES

    df = QUERIES["win_rolling"][0](spark, SF)
    # one window partitioning -> exactly one shuffle
    assert count_exchanges(df) == 1


def test_candidate_generation_never_all_pairs(spark):
    """LSH / inverted-index candidate generation must be equi-join
    shaped — an accidental cross product is the one failure mode that
    cannot survive any scale-up."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.plans import has_cartesian

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    assert not has_cartesian(
        dd.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=32, bands=8)
    )
    assert not has_cartesian(
        dd.jaccard_pairs_inverted(docs, "text", "doc_id", threshold=0.2)
    )
    assert not has_cartesian(
        dd.embedding_neardup_pairs(emb, "embedding", "vec_id", dim=64,
                                   threshold=0.35, num_planes=32, bands=16)
    )
    assert not has_cartesian(
        dd.simhash_candidates(docs, "text", "doc_id", max_hamming=3)
    )
    # ... and the exact baseline IS all-pairs, so the inspector itself
    # is exercised in both directions
    assert has_cartesian(
        dd.embedding_neardup_pairs(emb, "embedding", "vec_id", dim=64,
                                   threshold=0.35, exact=True)
    )


def test_group_resolution_plans_stay_equi_join(spark):
    """Connected-components rounds (both algorithms) and the pruned
    Jaccard verify must remain equi-join shaped — the iterative rewiring
    must never degenerate to a cross product."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.plans import has_cartesian

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    # checkpoint=False keeps the per-round joins IN the returned lineage;
    # with the default checkpointing the plan is truncated to a scan of
    # the checkpointed RDD and the assertion would be vacuous
    assert not has_cartesian(
        dd.connected_components(pairs, checkpoint=False)
    )
    assert not has_cartesian(
        dd.connected_components_star(pairs, checkpoint=False)
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cands = dd.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=32, bands=8
    )
    assert not has_cartesian(
        dd.ngram_jaccard_pairs(cands, docs, "text", "doc_id", threshold=0.2)
    )


def test_cc_hop_reuses_partitioned_edge_cache(spark):
    """The connected-components hop joins the (largest) edge relation on
    ``dst`` every round; the edge set is hash-partitioned on ``dst`` once
    and persisted, so each hop shuffles ONLY the label table. A
    checkpointed edge table would re-shuffle per hop: localCheckpoint's
    LogicalRDD reports UnknownPartitioning under AQE."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.plans.inspect import (
        count_live_exchanges,
        executed_plan,
    )
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 2)], "id_a long, id_b long"
    )
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .repartition(n, "dst")
        .persist()
    )
    try:
        edges.count()
        lab = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
        )
        hop = dd._cc_hop(edges, lab)
        plan = executed_plan(hop)
        assert "InMemoryTableScan" in plan, plan
        # live shuffles: labels->dst, groupBy->src, labels->node. The
        # edge side reads the cache co-partitioned (a 4th exchange here
        # means the cache partitioning was lost).
        assert count_live_exchanges(hop) <= 3, plan
    finally:
        edges.unpersist()


def test_cc_pinned_path_matches_default(spark):
    """The opt-in pinned edge layout must be a pure physical choice —
    identical (node, comp) labeling to the default path."""
    from datamine_v2_0_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 7), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    base = sorted(
        tuple(r) for r in dd.connected_components(pairs).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in dd.connected_components(pairs, pin_partitioning=True).collect()
    )
    assert base == pinned, (base, pinned)


def test_pagerank_iterations_reuse_partitioned_caches(spark):
    """Each PageRank iteration re-reads the edge+degree table (join on
    src) and the node table (join on node); both are hash-partitioned on
    their join keys and persisted, so per-iteration live shuffles are
    the rank table and the contribution aggregate only."""
    from datamine_v2_0_spark.operators.graph import pagerank
    from datamine_v2_0_spark.plans.inspect import (
        count_live_exchanges,
        executed_plan,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(200)], "src long, dst long"
    )
    # pin_partitioning is opt-in (a network-bound-cluster optimization);
    # enable it here to pin the at-scale plan shape on a small fixture
    pr = pagerank(edges, n_iter=3, ckpt_every=10, pin_partitioning=True)
    plan = executed_plan(pr)
    assert "InMemoryTableScan" in plan, plan
    # 3 in-lineage iterations: ~3 live exchanges each (rank join + the
    # contribution aggregate) + the final rank projection. Re-shuffling
    # the cached edge+degree or node tables adds 2 per iteration and
    # trips this bound.
    assert count_live_exchanges(pr) <= 10, plan


def test_corpus_curation_plans(spark):
    """The r3 curation operators' scale contracts: decontamination joins
    the eval gram set broadcast (train grams never shuffle), unit removal
    and budget sampling never form a cross product beyond the intentional
    1-row aggregate broadcasts, and the LSH candidate stages contain NO
    join at all (in-bucket pair expansion replaced the banded self-join,
    halving signature computation)."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.operators import filters as flt
    from datamine_v2_0_spark.operators import text as tx
    from datamine_v2_0_spark.plans import has_broadcast_join

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    ev = docs.filter(F.col("doc_id") % 29 == 0)
    tr = docs.filter(F.col("doc_id") % 29 != 0)
    dec = tx.decontaminate(tr, ev, "text", "doc_id", n=4)
    assert has_broadcast_join(dec)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    rm = dd.remove_common_units(
        docs, "text", "doc_id", min_doc_frac=0.6, delim=r"\s+", joiner=" "
    )
    rm_plan = rm._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rm_plan

    tok = docs.select(
        "doc_id", "source", tx.token_count_ws(F.col("text")).alias("n")
    )
    tb = flt.sample_to_token_budget(tok, "source", "n", "doc_id", budget=500)
    assert "CartesianProduct" not in (
        tb._jdf.queryExecution().executedPlan().toString()
    )

    # the rebuilt LSH candidate stages are join-free aggregate pipelines
    for cand in (
        dd.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=32, bands=8),
        dd.simhash_candidates(docs, "text", "doc_id", max_hamming=3),
    ):
        p = cand._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in p, p


def test_gopher_gate_is_exchange_free(spark):
    """The quality gate is a pure projection over the scan: zero
    exchanges, zero Python eval nodes — the property that lets a 100 TB
    filter pass run at scan speed ahead of any shuffle-paying stage."""
    from datamine_v2_0_spark.operators import text as tx
    from datamine_v2_0_spark.plans import count_exchanges, python_eval_nodes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    gate = tx.gopher_gate(docs, "text", "doc_id", min_words=10)
    assert count_exchanges(gate) == 0
    assert python_eval_nodes(gate) == 0


def test_curation_pipeline_plan(spark):
    """End-to-end curation stays on the scale contract: no cartesian
    product anywhere, the decontamination gram join broadcasts, and no
    Python eval node appears (the whole chain is JVM codegen)."""
    from datamine_v2_0_spark.pipeline.curation import curate_corpus
    from datamine_v2_0_spark.plans import has_cartesian, python_eval_nodes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    tr = docs.filter(F.col("doc_id") % 29 != 0)
    out = curate_corpus(tr, ev, "text", "doc_id", min_stopwords=1)
    assert not has_cartesian(out)
    assert python_eval_nodes(out) == 0
    assert "BroadcastHashJoin" in (
        out._jdf.queryExecution().executedPlan().toString()
    )


def test_curation_barrier_single_prefix(spark, tmp_path):
    """barrier='checkpoint' materializes the scan→gate→dedup prefix
    once: the decontamination anti join's two branches both read the
    checkpointed RDD, so the train parquet scan disappears from the
    final plan entirely (it ran once, inside the checkpoint job). The
    default (barrier=None) plan scans the train source twice — the
    documented caveat the barrier exists to remove. Both modes and the
    'table' barrier must return identical rows."""
    from datamine_v2_0_spark.pipeline.curation import curate_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    tr = docs.filter(F.col("doc_id") % 29 != 0)

    lazy = curate_corpus(tr, ev, "text", "doc_id", min_stopwords=1)
    lazy_plan = lazy._jdf.queryExecution().executedPlan().toString()
    # eval side scans documents once; the doubled prefix makes 3 total
    assert lazy_plan.count("Scan parquet") == 3

    ck = curate_corpus(
        tr, ev, "text", "doc_id", min_stopwords=1, barrier="checkpoint"
    )
    ck_plan = ck._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in ck_plan
    # only the eval-set branch still reads parquet
    assert ck_plan.count("Scan parquet") == 1

    expect = {tuple(r) for r in lazy.collect()}
    assert {tuple(r) for r in ck.collect()} == expect

    tbl = curate_corpus(
        tr, ev, "text", "doc_id", min_stopwords=1,
        barrier="table", staging_path=str(tmp_path / "staged"),
    )
    assert {tuple(r) for r in tbl.collect()} == expect

    import pytest as _pytest

    with _pytest.raises(ValueError, match="staging_path"):
        curate_corpus(tr, ev, "text", "doc_id", barrier="table")
    with _pytest.raises(ValueError, match="barrier"):
        curate_corpus(tr, ev, "text", "doc_id", barrier="persist")


def test_pair_stream_clustering_removes_pair_exchange(spark):
    """In the broadcast regime the posting self-join's stream side is
    hash-partitioned by doc id (_cluster_pair_stream), so the pair
    aggregation runs exchange-free: HashPartitioning(id_a) satisfies
    ClusteredDistribution([id_a, id_b, ...]). The only shuffle keyed on
    the pair columns would be the old 69-MiB-at-sf0.1 pair exchange —
    assert it is gone, and that results are identical to the
    no-broadcast (SMJ) regime where the clustering must not fire."""
    from datamine_v2_0_spark.operators import dedup as dd
    from datamine_v2_0_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dd.jaccard_pairs_inverted(docs, "text", "doc_id", threshold=0.2)
    plan = executed_plan(pairs)
    # the stream-side repartition is the ONLY hashpartitioning exchange,
    # keyed on the doc id — no exchange keyed on the pair alias columns
    assert "Exchange hashpartitioning(doc_id" in plan, plan
    assert "Exchange hashpartitioning(id_a" not in plan, plan
    expect = {tuple(r) for r in pairs.collect()}

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        smj_pairs = dd.jaccard_pairs_inverted(
            docs, "text", "doc_id", threshold=0.2
        )
        smj_plan = executed_plan(smj_pairs)
        # no broadcast -> the gate must not add the doc-keyed shuffle
        assert "Exchange hashpartitioning(doc_id" not in smj_plan, smj_plan
        assert {tuple(r) for r in smj_pairs.collect()} == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    cont = dd.containment_pairs_inverted(docs, "text", "doc_id", threshold=0.3)
    cplan = executed_plan(cont)
    assert "Exchange hashpartitioning(id_a" not in cplan, cplan


def test_broadcast_threshold_bytes_parsing(spark):
    from datamine_v2_0_spark.operators.dedup import _broadcast_threshold_bytes

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in [
            ("10485760", 10485760),
            ("10MB", 10 * 1024 * 1024),
            ("64m", 64 * 1024 * 1024),
            ("1g", 1 << 30),
            ("512k", 512 * 1024),
            ("123b", 123),
            ("-1", 0),
        ]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _broadcast_threshold_bytes(spark) == want, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
