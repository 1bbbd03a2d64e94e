"""Lineage-truncation helper for iterative operators.

Iterative DataFrame algorithms (connected components, PageRank, the
distributed prefix-sum stitch) must truncate lineage each round or plan
size grows without bound. The default is ``localCheckpoint``: fast, no
configuration, but blocks are stored UNREPLICATED on executors — losing
an executor mid-job (preemption, dynamic-allocation downscale) makes
the job fail loudly and need a re-run. It never returns wrong results;
the cost is retry time.

For long-running cluster jobs where that retry cost matters, callers
can pass ``reliable=True`` to the operators that expose it: lineage is
then truncated through ``DataFrame.checkpoint``, which writes to the
durable ``spark.sparkContext.setCheckpointDir`` location (HDFS/object
store) and survives executor loss. Slower — every checkpoint is a full
write to durable storage — and requires the checkpoint dir to be set,
or Spark raises at materialization time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# The iterative operators (connected components, PageRank) also expose
# ``pin_partitioning=True``: the relation an iteration re-reads is
# hash-partitioned on its join key once and persist-ed (a cached
# InMemoryRelation keeps its output partitioning under AQE, so the
# per-iteration join stops re-shuffling it). Deliberately OPT-IN, not
# size-triggered: the avoided exchange only pays where it crosses a
# network. Single-node measurements refuted an edge-count threshold —
# at 8M edges on local[32] the pinned PageRank ran ~2x SLOWER (local
# shuffle writes hit the page cache while the columnar cache scan and
# the fixed partition count AQE can no longer coalesce cost real time),
# and pinned CC was a wash at 6M pairs. On a multi-rack cluster the
# unpinned plan re-ships the full edge table all-to-all every
# iteration; pinning replaces that with a node-local cache read — the
# standard GraphX/Pregel edge-placement strategy.


def iter_checkpoint(
    df: DataFrame, reliable: bool = False, eager: bool = False
) -> DataFrame:
    """Truncate lineage: ``localCheckpoint`` (default) or a reliable
    ``checkpoint`` when ``reliable=True`` (see module docstring)."""
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
