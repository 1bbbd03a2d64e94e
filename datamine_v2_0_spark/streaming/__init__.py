"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only; these wrappers are the optional streaming
upgrades of its streaming-shaped constructs, sharing the same operator
semantics so a batch query can be re-run incrementally unchanged.
"""

from datamine_v2_0_spark.streaming.ops import (  # noqa: F401
    streaming_tumbling_agg,
    streaming_dedup,
    streaming_session_windows,
)
