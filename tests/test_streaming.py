"""Structured Streaming parity: the tumbling agg / dedup / session-window
operators run under readStream with a file source and produce the same
results as their batch forms."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import Row, functions as F

from datamine_v2_0_spark.streaming.ops import (
    streaming_dedup,
    streaming_session_windows,
    streaming_hopping_agg,
    streaming_tumbling_agg,
)

T0 = datetime(2025, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """A small parquet dir consumed both as batch and as a stream."""
    path = str(tmp_path_factory.mktemp("stream") / "src")
    rows = [
        Row(k="a", ts=T0 + timedelta(seconds=s), v=float(i))
        for i, s in enumerate([0, 1, 2, 7, 8, 40, 41, 42])
    ]
    # duplicate event (same key+ts) to exercise dedup
    rows.append(Row(k="a", ts=T0 + timedelta(seconds=1), v=99.0))
    df = spark.createDataFrame(rows)
    df.write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, src_path, transform):
    stream = spark.readStream.schema(
        "k string, ts timestamp, v double"
    ).parquet(src_path)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sink_tbl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return spark.sql("SELECT * FROM sink_tbl")


def test_streaming_tumbling_matches_batch(spark, stream_src):
    def xform(df):
        return streaming_tumbling_agg(
            df, "ts", "5 seconds",
            [F.count(F.lit(1)).alias("n"), F.round(F.avg("v"), 6).alias("avg_v")],
            extra_keys=["k"],
        )

    got = {
        r["bucket_start"].replace(tzinfo=timezone.utc): (r["n"], r["avg_v"])
        for r in _run_stream(spark, stream_src, xform).collect()
    }
    batch = spark.read.parquet(stream_src)
    expected = {
        r["bucket_start"].replace(tzinfo=timezone.utc): (r["n"], r["avg_v"])
        for r in xform(batch).collect()
    }
    assert got == expected
    assert T0 in got and got[T0][0] == 4  # 0,1,2 + the dup at 1


def test_streaming_hopping_matches_batch_operator(spark, stream_src):
    """The streaming sliding window and the batch hopping_agg must agree
    window-for-window (identical F.window bucketing)."""
    from datamine_v2_0_spark.operators.aggregates import hopping_agg

    def xform(df):
        return streaming_hopping_agg(
            df, "ts", "10 seconds", "5 seconds",
            [F.count(F.lit(1)).alias("n"), F.round(F.avg("v"), 6).alias("avg_v")],
            extra_keys=["k"],
        )

    got = {
        r["window_start"].replace(tzinfo=timezone.utc): (r["n"], r["avg_v"])
        for r in _run_stream(spark, stream_src, xform).collect()
    }
    batch = spark.read.parquet(stream_src)
    expected = {
        r["window_start"].replace(tzinfo=timezone.utc): (r["n"], r["avg_v"])
        for r in hopping_agg(
            batch, "ts", "10 seconds", "5 seconds",
            [F.count(F.lit(1)).alias("n"), F.round(F.avg("v"), 6).alias("avg_v")],
            extra_keys=["k"],
        ).collect()
    }
    assert got == expected
    # every event lands in exactly 2 windows (10s / 5s)
    assert sum(n for n, _ in got.values()) == 2 * 9


def test_streaming_dedup(spark, stream_src):
    def xform(df):
        return streaming_dedup(df, ["k", "ts"], "ts").groupBy("k").agg(
            F.count(F.lit(1)).alias("n")
        )

    got = _run_stream(spark, stream_src, xform).collect()
    assert got[0]["n"] == 8  # 9 rows, 1 duplicate (k, ts)


def test_foreach_batch_upsert(spark, stream_src, tmp_path):
    from datamine_v2_0_spark.streaming.ops import foreach_batch_upsert

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(
        stream_src
    )
    q = foreach_batch_upsert(stream, target, ["k", "ts"], "v", ckpt)
    q.awaitTermination(60)

    back = spark.read.parquet(target)
    # 9 source rows, one duplicate (k, ts) pair -> 8 keys; the kept row for
    # the dup key is the max-v one (v=99 beats v=1)
    assert back.count() == 8
    dup_ts = T0 + timedelta(seconds=1)
    kept = back.filter(F.col("ts") == dup_ts).collect()
    assert len(kept) == 1 and kept[0]["v"] == 99.0

    # re-running the same availableNow stream from the checkpoint is a
    # no-op (batches already committed) -> still 8 rows
    stream2 = spark.readStream.schema("k string, ts timestamp, v double").parquet(
        stream_src
    )
    q2 = foreach_batch_upsert(stream2, target, ["k", "ts"], "v", ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(target).count() == 8


def test_streaming_state_changes_across_batches(spark, tmp_path):
    from datamine_v2_0_spark.streaming.ops import streaming_state_changes

    # three files = three micro-batches (maxFilesPerTrigger=1); the d->e
    # transition straddles the batch-2/batch-3 boundary, and batch 3 opens
    # with the SAME state batch 2 ended on (e==e: no spurious event) —
    # both only work if GroupState persists across batches
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [("a", 0, "x"), ("a", 1, "x"), ("a", 2, "y")],
        [("a", 3, "y"), ("a", 4, "d"), ("b", 5, "p")],
        [("a", 6, "d"), ("a", 7, "e"), ("b", 8, "p"), ("b", 9, "q")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [Row(k=k, ts=T0 + timedelta(seconds=s), state=st) for k, s, st in rows]
        ).coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = spark.readStream.schema("k string, ts timestamp, state string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "b*"))
    out = streaming_state_changes(stream, ["k"], "ts", "state")
    q = (
        out.writeStream.format("memory")
        .queryName("state_changes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["ts"].replace(tzinfo=timezone.utc), r["prev_state"], r["new_state"])
        for r in spark.sql("SELECT * FROM state_changes").collect()
    }
    t = lambda s: T0 + timedelta(seconds=s)
    assert got == {
        ("a", t(0), None, "x"),
        ("a", t(2), "x", "y"),
        ("a", t(4), "y", "d"),
        ("a", t(7), "d", "e"),
        ("b", t(5), None, "p"),
        ("b", t(9), "p", "q"),
    }


def test_streaming_session_windows(spark, stream_src):
    def xform(df):
        return streaming_session_windows(
            df, "ts", ["k"], "10 seconds", [F.count(F.lit(1)).alias("n")]
        )

    rows = _run_stream(spark, stream_src, xform).collect()
    # gaps: [0..8] then [40..42] -> 2 sessions
    assert len(rows) == 2
    assert sorted(r["n"] for r in rows) == [3, 6]


def test_quality_gate_composes_with_streams(spark, tmp_path):
    """The curation gate is a stateless projection, so it runs unchanged
    under readStream (append mode, no watermark needed) — a stream of
    documents can be quality-filtered with the exact batch operator."""
    from datamine_v2_0_spark.operators import text as tx

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over that lazy sleeping dog today"),
            (2, "### ###"),
        ],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    out = tx.gopher_gate(stream, "text", "doc_id", min_words=10)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("gate_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM gate_sink").collect()}
    assert rows[1]["passes"] is True
    assert rows[2]["passes"] is False


def test_streaming_ewma_across_batches_matches_batch(spark, tmp_path):
    """The EWMA recurrence must continue across micro-batch boundaries
    from persisted state, and the full streamed result must equal the
    batch ewma_smooth fold over the same rows."""
    from datamine_v2_0_spark.operators import timeseries as tsr
    from datamine_v2_0_spark.streaming.ops import streaming_ewma

    src = tmp_path / "ewma_src"
    src.mkdir()
    batches = [
        [("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 4.0)],
        [("a", 2, 0.0), ("b", 1, 8.0)],
        [("a", 3, 40.0), ("b", 2, 0.0)],
    ]
    all_rows = [r for b in batches for r in b]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [Row(k=k, ts=T0 + timedelta(seconds=s), v=v) for k, s, v in rows]
        ).coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = spark.readStream.schema("k string, ts timestamp, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "b*"))
    out = streaming_ewma(stream, ["k"], "ts", "v", alpha=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["ts"].replace(tzinfo=timezone.utc)): r["ewma"]
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }
    t = lambda s: T0 + timedelta(seconds=s)
    # hand recurrence: a: 10 -> 15 -> 7.5 -> 23.75 ; b: 4 -> 6 -> 3
    assert got[("a", t(2))] == pytest.approx(7.5)       # crosses b1/b2
    assert got[("a", t(3))] == pytest.approx(23.75)     # crosses b2/b3
    assert got[("b", t(2))] == pytest.approx(3.0)
    # full parity with the batch fold
    batch_df = spark.createDataFrame(
        [Row(k=k, ts=T0 + timedelta(seconds=s), v=v) for k, s, v in all_rows]
    )
    want = {
        (r["k"], r["ts"].replace(tzinfo=timezone.utc)): r["ewma"]
        for r in tsr.ewma_smooth(batch_df, ["k"], "ts", "v", 0.5).collect()
    }
    assert len(got) == len(want) == len(all_rows)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, abs=1e-9)
