"""Late / out-of-order data semantics per stateful streaming family
(VERDICT r1 #8).

Each test replays a deterministic out-of-order arrival with TWO
``availableNow`` runs sharing a checkpoint (the technique from
``test_streaming_watermark.py``): run 1 advances the persisted watermark,
run 2 delivers an event whose event time is below it. This is the
arrival-order behavior no batch oracle can express, pinned per family:

- session windows: a closed session is never reopened/extended by a
  sub-watermark event;
- stream-stream inner join: a late probe row below the join watermark
  produces no output;
- dropDuplicatesWithinWatermark: duplicate suppressed within the
  watermark, re-emitted after state eviction;
- custom state (transformWithStateInPandas): micro-batch split is
  invisible — one batch vs two batches with a checkpoint land on the
  identical final state.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _write(dirpath: str, name: str, rows: list[tuple[str, str]]) -> None:
    ts = pa.array([r[0] for r in rows], type=pa.string())
    k = pa.array([r[1] for r in rows], type=pa.string())
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(pa.table({"ts_s": ts, "k": k}), os.path.join(dirpath, name))


def _stream(spark, indir: str):
    return (
        spark.readStream.schema("ts_s string, k string")
        .parquet(indir)
        .withColumn("ts", F.to_timestamp("ts_s"))
    )


def _drain(df, outdir: str, ckpt: str, mode: str = "append") -> None:
    q = (
        df.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.slow
def test_session_window_not_reopened_by_late_event(spark, scratch):
    indir, outdir, ckpt = (os.path.join(scratch, d) for d in ("in", "out", "ck"))

    def run():
        agg = (
            _stream(spark, indir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "5 minutes"), F.col("k"))
            .agg(F.count("*").alias("n"))
            .select(
                F.col("session_window.start").cast("string").alias("s"),
                F.col("session_window.end").cast("string").alias("e"),
                "k",
                "n",
            )
        )
        _drain(agg, outdir, ckpt)

    # run 1: a 2-event session for key a (10:00, 10:02 -> session closes at
    # 10:07) plus a 12:00 event pushing the checkpointed watermark to 11:50,
    # which finalizes and emits the a-session
    _write(
        indir,
        "0.parquet",
        [
            ("2024-01-01 10:00:00", "a"),
            ("2024-01-01 10:02:00", "a"),
            ("2024-01-01 12:00:00", "z"),
        ],
    )
    run()
    # run 2: late a-event at 10:04 — inside the closed session's gap, but
    # below the watermark: it must NOT reopen or re-emit the session
    _write(indir, "1.parquet", [("2024-01-01 10:04:00", "a"), ("2024-01-01 13:00:00", "z2")])
    run()

    out = spark.read.parquet(outdir)
    a_rows = [tuple(r) for r in out.filter(F.col("k") == "a").collect()]
    assert a_rows == [("2024-01-01 10:00:00", "2024-01-01 10:07:00", "a", 2)], a_rows


@pytest.mark.slow
def test_stream_stream_join_drops_late_probe(spark, scratch):
    left_dir, right_dir, outdir, ckpt = (
        os.path.join(scratch, d) for d in ("l", "r", "out", "ck")
    )

    def run():
        left = (
            _stream(spark, left_dir)
            .withColumnRenamed("k", "lk")
            .withColumnRenamed("ts", "lts")
            .withWatermark("lts", "10 minutes")
        )
        right = (
            _stream(spark, right_dir)
            .withColumnRenamed("k", "rk")
            .withColumnRenamed("ts", "rts")
            .withWatermark("rts", "10 minutes")
        )
        joined = left.join(
            right,
            (F.col("lk") == F.col("rk"))
            & (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 5 MINUTES")),
        ).select("lk", F.col("lts").cast("string"), F.col("rts").cast("string"))
        _drain(joined, outdir, ckpt)

    # run 1: left a@10:00 waits; both watermarks advance to 11:50 via 12:00
    # rows (key z never matches)
    _write(left_dir, "0.parquet", [("2024-01-01 10:00:00", "a"), ("2024-01-01 12:00:00", "z")])
    _write(right_dir, "0.parquet", [("2024-01-01 12:00:00", "zz")])
    run()
    # run 2: right a@10:03 WOULD match left a@10:00 but is 107 min below
    # the checkpointed watermark -> dropped, no join row; a fresh in-time
    # pair (b@13:00 both sides) must join, proving the query still works
    _write(right_dir, "1.parquet", [("2024-01-01 10:03:00", "a"), ("2024-01-01 13:00:00", "b")])
    _write(left_dir, "1.parquet", [("2024-01-01 13:00:00", "b"), ("2024-01-01 15:00:00", "z")])
    run()
    _write(left_dir, "2.parquet", [("2024-01-01 16:00:00", "z")])
    _write(right_dir, "2.parquet", [("2024-01-01 16:00:00", "zz")])
    run()  # third run closes b's window so the match is emitted

    out = [tuple(r) for r in spark.read.parquet(outdir).collect()]
    assert ("a", "2024-01-01 10:00:00", "2024-01-01 10:03:00") not in out, out
    assert ("b", "2024-01-01 13:00:00", "2024-01-01 13:00:00") in out, out


@pytest.mark.slow
def test_dedup_within_watermark_evicts_then_reemits(spark, scratch):
    indir, outdir, ckpt = (os.path.join(scratch, d) for d in ("in", "out", "ck"))

    def run():
        dd = (
            _stream(spark, indir)
            .withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["k"])
            .select("k", F.col("ts").cast("string").alias("ts"))
        )
        _drain(dd, outdir, ckpt)

    # run 1: first occurrence of key a, plus an in-watermark duplicate
    _write(
        indir,
        "0.parquet",
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 10:05:00", "a")],
    )
    run()
    # run 2: advance the watermark far past a's state TTL
    _write(indir, "1.parquet", [("2024-01-01 12:00:00", "z")])
    run()
    # run 3: key a reappears AFTER its dedup state was evicted -> re-emitted
    _write(indir, "2.parquet", [("2024-01-01 12:30:00", "a")])
    run()

    out = spark.read.parquet(outdir).filter(F.col("k") == "a")
    times = sorted(r["ts"] for r in out.collect())
    assert times == ["2024-01-01 10:00:00", "2024-01-01 12:30:00"], times


@pytest.mark.slow
def test_custom_state_batch_split_equivalence(spark, scratch):
    """Custom state (applyInPandasWithState, the API behind
    ``stream_stateful_count``; transformWithStateInPandas needs protobuf,
    absent here): (one batch) == (two batches + shared checkpoint) on
    final state — the exactly-once continuation contract for arbitrary
    user state under out-of-order replay."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [StructField("k", StringType()), StructField("n", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    def count_fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    def final_counts(tag: str, batches: list[list[tuple[str, str]]]):
        indir = os.path.join(scratch, f"in_{tag}")
        ckpt = os.path.join(scratch, f"ck_{tag}")
        outdir = os.path.join(scratch, f"out_{tag}")

        def sink(batch_df, _batch_id):  # update-mode + checkpoint-recoverable
            batch_df.write.mode("append").parquet(outdir)

        for i, rows in enumerate(batches):
            _write(indir, f"{i}.parquet", rows)
            out = (
                _stream(spark, indir)
                .groupBy("k")
                .applyInPandasWithState(
                    count_fn,
                    outputStructType=out_schema,
                    stateStructType=state_schema,
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
            )
            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return {
            r["k"]: r["mx"]
            for r in spark.read.parquet(outdir)
            .groupBy("k")
            .agg(F.max("n").alias("mx"))
            .collect()
        }

    rows = [
        ("2024-01-01 10:00:00", "a"),
        ("2024-01-01 10:01:00", "b"),
        ("2024-01-01 10:02:00", "a"),
        ("2024-01-01 09:55:00", "a"),  # out-of-order within the feed
    ]
    one = final_counts("one", [rows])
    two = final_counts("two", [rows[:2], rows[2:]])
    assert one == two == {"a": 3, "b": 1}
