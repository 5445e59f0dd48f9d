"""Watermark late-data semantics that no batch oracle can express
(SURVEY.md §2B.9 stream_watermark_late, rows-only side).

Arrival order is made deterministic with TWO ``availableNow`` runs sharing
a checkpoint: the watermark computed by run 1 (max event time 12:00 − 10 min
= 11:50) persists in the checkpoint, so run 2's late 10:15 event is
genuinely below the watermark when it arrives.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _write_batch(dirpath: str, name: str, rows: list[tuple[str, str]]) -> None:
    ts = pa.array([r[0] for r in rows], type=pa.string())
    k = pa.array([r[1] for r in rows], type=pa.string())
    pq.write_table(pa.table({"ts_s": ts, "k": k}), os.path.join(dirpath, name))


def _run_window_agg(spark, indir: str, outdir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("ts_s string, k string")
        .parquet(indir)
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.slow
def test_late_event_dropped_by_watermark(spark, scratch):
    indir = os.path.join(scratch, "in")
    outdir = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(indir)

    # run 1: two events in the 10:00 window, one at 12:00 that pushes the
    # checkpointed watermark to 11:50
    _write_batch(
        indir,
        "0_first.parquet",
        [
            ("2024-01-01 10:00:00", "a"),
            ("2024-01-01 10:30:00", "b"),
            ("2024-01-01 12:00:00", "c"),
        ],
    )
    _run_window_agg(spark, indir, outdir, ckpt)

    # run 2 (same checkpoint): a LATE event for the 10:00 window (event
    # time < watermark 11:50) that must be dropped, plus a 13:00 event
    _write_batch(
        indir,
        "1_second.parquet",
        [
            ("2024-01-01 10:15:00", "late"),
            ("2024-01-01 13:00:00", "d"),
        ],
    )
    _run_window_agg(spark, indir, outdir, ckpt)

    got = {
        r["window_start"].isoformat(): r["n"]
        for r in spark.read.parquet(outdir).collect()
    }
    # the 10:00 window was emitted once its end (11:00) fell below the
    # watermark — with count 2: the late third event was dropped
    assert got.get("2024-01-01T10:00:00") == 2
    # the 12:00/13:00 windows never closed below the final watermark
    # (12:50), so append mode never emitted them
    assert "2024-01-01T12:00:00" not in got
    assert "2024-01-01T13:00:00" not in got
