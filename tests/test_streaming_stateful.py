"""Stateful streaming operators: drive applyInPandasWithState through a
real (availableNow-style) streaming query on a file source and check the
state semantics against batch ground truth."""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rsgislib_spark.streaming.stateful import running_user_totals


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(out), str(ckpt)


def test_running_user_totals_matches_batch(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    sf = "/root/testdata/sf0.001"
    os.symlink(f"{sf}/events.parquet", f"{src}/events.parquet")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    want = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == want["n_events"]).all()
    assert (got["total_value"] - want["total_value"]).abs().max() < 1e-3


def test_running_totals_resume_across_restarts(spark, stream_dirs):
    """Second availableNow run over NEW files continues from state."""
    src, out, ckpt = stream_dirs
    sf = "/root/testdata/sf0.001"

    ev = spark.read.parquet(f"{sf}/events.parquet").filter("user_id < 5").orderBy("event_id")
    pdf = ev.toPandas()
    # micros, not pandas-default nanos — must match the stream schema
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_totals(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pdf.iloc[:half].to_parquet(f"{src}/part1.parquet", index=False)
    run_once()
    pdf.iloc[half:].to_parquet(f"{src}/part2.parquet", index=False)
    run_once()

    got = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .set_index("user_id")["n_events"]
    )
    want = pdf.groupby("user_id").size()
    for uid, n in want.items():
        assert got[uid] == n, (uid, got[uid], n)


def test_sessionize_closes_gapped_sessions(spark, stream_dirs):
    from rsgislib_spark.streaming.stateful import sessionize

    src, out, ckpt = stream_dirs
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:10:00",  # session 1 (u1)
         "2024-01-01 02:00:00", "2024-01-01 02:05:00",  # session 2 (u1)
         "2024-01-01 05:00:00"]                          # open session (u1)
    ).astype("datetime64[us]")
    pdf = pd.DataFrame(
        {"event_id": range(5), "ts": ts, "user_id": [1] * 5,
         "event_type": ["click"] * 5, "value": [1.0] * 5, "props": [""] * 5}
    )
    pdf.to_parquet(f"{src}/ev.parquet", index=False)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).orderBy("session_start").toPandas()
    # two CLOSED sessions emitted (the third stays open in state)
    assert list(got["n_events"]) == [2, 2]
    assert (got["session_end"] - got["session_start"]).tolist() == [600, 300]


def test_sessionize_cross_batch_late_event_does_not_rewind(spark, stream_dirs):
    """Regression: a late event in a later batch, older than the open
    session's stored tail, must be folded into the session WITHOUT
    rewinding session_end (the gap test runs against the running max)."""
    from rsgislib_spark.streaming.stateful import sessionize

    src, out, ckpt = stream_dirs
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, times):
        pdf = pd.DataFrame(
            {"event_id": range(len(times)),
             "ts": pd.to_datetime(times).astype("datetime64[us]"),
             "user_id": [1] * len(times), "event_type": ["click"] * len(times),
             "value": [1.0] * len(times), "props": [""] * len(times)}
        )
        pdf.to_parquet(f"{src}/{name}.parquet", index=False)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1", ["2024-01-01 00:00:00", "2024-01-01 00:10:00"])
    run_once()
    # 00:05 is LATE (older than the stored tail 00:10); 01:30 proves the gap
    write_batch("b2", ["2024-01-01 00:05:00", "2024-01-01 01:30:00"])
    run_once()
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    # end stays 00:10 (600s), not rewound to the late 00:05; n folds in the late event
    assert int(row["session_start"]) % 86400 == 0
    assert int(row["session_end"]) - int(row["session_start"]) == 600
    assert int(row["n_events"]) == 3


def test_watermarked_window_agg_drops_late_data(spark, stream_dirs):
    """Watermark + tumbling window over a file stream: a record arriving
    in a later batch but older than the watermark is dropped from the
    append-mode output (late-data handling, SURVEY §2.9)."""
    src, out, ckpt = stream_dirs

    def write_batch(name, times_vals):
        pdf = pd.DataFrame(
            {
                "event_id": range(len(times_vals)),
                "ts": pd.to_datetime([t for t, _ in times_vals]).astype("datetime64[us]"),
                "user_id": [1] * len(times_vals),
                "event_type": ["click"] * len(times_vals),
                "value": [v for _, v in times_vals],
                "props": [""] * len(times_vals),
            }
        )
        pdf.to_parquet(f"{src}/{name}.parquet", index=False)

    def run_once():
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .select(F.col("win.start").alias("ws"), "cnt", "sv")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: two on-time events in hour 10, one in hour 12 (advances
    # the watermark past hour 10+10min → hour-10 window finalizes)
    write_batch("b1", [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:20:00", 2.0),
                       ("2024-01-01 12:30:00", 4.0)])
    run_once()
    # batch 2: a LATE event for hour 10 (older than watermark) + fresh one
    write_batch("b2", [("2024-01-01 10:40:00", 100.0), ("2024-01-01 13:10:00", 8.0)])
    run_once()

    got = spark.read.parquet(out).toPandas().set_index("ws").sort_index()
    hour10 = got.loc["2024-01-01 10:00:00"]
    assert hour10["cnt"] == 2 and hour10["sv"] == 3.0  # late 100.0 dropped


def test_dedup_stream_drops_cross_batch_duplicates(spark, stream_dirs):
    from rsgislib_spark.streaming.stateful import dedup_stream

    src, out, ckpt = stream_dirs
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, ids, times):
        pdf = pd.DataFrame(
            {"event_id": ids, "ts": pd.to_datetime(times).astype("datetime64[us]"),
             "user_id": [1] * len(ids), "event_type": ["click"] * len(ids),
             "value": [1.0] * len(ids), "props": [""] * len(ids)}
        )
        pdf.to_parquet(f"{src}/{name}.parquet", index=False)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream(stream, ["event_id"], delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1", [1, 2, 3], ["2024-01-01 00:00:00"] * 3)
    run_once()
    # batch 2 re-delivers ids 2 and 3 (within the watermark) + new id 4
    write_batch("b2", [2, 3, 4], ["2024-01-01 00:10:00"] * 3)
    run_once()
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["event_id"]) == [1, 2, 3, 4]
