"""Streaming aggregation tests: watermarked windowed counts (built-in state)
and the count-bounded custom stateful sessionizer — including state survival
across two availableNow runs sharing one checkpoint (the streaming analog of
the batch job's manifest resume)."""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from b_pdf_parser_spark.streaming.sessions_stream import (
    count_bounded_sessions,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema("user_id long, ts timestamp, event_type string").parquet(path)


def _drain(df, sink_table, ckpt, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_with_watermark(spark, tmp_path):
    inp = str(tmp_path / "ev")
    rows = [(1, T0 + dt.timedelta(minutes=m), "click") for m in (5, 10, 65, 70, 200)]
    _write_events(spark, inp, rows)
    _drain(windowed_event_counts(_stream(spark, inp)), "win_counts", str(tmp_path / "c1"),
           "append")
    got = {(r["window_start"], r["n"]) for r in spark.sql("SELECT * FROM win_counts").collect()}
    # append mode emits only windows the watermark has passed: the first two
    # hours finalize (max event time 200min - 30min watermark = 170min), the
    # window holding the 200-minute event stays open and is NOT emitted
    assert got == {(T0, 2), (T0 + dt.timedelta(hours=1), 2)}


def test_count_bounded_sessions_split_rules(spark, tmp_path):
    inp = str(tmp_path / "ev")
    rows = (
        # user 1: 7 events 1 min apart → count-split at 5 (one closed, open=2)
        [(1, T0 + dt.timedelta(minutes=m), "x") for m in range(7)]
        # user 2: 2 events split by a 90-min gap → gap-split (one closed, open=1)
        + [(2, T0, "x"), (2, T0 + dt.timedelta(minutes=90), "x")]
    )
    _write_events(spark, inp, rows)
    _drain(count_bounded_sessions(_stream(spark, inp)), "sess1", str(tmp_path / "c1"),
           "update")
    got = {(r["user_id"], r["n_events"], r["closed"])
           for r in spark.sql("SELECT * FROM sess1").collect()}
    assert got == {(1, 5, True), (1, 2, False), (2, 1, True), (2, 1, False)}


def test_stateful_sessions_survive_restart(spark, tmp_path):
    # the memory sink cannot recover a checkpoint, so the restart test sinks
    # via foreachBatch → parquet append (checkpoint-recoverable)
    inp = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            count_bounded_sessions(_stream(spark, inp))
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_events(spark, inp, [(7, T0 + dt.timedelta(minutes=m), "x") for m in (0, 1)])
    drain()
    a = {(r["n_events"], r["closed"]) for r in spark.read.parquet(out).collect()}
    assert a == {(2, False)}  # open session with 2 events now in state

    # second run, same checkpoint: 2 more events within the gap must CONTINUE
    # the session from persisted state (2 + 2 = 4), not start a new one
    _write_events(spark, inp, [(7, T0 + dt.timedelta(minutes=m), "x") for m in (2, 3)])
    drain()
    b = {(r["n_events"], r["closed"]) for r in spark.read.parquet(out).collect()}
    assert b == {(2, False), (4, False)}  # run-2 emission continues at 4


def test_session_fn_sorts_across_chunks():
    # applyInPandasWithState may hand one key's rows over as several pandas
    # chunks; ordering must be global, not per-chunk (a later chunk carrying
    # the earliest timestamp once produced a negative-gap "in-session" walk)
    import pandas as pd

    from b_pdf_parser_spark.streaming.sessions_stream import _session_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.v = v

    fn = _session_fn(1800, 100)
    t = pd.Timestamp
    chunk1 = pd.DataFrame({"ts": [t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00")]})
    chunk2 = pd.DataFrame({"ts": [t("2024-01-01 08:00:00")]})  # earliest, last chunk
    rows = pd.concat(list(fn((1,), iter([chunk1, chunk2]), FakeState())))
    closed = rows[rows.closed]
    assert len(closed) == 1  # 08:00 alone, closed by the >30min gap to 10:00
    assert closed.iloc[0].session_start == int(t("2024-01-01 08:00:00").timestamp())
    assert closed.iloc[0].n_events == 1
    open_ = rows[~rows.closed]
    assert open_.iloc[0].session_start == int(t("2024-01-01 10:00:00").timestamp())
    assert open_.iloc[0].n_events == 2
