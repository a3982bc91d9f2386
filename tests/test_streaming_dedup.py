"""Streaming exact-dedup: first-seen-wins within the watermark horizon, and
state survival across two availableNow runs sharing one checkpoint (a
restart must not re-admit an already-seen hash)."""

import datetime as dt

import pandas as pd

from b_pdf_parser_spark.streaming.dedup_stream import dedup_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_docs(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(path)


def _drain_to_parquet(df, out, ckpt):
    q = (
        df.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_first_seen_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, [
        ("u1", T0, "alpha"),
        ("u2", T0 + dt.timedelta(seconds=10), "alpha"),   # dup of u1
        ("u3", T0 + dt.timedelta(seconds=20), "beta"),
        ("u4", T0 + dt.timedelta(seconds=30), "beta"),    # dup of u3
        ("u5", T0 + dt.timedelta(seconds=40), "gamma"),
    ])
    _drain_to_parquet(dedup_stream(_stream(spark, src)), out, ckpt)
    got = spark.read.parquet(out)
    texts = sorted(r.text for r in got.collect())
    assert texts == ["alpha", "beta", "gamma"]
    assert got.filter("content_hash IS NULL").count() == 0


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, [("u1", T0, "alpha"), ("u2", T0, "beta")])
    _drain_to_parquet(dedup_stream(_stream(spark, src)), out, ckpt)
    # second run, same checkpoint: a re-sent "alpha" inside the horizon
    # must stay dropped; a new text must pass
    _write_docs(spark, src, [
        ("u3", T0 + dt.timedelta(seconds=5), "alpha"),
        ("u4", T0 + dt.timedelta(seconds=6), "delta"),
    ])
    _drain_to_parquet(dedup_stream(_stream(spark, src)), out, ckpt)
    texts = sorted(r.text for r in spark.read.parquet(out).collect())
    assert texts == ["alpha", "beta", "delta"]
    urls = {r.text: r.url for r in spark.read.parquet(out).collect()}
    assert urls["alpha"] == "u1"  # the restart kept the FIRST-seen row
