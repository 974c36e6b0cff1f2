"""Structured Streaming ingestion: availableNow drain of a CSV drop
folder with transforms, and watermarked windowed aggregation."""

import datetime as dt

from dasladen_spark.streaming.ingest import (
    run_available_now,
    stream_csv_folder,
    windowed_event_counts,
)


def test_stream_csv_folder_available_now(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    (src / "a.csv").write_text("id;qty\n1;10\n2;3\n")
    (src / "b.csv").write_text("id;qty\n3;50\n")
    stream = stream_csv_folder(
        spark,
        str(src),
        schema="id STRING, qty STRING",
        transform={"convert": [["qty", "int"]], "filter": "{qty} > 5"},
    )
    assert stream.isStreaming
    out = tmp_path / "out"
    run_available_now(stream, str(out), str(tmp_path / "ckpt"))
    rows = spark.read.parquet(str(out)).collect()
    assert {(r["id"], r["qty"]) for r in rows} == {("1", 10), ("3", 50)}

    # exactly-once: a second drain with the same checkpoint adds nothing
    run_available_now(
        stream_csv_folder(spark, str(src), schema="id STRING, qty STRING",
                          transform={"convert": [["qty", "int"]],
                                     "filter": "{qty} > 5"}),
        str(out),
        str(tmp_path / "ckpt"),
    )
    assert spark.read.parquet(str(out)).count() == 2


def test_windowed_event_counts_batch_parity(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), "click") for m in (1, 2, 11)
    ] + [(base + dt.timedelta(minutes=3), "view")]
    df = spark.createDataFrame(rows, ["ts", "event_type"])
    out = windowed_event_counts(df, window="10 minutes")
    got = {
        (r["win"]["start"].minute, r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    assert got[(0, "click")] == 2
    assert got[(10, "click")] == 1
    assert got[(0, "view")] == 1
