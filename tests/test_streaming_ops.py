"""Streaming surface beyond replay: custom stateful operator
(applyInPandasWithState) and watermarked event-time windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.sources.binlog import BinlogSpec, gen_events, write_segments
from etl_rs_spark.streaming.stateful import track_doc_state
from etl_rs_spark.streaming.windows import windowed_event_counts

SPEC = BinlogSpec(n_events=1500, n_docs=60, n_partitions=4, tokens_max=8, seed=11)


@pytest.fixture(scope="module")
def binlog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sbinlog"))
    df = gen_events(spark, SPEC)
    segs = write_segments(df, path, n_segments=3, max_lsn=SPEC.n_events)
    return path, segs, df


def test_stateful_doc_tracking(spark, tmp_path, binlog):
    """Running per-doc state survives micro-batch boundaries and ends at
    the batch-computed truth."""
    path, segs, df = binlog
    schema = spark.read.parquet(segs[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{path}/seg-*")
    )
    tracked = track_doc_state(stream)
    q = (
        tracked.writeStream.format("memory")
        .queryName("doc_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # latest state per doc across the update stream = the final row
    # emitted; dedupe by keeping max n_events per doc
    got = {
        r["doc_id"]: (r["n_events"], r["last_lsn"], r["last_offset"], r["last_op"])
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY n_events DESC) rn
              FROM doc_state) WHERE rn = 1
            """
        ).collect()
    }
    want_rows = (
        df.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max_by(
                F.struct("lsn", "offset", "op"), F.struct("lsn", "offset")
            ).alias("w"),
        )
        .collect()
    )
    want = {
        r["doc_id"]: (r["n"], r["w"]["lsn"], r["w"]["offset"], r["w"]["op"])
        for r in want_rows
    }
    assert got == want


def _run_windowed(spark, path, schema, ckpt, name, max_files):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{path}/seg-*")
    )
    q = (
        windowed_event_counts(stream, window="30 seconds", watermark="1 minute")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r["window_start"], r["op"]): (r["n_events"], r["n_docs"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_windowed_counts_single_batch_equals_batch(spark, tmp_path, binlog):
    """One micro-batch (no late arrivals possible): the emitted closed
    windows must equal the batch computation exactly."""
    path, segs, df = binlog
    schema = spark.read.parquet(segs[0]).schema
    got = _run_windowed(spark, path, schema, str(tmp_path / "w1"), "win_one", 1000)
    want = {
        (r["window_start"], r["op"]): (r["n_events"], r["n_docs"])
        for r in windowed_event_counts(df, window="30 seconds").collect()
    }
    assert got
    assert all(got[k] == want[k] for k in got)
    # append emits every window closed by the final watermark; windows
    # within (watermark + one window) of max ts stay pending: up to
    # ceil(90s/30s)=3 windows x 3 ops
    assert len(got) >= len(want) - 12


def test_windowed_counts_late_data_dropped(spark, tmp_path, binlog):
    """File-per-trigger replay interleaves event time across
    micro-batches: events arriving behind the watermark must be DROPPED
    (late-data semantics), so every emitted window counts <= batch
    truth and at least one window shows drops."""
    path, segs, df = binlog
    schema = spark.read.parquet(segs[0]).schema
    got = _run_windowed(spark, path, schema, str(tmp_path / "w2"), "win_late", 1)
    want = {
        (r["window_start"], r["op"]): (r["n_events"], r["n_docs"])
        for r in windowed_event_counts(df, window="30 seconds").collect()
    }
    assert got
    assert all(got[k][0] <= want[k][0] for k in got)
    assert any(got[k][0] < want[k][0] for k in got)  # watermark really dropped
