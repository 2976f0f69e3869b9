"""Connector edges (S4-S9 as code): Kafka envelope encode/decode and
option assembly, JDBC option/predicate assembly. No broker or DB exists
in the sandbox, so these test everything up to the wire boundary — the
parts that are OUR code, not the connector's."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from pyspark.sql import functions as F

from etl_rs_spark.sources import jdbc as J
from etl_rs_spark.sources import kafka as K
from etl_rs_spark.sources.binlog import BinlogSpec, EVENT_COLUMNS, gen_events


# -- kafka ------------------------------------------------------------------

CFG = K.KafkaConfig(bootstrap_servers="broker:9092", topic="binlog")


def test_kafka_reader_options_offsets_json():
    opts = K.kafka_reader_options(CFG, {0: 5, 1: 7}, {0: 10, 1: -1})
    assert json.loads(opts["startingOffsets"]) == {"binlog": {"0": 5, "1": 7}}
    assert json.loads(opts["endingOffsets"]) == {"binlog": {"0": 10, "1": -1}}
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "binlog"
    assert opts["failOnDataLoss"] == "false"


def test_kafka_reader_options_strings_and_trigger():
    cfg = K.KafkaConfig("b:9092", "t", fail_on_data_loss=True, max_offsets_per_trigger=500)
    opts = K.kafka_reader_options(cfg, "earliest")
    assert opts["startingOffsets"] == "earliest"
    assert "endingOffsets" not in opts
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "500"


def test_kafka_envelope_round_trip(spark):
    """events -> producer frame -> consumer parse == events, with
    (partition, offset) authoritative from broker metadata and headers
    carrying (timestamp, row_index) like the reference producer."""
    ev = gen_events(spark, BinlogSpec(n_events=200, n_docs=40, n_partitions=4))
    framed = K.to_kafka_frame(ev, "binlog")
    assert set(K.KAFKA_RAW_SCHEMA.fieldNames()) <= set(framed.columns)

    hdr = framed.select(
        F.decode(F.col("headers")[0]["value"], "UTF-8").alias("ts_hdr"),
        F.col("headers")[1]["key"].alias("k2"),
        F.decode(F.col("headers")[1]["value"], "UTF-8").alias("row_idx"),
        F.decode("key", "UTF-8").alias("doc"),
    ).first()
    assert hdr["k2"] == "row_index" and hdr["row_idx"].isdigit()
    assert "T" in hdr["ts_hdr"] and hdr["doc"].startswith("doc-")

    parsed = K.parse_envelope(framed)
    back = parsed.select(*EVENT_COLUMNS)
    orig = ev.select(*EVENT_COLUMNS)
    sym_diff = back.exceptAll(orig).count() + orig.exceptAll(back).count()
    assert sym_diff == 0
    assert parsed.filter(F.col("tag").isNotNull()).count() == 0  # pre-evolution


def test_kafka_envelope_round_trip_with_evolution(spark):
    """The additive tag column survives the wire (schema evolution
    through the envelope, not around it)."""
    ev = gen_events(
        spark, BinlogSpec(n_events=200, n_docs=40, n_partitions=4, evolve_from_lsn=100)
    )
    parsed = K.parse_envelope(K.to_kafka_frame(ev, "binlog"))
    n_tagged = ev.filter(F.col("tag").isNotNull()).count()
    assert n_tagged > 0
    assert parsed.filter(F.col("tag").isNotNull()).count() == n_tagged


def test_kafka_batch_source_assigns_single_partition():
    """Bounded single-partition reads use ASSIGN mode: only the target
    TopicPartition is assigned, so the specific-offset maps cover
    exactly it — no partial-map rejection ('you must specify all
    TopicPartitions'), no non-target pins that could reference
    retention-aged offsets, no data movement for other partitions."""
    opts = K.kafka_batch_options(CFG, partition=2, start=50, end=60)
    assert json.loads(opts["assign"]) == {"binlog": [2]}
    assert "subscribe" not in opts
    assert json.loads(opts["startingOffsets"]) == {"binlog": {"2": 50}}
    # reference's inclusive end -> Kafka's exclusive end+1
    assert json.loads(opts["endingOffsets"]) == {"binlog": {"2": 61}}
    assert opts["failOnDataLoss"] == "false"
    with pytest.raises(ValueError):
        K.kafka_batch_options(CFG, partition=-1, start=0, end=1)


# -- jdbc -------------------------------------------------------------------

def test_jdbc_scan_options_stride_quad():
    cfg = J.JdbcConfig(
        url="jdbc:postgresql://db:5432/etl", table="events", user="u", password="p",
        partition_column="event_id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    opts = J.jdbc_scan_options(cfg)
    assert opts["partitionColumn"] == "event_id"
    assert opts["numPartitions"] == "16"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    assert opts["fetchsize"] == "10000"
    assert opts["driver"] == "org.postgresql.Driver"


def test_jdbc_scan_options_requires_bounds():
    cfg = J.JdbcConfig(url="jdbc:x", table="t", partition_column="id")
    with pytest.raises(ValueError):
        J.jdbc_scan_options(cfg)


def test_stride_predicates_cover_key_space():
    preds = J.stride_predicates("id", 0, 99, 4)
    assert len(preds) == 4
    assert "IS NULL" in preds[0]            # nulls routed to slice 0
    assert preds[-1].startswith("id >= ")
    # every key in [0, 99] matches exactly one predicate
    import re

    def matches(k: int, p: str) -> bool:
        p = p.replace(" OR id IS NULL", "")
        parts = re.findall(r"id (>=|<) (\d+)", p)
        return all((k >= int(v)) if op == ">=" else (k < int(v)) for op, v in parts)

    for k in (0, 24, 25, 49, 50, 74, 75, 99):
        assert sum(matches(k, p) for p in preds) == 1


# -- iceberg MERGE INTO sink (SQL builders; no catalog in sandbox) ----------

def test_iceberg_create_table_sql_shape():
    from etl_rs_spark.sinks import iceberg as I

    sql = I.create_table_sql(
        "lake.db.tokens", "tokens ARRAY<INT>, n_tok INT, source STRING",
        key_col="doc_id", n_buckets=64,
    )
    assert "CREATE TABLE IF NOT EXISTS lake.db.tokens" in sql
    assert "PARTITIONED BY (bucket(64, doc_id))" in sql
    assert "'write.merge.mode'='merge-on-read'" in sql
    assert "'format-version'='2'" in sql
    assert "_lsn BIGINT" in sql and "_deleted BOOLEAN" in sql


def test_iceberg_merge_sql_lww_guard():
    from etl_rs_spark.sinks import iceberg as I

    sql = I.merge_sql("lake.db.tokens", "src", "doc_id", ["tokens", "_lsn", "_offset", "_deleted"])
    assert "MERGE INTO lake.db.tokens t" in sql
    assert "USING src s" in sql
    assert "ON t.doc_id = s.doc_id" in sql
    # strictly-newer LWW guard: replayed old batches cannot regress a key
    assert "WHEN MATCHED AND struct(s._lsn, s._offset) > struct(t._lsn, t._offset)" in sql
    assert "WHEN NOT MATCHED THEN INSERT (doc_id, tokens, _lsn, _offset, _deleted)" in sql


def test_iceberg_table_requires_catalog(spark):
    from etl_rs_spark.sinks import iceberg as I

    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        I.IcebergTable(spark, "nocat.db.t")


# -- mongo ------------------------------------------------------------------

def test_mongo_writer_options_and_modes(spark):
    from etl_rs_spark.sinks.mongo import MongoConfig, MongoSink, mongo_writer_options

    cfg = MongoConfig(host="db", port=27017, database="etl", collection="jdd",
                      user="u@x", password="p:w@d")
    # credentials percent-escaped so '@'/':' can't split the authority
    assert cfg.uri == "mongodb://u%40x:p%3Aw%40d@db:27017/"
    opts = mongo_writer_options(cfg)
    assert opts == {"connection.uri": cfg.uri, "database": "etl", "collection": "jdd"}
    assert MongoConfig(host="db", port=27017, database="e", collection="c").uri == \
        "mongodb://db:27017/"

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    sink = MongoSink(cfg)
    # the reference WriteMode enum maps onto Spark writer modes
    # (kafka_jdd_to_mongo.rs:85-93: Overwrite = drop + insert_many)
    for mode, spark_mode in (("overwrite", "Overwrite"), ("append", "Append")):
        w = sink.writer(df, mode)
        assert w._jwrite.toString() is not None  # assembled without a jar
    with pytest.raises(ValueError):
        sink.writer(df, "upsert")
    # without the connector jar, write() raises the actionable error
    with pytest.raises(RuntimeError, match="Connector"):
        sink.write(df, "append")
