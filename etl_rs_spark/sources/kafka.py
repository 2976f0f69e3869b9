"""Kafka source/sink wrappers — the real `format("kafka")` code paths.

Mirrors the reference's Kafka layer:

- producer envelope `KafkaMessage {key, value, topic, partition, offset}`
  plus headers (timestamp, row_index) — reference
  crates/libs/lib-etl/src/kafka.rs:71-89 (`to_kafka_frame`);
- offset-range consumer `read_messages_from_offset_range` — reference
  src/kafka.rs:110-140 and examples/kafka_jdd_to_mongo.rs:18-66
  (`kafka_batch_source` with explicit per-partition start/end offsets);
- the streaming consumer (`kafka_stream_source`) is Structured
  Streaming: exactly-once downstream comes from the lakehouse sink's
  batch guard, not the consumer.

The sandbox has no broker, so integration stops at `.load()`; everything
up to it — option assembly (offset JSON), the envelope encode/decode
expressions — is plain code, unit-tested round-trip on Kafka-shaped
frames (tests/test_connectors.py). On a cluster the same functions run
unchanged against `spark-sql-kafka-0-10`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: columns the Spark Kafka source emits (fixed by the connector)
KAFKA_RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)

#: change-event payload carried in the Kafka value (input_hint shape)
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("tag", T.StringType()),  # additive evolution epoch
    ]
)


@dataclass
class KafkaConfig:
    bootstrap_servers: str
    topic: str
    #: fail_on_data_loss=False mirrors the reference consumer's skip of
    #: compacted-away offsets
    fail_on_data_loss: bool = False
    max_offsets_per_trigger: int | None = None


def kafka_reader_options(
    cfg: KafkaConfig,
    starting_offsets: dict[int, int] | str = "earliest",
    ending_offsets: dict[int, int] | str | None = None,
) -> dict[str, str]:
    """Assemble the Kafka reader option map. Offset dicts are
    {partition: offset} and serialize to the per-topic JSON form the
    connector requires — the analogue of the reference's explicit
    (partition, start, end) consumer arguments (kafka.rs:110-140)."""

    def enc(off: dict[int, int] | str) -> str:
        if isinstance(off, str):
            return off
        return json.dumps({cfg.topic: {str(p): o for p, o in sorted(off.items())}})

    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": cfg.topic,
        "startingOffsets": enc(starting_offsets),
        "failOnDataLoss": "true" if cfg.fail_on_data_loss else "false",
    }
    if ending_offsets is not None:
        opts["endingOffsets"] = enc(ending_offsets)
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    return opts


def kafka_batch_options(
    cfg: KafkaConfig,
    partition: int,
    start: int,
    end: int,
) -> dict[str, str]:
    """Option map for a bounded offset-range read of ONE partition,
    via ``assign`` mode — the consumer is assigned EXACTLY the target
    TopicPartition (the reference consumer's ``assign`` +
    offset-range poll, kafka.rs:110-140), so the specific-offset maps
    name only that partition and nothing else is ever contacted.

    This sidesteps both failure modes of pinning under ``subscribe``:
    a partial specific-offset map is rejected by the connector
    ('you must specify all TopicPartitions'), and any fixed pin for
    non-target partitions either references offsets retention may have
    aged out (0/0) or isn't allowed in batch startingOffsets (-1 =
    latest). With assign there are no non-target partitions at all."""
    if partition < 0:
        raise ValueError(f"partition must be >= 0, got {partition}")
    return {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "assign": json.dumps({cfg.topic: [partition]}),
        "startingOffsets": json.dumps({cfg.topic: {str(partition): start}}),
        "endingOffsets": json.dumps({cfg.topic: {str(partition): end + 1}}),
        "failOnDataLoss": "true" if cfg.fail_on_data_loss else "false",
    }


def kafka_batch_source(
    spark: SparkSession,
    cfg: KafkaConfig,
    partition: int,
    start: int,
    end: int,
) -> DataFrame:
    """Bounded offset-range read of ONE partition — the reference's
    read_messages_from_offset_range (end offset exclusive in Kafka;
    the reference's inclusive `end` maps to end+1). Assign-mode offset
    pinning per ``kafka_batch_options``."""
    opts = kafka_batch_options(cfg, partition, start, end)
    return spark.read.format("kafka").options(**opts).load()


def kafka_stream_source(spark: SparkSession, cfg: KafkaConfig) -> DataFrame:
    """Unbounded Structured Streaming consumer; compose with
    parse_envelope + streaming/replay.py's foreachBatch merge for the
    exactly-once lake upsert path."""
    opts = kafka_reader_options(cfg, "earliest")
    return spark.readStream.format("kafka").options(**opts).load()


def to_kafka_frame(events: DataFrame, topic: str) -> DataFrame:
    """Producer-side encode: change events -> Kafka-shaped rows.

    key = doc_id bytes (keeps per-doc ordering within a partition —
    the reference partitions by key, config.rs:10-17); value = JSON
    payload; headers carry (timestamp, row_index) exactly like the
    reference producer (kafka.rs:71-89). `partition` rides along for
    engines that support explicit partitioning."""
    payload_cols = [c for c in PAYLOAD_SCHEMA.fieldNames() if c in events.columns]
    return events.select(
        F.encode(F.col("doc_id"), "UTF-8").alias("key"),
        F.encode(F.to_json(F.struct(*payload_cols)), "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.array(
            F.struct(
                F.lit("timestamp").alias("key"),
                F.encode(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX"), "UTF-8").alias("value"),
            ),
            F.struct(
                F.lit("row_index").alias("key"),
                F.encode(F.col("lsn").cast("string"), "UTF-8").alias("value"),
            ),
        ).alias("headers"),
    )


def parse_envelope(raw: DataFrame) -> DataFrame:
    """Consumer-side decode: Kafka-shaped rows -> the change-event
    frame the replay pipeline consumes (EVENT_COLUMNS order + tag).
    (partition, offset) come from the broker metadata — the ordering
    authority — never from the payload."""
    payload = F.from_json(F.decode("value", "UTF-8"), PAYLOAD_SCHEMA).alias("p")
    return raw.select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        payload,
    ).select(
        "p.op", "p.lsn", "partition", "offset", "p.ts",
        "p.doc_id", "p.tokens", "p.n_tok", "p.source", "p.tag",
    )
