"""Synthetic change-event binlog — deterministic, seeded, fully distributed.

Models the reference's Kafka relay: the change-event envelope mirrors
``KafkaMessage {key, value, topic, partition, offset}``
(crates/libs/lib-etl/src/config.rs:10-17) plus its producer headers
(timestamp / row_index, src/kafka.rs:71-89); the bounded replay mirrors
the offset-range consumer (examples/kafka_jdd_to_mongo.rs:18-66).

Payload rows carry the tokenized-sequence shape from BASELINE.json's
input_hint: (doc_id string, tokens array<int>, n_tok int, source string).

Every column derives from ``spark.range`` via xxhash64 — nothing is
materialized on the driver, so the same generator scales from the 1k-event
pytest fixture to the 10^10-event bench (generated lazily, never stored).

Generation rules (FIXTURES.md §1.2):
- a hot subset of keys (hot_frac of docs) receives hot_share of events
  (exercises salting / AQE skew handling);
- ~dup_frac of events are delivered twice with identical
  (partition, offset) (exercises exactly-once / idempotent merge);
- ~1% of events carry a deliberately wrong n_tok (engine recomputes);
- ~2% of token values fall outside [0, vocab) (normalize drops them);
- partition = hash(doc_id) % P  — per-doc ordering holds within a
  partition, matching real binlog/Kafka semantics;
- offset = lsn — globally monotonic, hence per-partition monotonic;
- from ``evolve_from_lsn`` onward events carry an additional ``tag``
  column (additive schema evolution epoch E2).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: modulus / base of the portable polynomial fold hash (see below)
PORTABLE_P = 2_147_483_647
PORTABLE_B = 1_000_003


def portable_salt(s: str) -> int:
    """Deterministic integer salt for a string tag: md5-prefix mod p.
    Computed driver-side, so it lands in plans and oracle SQL as a
    plain literal."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % PORTABLE_P

EVENT_COLUMNS = [
    "op", "lsn", "partition", "offset", "ts",
    "doc_id", "tokens", "n_tok", "source",
]

SOURCES = ["web", "books", "code", "wiki"]


@dataclass
class BinlogSpec:
    n_events: int
    n_docs: int
    n_partitions: int = 8
    vocab: int = 50257
    tokens_max: int = 64          # max generated tokens per event
    hot_frac: float = 0.001
    hot_share: float = 0.30
    dup_frac: float = 0.02
    wrong_ntok_frac: float = 0.01
    insert_pct: int = 60          # insert/update/delete ≈ 60/30/10
    update_pct: int = 30
    evolve_from_lsn: int | None = None
    seed: int = 42
    #: "xxhash64" (default — engine-native, fastest) or "portable":
    #: the polynomial fold h = fold((h*B + x) mod p) over integer
    #: inputs with string tags pre-folded driver-side (portable_salt),
    #: so the ENTIRE generator is replicable in ANSI SQL and the CDC
    #: replay result can be verified by a DuckDB oracle bit-for-bit.
    hash_mode: str = "xxhash64"


def _fold(seed: int, *cols: Column | int) -> Column:
    """Portable hash: left fold (acc * B + (x mod p)) mod p. Every
    intermediate stays < p*B ~ 2^51 (bigint-safe, ANSI-clean)."""
    acc: Column = F.lit(seed).cast("bigint")
    for c in cols:
        v = F.lit(c).cast("bigint") if isinstance(c, int) else c.cast("bigint")
        acc = (acc * F.lit(PORTABLE_B) + F.pmod(v, F.lit(PORTABLE_P))) % F.lit(PORTABLE_P)
    return acc


def gen_events(spark: SparkSession, spec: BinlogSpec) -> DataFrame:
    """Lazy event frame; one row per delivered message (incl. duplicate
    deliveries). Ordering columns: (lsn) global, (partition, offset)
    per-partition."""
    base = spark.range(spec.n_events).withColumn("lsn", F.col("id") + 1)

    portable = spec.hash_mode == "portable"

    def H(salt: str | None, *cols: Column | str) -> Column:
        """Site hasher. xxhash64 mode reproduces the round-1 stream
        exactly; portable mode folds the pre-hashed salt + int inputs."""
        cs = [F.col(c) if isinstance(c, str) else c for c in cols]
        if not portable:
            tail = [F.lit(salt)] if salt is not None else []
            return F.xxhash64(*cs, *tail, F.lit(spec.seed))
        pre = [portable_salt(salt)] if salt is not None else []
        return _fold(spec.seed, *pre, *cs)

    # doc-keyed hashes use the doc_id STRING under xxhash64 (engine
    # native) but the integer doc index under portable (so the SQL
    # replica never needs string hashing)
    n_hot = max(1, int(spec.n_docs * spec.hot_frac))
    is_hot = F.pmod(H("hot", "id"), F.lit(1000)) < int(spec.hot_share * 1000)
    doc_idx = F.when(is_hot, F.pmod(H("hd", "id"), F.lit(n_hot))).otherwise(
        F.pmod(H("cd", "id"), F.lit(spec.n_docs))
    )
    df = base.withColumn("_didx", doc_idx).withColumn(
        "doc_id", F.format_string("doc-%012d", F.col("_didx"))
    )
    dkey = "_didx" if portable else "doc_id"

    op_r = F.pmod(H("op", "id"), F.lit(100))
    df = df.withColumn(
        "op",
        F.when(op_r < spec.insert_pct, F.lit("insert"))
        .when(op_r < spec.insert_pct + spec.update_pct, F.lit("update"))
        .otherwise(F.lit("delete")),
    )

    # tokens: deterministic from (doc, lsn); ~2% out of [0, vocab)
    tok_hi = int(spec.vocab * 1.02)
    length = (F.pmod(H("len", "id"), F.lit(spec.tokens_max)) + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: (F.pmod(H(None, dkey, "lsn", i), F.lit(tok_hi)) - F.lit(25)).cast("int"),
    )
    df = df.withColumn("tokens", F.when(F.col("op") != "delete", tokens))

    wrong = F.pmod(H("bad", "id"), F.lit(1000)) < int(spec.wrong_ntok_frac * 1000)
    df = df.withColumn(
        "n_tok",
        F.when(F.col("tokens").isNull(), F.lit(None).cast("int")).otherwise(
            F.when(wrong, F.size("tokens") + 3).otherwise(F.size("tokens")).cast("int")
        ),
    )

    src_idx = F.pmod(H("src", dkey), F.lit(len(SOURCES))).cast("int")
    df = df.withColumn("source", F.element_at(F.array(*[F.lit(s) for s in SOURCES]), src_idx + 1))

    df = (
        df.withColumn("partition", F.pmod(H(None, dkey), F.lit(spec.n_partitions)).cast("int"))
        .withColumn("offset", F.col("lsn"))
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")))
    )

    if spec.evolve_from_lsn is not None:
        tag = F.when(
            F.col("lsn") >= spec.evolve_from_lsn,
            F.format_string("tag-%d", F.pmod(H("tag", "id"), F.lit(5))),
        )
        df = df.withColumn("tag", tag)

    # duplicate deliveries: identical (partition, offset, payload), re-sent
    dup = df.filter(
        F.pmod(H("dup", "id"), F.lit(1000)) < int(spec.dup_frac * 1000)
    )
    cols = EVENT_COLUMNS + (["tag"] if spec.evolve_from_lsn is not None else [])
    return df.select(*cols).unionAll(dup.select(*cols))


def write_segments(
    df: DataFrame, path: str, n_segments: int, max_lsn: int, drop_tag_before_evolve: int | None = None
) -> list[str]:
    """Materialize the binlog as ordered segment directories
    ``seg-00000..`` by lsn range — the file-based stand-in for Kafka
    topic segments. If ``drop_tag_before_evolve`` is set, segments that
    end before that lsn are written WITHOUT the tag column (the physical
    schema really evolves mid-stream)."""
    import os

    step = (max_lsn + n_segments - 1) // n_segments
    seg_paths = [f"{path}/seg-{s:05d}" for s in range(n_segments)]
    if drop_tag_before_evolve is None:
        # ONE pass: the generator is a lazy spark.range plan, so the
        # old per-segment filter loop re-executed every hash for ALL
        # events once per segment (n_segments x the full generation
        # cost). A dynamic partitionBy writes all segments in a single
        # job; the partition column is dropped from the files, so each
        # renamed directory reads back with the original schema.
        seg_idx = F.floor((F.col("lsn") - 1) / F.lit(step)).cast("int")
        (
            df.withColumn("_seg", F.least(seg_idx, F.lit(n_segments - 1)))
            .write.partitionBy("_seg")
            .mode("overwrite")
            .parquet(path)
        )
        for s, seg_path in enumerate(seg_paths):
            part_dir = f"{path}/_seg={s}"
            if os.path.isdir(part_dir):
                os.rename(part_dir, seg_path)
            else:  # empty segment: write a schema-bearing empty dir
                df.filter(F.lit(False)).write.mode("overwrite").parquet(seg_path)
        return seg_paths
    # schema-evolving variant (test fixtures): per-segment schemas
    # genuinely differ, so each segment is its own write
    for s, seg_path in enumerate(seg_paths):
        lo, hi = s * step + 1, min((s + 1) * step, max_lsn)
        seg = df.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
        if hi < drop_tag_before_evolve and "tag" in df.columns:
            seg = seg.drop("tag")
        seg.write.mode("overwrite").parquet(seg_path)
    return seg_paths


def read_segments(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Bounded batch read of binlog segments (mergeSchema: segments from
    before the evolution epoch lack the tag column)."""
    return spark.read.option("mergeSchema", True).parquet(*paths)


def read_offset_range(
    spark: SparkSession, path: str, partition: int, start: int, end: int
) -> DataFrame:
    """Offset-range replay of one partition — the reference's
    read_messages_from_offset_range (kafka_jdd_to_mongo.rs:18-66)."""
    df = spark.read.option("mergeSchema", True).parquet(f"{path}/seg-*")
    return df.filter(
        (F.col("partition") == partition)
        & (F.col("offset") >= start)
        & (F.col("offset") <= end)
    )
