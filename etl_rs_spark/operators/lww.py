"""Last-writer-wins resolution over (lsn, offset) per key.

The reference's precedent is Kafka (partition, offset) addressing
(crates/libs/lib-etl/src/config.rs:10-17) — the winner per ``doc_id`` is
the event with the greatest ``(lsn, offset)``.

Two physical strategies, same semantics:

- ``lww_window``: row_number over a per-key window. One shuffle, but a
  hot key serializes into a single task — fine for balanced keys.
- ``lww_agg``: ``max_by(payload_struct, order_struct)`` aggregation.
  Spark plans a partial (map-side) aggregate before the shuffle, so a
  hot key is pre-combined on every input partition — each mapper ships
  ONE candidate row per key it saw. This is the skew story: the partial
  agg IS the salted pre-aggregation (an explicit two-phase variant with
  a hash salt is provided for the case where the optimizer's partial agg
  is disabled or the combine ratio needs forcing).

Default everywhere: ``lww_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lww_window(
    df: DataFrame,
    key: str = "doc_id",
    order: tuple[str, ...] = ("lsn", "offset"),
) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_agg(
    df: DataFrame,
    key: str = "doc_id",
    order: tuple[str, ...] = ("lsn", "offset"),
) -> DataFrame:
    payload = [c for c in df.columns if c != key]
    ord_struct = F.struct(*[F.col(c) for c in order])
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")
    out = df.groupBy(key).agg(winner)
    return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_salted(
    df: DataFrame,
    key: str = "doc_id",
    order: tuple[str, ...] = ("lsn", "offset"),
    salt_buckets: int = 16,
) -> DataFrame:
    """Explicit two-phase LWW: partial max per (key, salt), then final max
    per key. The salt spreads a hot key over ``salt_buckets`` reducers in
    phase 1; phase 2 re-aggregates ≤ salt_buckets rows per key."""
    payload = [c for c in df.columns if c != key]
    ord_struct = F.struct(*[F.col(c) for c in order])
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_w")

    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(winner)
    partial = partial.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])

    final = partial.groupBy(key).agg(winner)
    return final.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])
