"""Mongo sink — the `format("mongodb")` code path for the reference's
Overwrite/Append document sink.

Mirrors the reference example `kafka_jdd_to_mongo.rs:68-95`
(`save_kafka_messages_to_mongo`): each row's payload becomes one
document; `Overwrite` drops the collection then bulk-inserts
(Spark's own `mode("overwrite")` on the Mongo Spark Connector —
`spark.mongodb.write.operationType=insert` after a collection drop),
`Append` bulk-inserts into the existing collection. The reference's
`MongoConfig {database, collection}` plus the connection URI
(`config.rs:33-36`, the example's `mongodb://user:pw@host:port/` URI
assembly at :121-128) map onto connector options.

The sandbox ships no Mongo Spark Connector jar and no broker, so —
exactly like sources/kafka.py and sources/jdbc.py — everything up to
`.save()` is plain unit-tested code (option assembly, mode mapping,
URI building) and `MongoSink.write` raises cleanly when the connector
is absent. On a cluster with `mongo-spark-connector` the same calls
run unchanged. Durable upsert semantics (idempotent MERGE, LWW) live
in the lakehouse/iceberg sinks; this wrapper is the document-store
egress the reference treats as an example endpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import quote

from pyspark.sql import DataFrame

#: Spark writer modes implementing the reference's WriteMode enum:
#: Overwrite = drop + insert_many, Append = insert_many
WRITE_MODES = {"overwrite": "overwrite", "append": "append"}


@dataclass
class MongoConfig:
    """Connection + namespace for one collection (reference
    MongoConfig, config.rs:33-36, plus the URI parts the example
    assembles at kafka_jdd_to_mongo.rs:121-128)."""

    host: str
    port: int
    database: str
    collection: str
    user: str | None = None
    password: str | None = None

    @property
    def uri(self) -> str:
        """mongodb://[user:pw@]host:port/ — credentials are
        percent-escaped (a password containing '@' or ':' must not
        split the authority)."""
        auth = ""
        if self.user is not None:
            pw = f":{quote(self.password or '', safe='')}" if self.password is not None else ""
            auth = f"{quote(self.user, safe='')}{pw}@"
        return f"mongodb://{auth}{self.host}:{self.port}/"


def mongo_writer_options(cfg: MongoConfig) -> dict[str, str]:
    """Option map for the Mongo Spark Connector writer. The connector
    shards the insert across executors (one bulk write per partition) —
    the distributed analogue of the reference's single insert_many."""
    return {
        "connection.uri": cfg.uri,
        "database": cfg.database,
        "collection": cfg.collection,
    }


class MongoSink:
    """S9: Overwrite/Append document sink with the same write-mode
    surface as the reference example. ``write`` maps WriteMode onto the
    Spark writer mode (the connector implements overwrite as collection
    replacement — drop + insert, matching coll.drop() + insert_many)."""

    def __init__(self, cfg: MongoConfig):
        self.cfg = cfg

    def writer(self, df: DataFrame, mode: str = "append"):
        """The configured DataFrameWriter, not yet executed — separable
        so tests can assert the full option/mode assembly without a
        connector jar."""
        if mode not in WRITE_MODES:
            raise ValueError(
                f"mode must be one of {sorted(WRITE_MODES)}, got {mode!r}"
            )
        return (
            df.write.format("mongodb")
            .mode(WRITE_MODES[mode])
            .options(**mongo_writer_options(self.cfg))
        )

    def write(self, df: DataFrame, mode: str = "append") -> None:
        try:
            self.writer(df, mode).save()
        except Exception as e:  # connector jar missing -> actionable error
            # match ONLY the missing-data-source error shapes: a bare
            # 'mongodb' substring would also match any connectivity /
            # auth failure (the URI echoes into those messages) and
            # mislabel it as a classpath problem
            msg = str(e)
            if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
                raise RuntimeError(
                    "Mongo Spark Connector not on the classpath; ship "
                    "org.mongodb.spark:mongo-spark-connector to use "
                    "MongoSink (option assembly is unit-tested without it)"
                ) from e
            raise
