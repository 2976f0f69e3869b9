"""JDBC scan/sink wrappers — the real `spark.read.jdbc` code paths.

Mirrors the reference's Postgres layer (examples/csv_hdd_to_postgres.rs:
79-109: open connection, CREATE TABLE from the frame's schema, row
INSERTs) re-expressed for a cluster:

- `jdbc_scan` — partitioned parallel read: Spark issues one bounded
  query per partition (`partition_column` stride or explicit
  `predicates`), so a 10^9-row table lands as N parallel cursors, not
  one driver-side fetch;
- `jdbc_sink` — append/overwrite via the connector's batched INSERTs
  (`batchsize`, rewriteBatchedStatements on the URL); the reference's
  row-at-a-time INSERT loop becomes executor-parallel batches.
  Exactly-once UPSERT is NOT a JDBC-append property — route through
  sinks/lakehouse.LakehouseTable MERGE and publish the merged snapshot,
  or stage to a temp table and issue MERGE server-side.

The sandbox has no database, so integration stops at `.load()`/`.save()`;
option assembly and stride-predicate generation are pure functions with
unit tests (tests/test_connectors.py). On a cluster the same functions
run unchanged against any JDBC driver on the classpath.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str                      # jdbc:postgresql://host:5432/db
    table: str                    # table or "(subquery) AS t"
    user: str | None = None
    #: repr=False: the credential must not leak into logs/tracebacks
    #: that format the config
    password: str | None = field(default=None, repr=False)
    driver: str = "org.postgresql.Driver"
    fetch_size: int = 10_000      # cursor batch per round trip (scan)
    batch_size: int = 10_000      # rows per INSERT batch (sink)
    #: parallel-scan stride column (numeric/date, ideally the PK)
    partition_column: str | None = None
    num_partitions: int = 8
    lower_bound: int | None = None
    upper_bound: int | None = None


def jdbc_common_options(cfg: JdbcConfig) -> dict[str, str]:
    opts = {"url": cfg.url, "dbtable": cfg.table, "driver": cfg.driver}
    if cfg.user is not None:
        opts["user"] = cfg.user
    if cfg.password is not None:
        opts["password"] = cfg.password
    return opts


def jdbc_scan_options(cfg: JdbcConfig) -> dict[str, str]:
    """Reader option map; includes the stride-partitioning quad when a
    partition_column is configured (Spark then plans num_partitions
    parallel range queries instead of a single cursor)."""
    opts = jdbc_common_options(cfg)
    opts["fetchsize"] = str(cfg.fetch_size)
    if cfg.partition_column is not None:
        if cfg.lower_bound is None or cfg.upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=cfg.partition_column,
            numPartitions=str(cfg.num_partitions),
            lowerBound=str(cfg.lower_bound),
            upperBound=str(cfg.upper_bound),
        )
    return opts


def stride_predicates(
    column: str, lower: int, upper: int, n: int
) -> list[str]:
    """Explicit per-partition WHERE predicates (the alternative to the
    stride quad when the key space is known but sparse/skewed): n
    half-open ranges covering [lower, upper] with NULLs routed to the
    first slice — matches Spark's own JDBCRelation slicing semantics."""
    if n <= 0:
        raise ValueError("n must be positive")
    if n == 1:
        # one partition = the whole table, like Spark's own slicing —
        # a bounded predicate here would silently DROP rows outside a
        # stale [lower, upper] estimate
        return ["1=1"]
    span = max(upper - lower + 1, 1)
    step = (span + n - 1) // n
    preds = []
    for i in range(n):
        lo, hi = lower + i * step, lower + (i + 1) * step
        if i == 0:
            preds.append(f"{column} < {hi} OR {column} IS NULL")
        elif i == n - 1:
            preds.append(f"{column} >= {lo}")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {hi}")
    return preds


def jdbc_scan(
    spark: SparkSession, cfg: JdbcConfig, predicates: list[str] | None = None
) -> DataFrame:
    """Parallel JDBC read. With `predicates`, one partition per
    predicate; else the stride quad (if configured); else a single
    cursor (small dims only — broadcast those into joins)."""
    if predicates is not None:
        props = {k: v for k, v in jdbc_common_options(cfg).items() if k not in ("url", "dbtable")}
        props["fetchsize"] = str(cfg.fetch_size)
        return spark.read.jdbc(cfg.url, cfg.table, predicates=predicates, properties=props)
    return spark.read.format("jdbc").options(**jdbc_scan_options(cfg)).load()


def jdbc_sink(df: DataFrame, cfg: JdbcConfig, mode: str = "append") -> None:
    """Batched parallel JDBC write (one connection per input partition).
    `mode` is append/overwrite — the reference's CSV->Postgres loader
    semantics (create + insert). Coalesce upstream if the target DB
    cannot take input-partition-many concurrent connections."""
    opts = jdbc_common_options(cfg)
    opts["batchsize"] = str(cfg.batch_size)
    df.write.format("jdbc").options(**opts).mode(mode).save()
