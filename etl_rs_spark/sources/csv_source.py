"""CSV sources matching the reference's reader semantics.

Reference (crates/libs/lib-etl/src/csv.rs:5-39): ``;``-delimited,
header row, ``#`` comment lines, doubled-quote escaping, and
**empty string → null** (csv.rs:31-35). All of that is native Spark CSV
options — the scan stays JVM-side and column-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_reference_csv(
    spark: SparkSession,
    path: str,
    sep: str = ";",
    schema: str | None = None,
) -> DataFrame:
    reader = (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("comment", "#")
        .option("quote", '"')
        .option("escape", '"')  # CSV doubles quotes; Spark default escape is '\'
        .option("nullValue", "")  # empty string -> null (csv.rs:31-35)
        .option("multiLine", False)
    )
    if schema:
        reader = reader.schema(schema)
    df = reader.csv(path)
    # strip a UTF-8 BOM that some fixture files carry on the first
    # header (guarded: an empty/comment-only file infers zero columns)
    if df.columns:
        first = df.columns[0]
        if first.startswith("﻿"):
            df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df
