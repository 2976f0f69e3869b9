"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` twin on the
same sf dir, compare row count, sorted column names, and the
order-insensitive multiset of values. Floats compare exactly — the
queries are engineered to be bit-identical across engines."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from etl_rs_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # + 0.0 folds -0.0 into 0.0: the values compare equal, so the
        # canonical strings must too
        return repr(round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    if only:
        unknown = [n for n in only if n not in queries]
        if unknown:
            # a typo'd --only must FAIL, not green-light zero checks
            print(f"FAIL: unknown query names {unknown}; known: {sorted(queries)}")
            return 1
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows) [no oracle]")
            if len(srows) == 0:
                print(f"  WARNING: zero rows")
            continue
        o = con.sql(oracles[name])
        ocols = sorted(o.columns)
        orows = o.fetchall()
        ocol_idx = [o.columns.index(c) for c in ocols]
        scol_idx = [sdf.columns.index(c) for c in scols]
        if scols != ocols:
            print(f"{name}: FAIL schema {scols} vs {ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"{name}: FAIL rowcount {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        from collections import Counter
        sset = Counter(tuple(canon(r[i]) for i in scol_idx) for r in srows)
        oset = Counter(tuple(canon(r[i]) for i in ocol_idx) for r in orows)
        if sset != oset:
            diffs = list((sset - oset).items())[:2] + list((oset - sset).items())[:2]
            print(f"{name}: FAIL values; spark-only then duckdb-only rows: {diffs}")
            failures += 1
        else:
            print(f"{name}: OK ({len(srows)} rows, {len(scols)} cols)")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
