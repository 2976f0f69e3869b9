"""Physical-plan quality gates — the 100 TB properties must be visible
in `explain`, not just hoped for:

- filters reach the parquet scan (PushedFilters) and projection prunes
  the read schema;
- dimension joins broadcast (no shuffle of the fact side);
- LWW aggregates map-side (partial_max_by) before the shuffle — the
  skew story;
- metadata-only media queries never read the binary payload column.

These are regression tests: a refactor that silently turns a broadcast
join into a sort-merge join or breaks pushdown fails here, not in a
cluster bill.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from etl_rs_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    p = plan_of(entry.q01_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # projection pruned: the scan must not read unused lineitem columns
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_q03_broadcasts_dimensions(spark):
    p = plan_of(entry.q03_nation_rollup(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q04_anti_join_broadcasts(spark):
    p = plan_of(entry.q04_customers_no_urgent(spark, SF))
    assert "LeftAnti" in p
    assert "BroadcastHashJoin LeftAnti" in p or "BroadcastHashJoin" in p


def test_lww_partial_aggregation(spark):
    """lww_agg must plan a map-side partial_max_by: each input partition
    pre-combines to one candidate per key before shuffling — this is
    what makes a hot doc_id a non-event (SURVEY.md §4.3)."""
    p = plan_of(entry.q10_cdc_lww(spark, SF))
    assert "partial_max_by" in p


def test_q07_pair_join_is_hash_not_nested_loop(spark):
    """The reference's cross join re-planned as an equi join must never
    fall back to BroadcastNestedLoopJoin (transform_hdd_deduplication.rs
    :24-66 -> SURVEY.md §2.3 J1)."""
    p = plan_of(entry.q07_order_pairs(spark, SF))
    assert "NestedLoop" not in p
    assert "Join" in p


def test_media_metadata_prunes_binary(spark):
    media = mm.synth_media(spark, 50)
    media.write.mode("overwrite").parquet("/tmp/_plan_media_pq")
    df = spark.read.parquet("/tmp/_plan_media_pq")
    q = mm.filter_media_metadata(df, mimes=("image/png",), min_pixels=64).select(
        "media_id", "mime"
    )
    p = plan_of(q)
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "payload" not in read


def test_no_single_partition_exchange_in_contract_queries(spark):
    """No contract query may funnel through a single-reducer stage
    (Exchange SinglePartition) — the failure mode of a global
    rank/sort like the old vocab build. Cartesian products are banned
    outright; the only NestedLoop allowed is q22's deliberate
    broadcast brute-force scorer (tiny query side x corpus — the
    exact-rank verifier for the ANN paths)."""
    skip = {
        # non-parquet inputs (synth/k-means fit at plan time); their
        # plan properties are covered by their own operator tests
        "q24_multimodal_features", "q25_cdc_replay_state", "q33_ivf_topk",
    }
    for name, fn in entry.queries().items():
        if name in skip:
            continue
        p = plan_of(fn(spark, SF))
        assert "Exchange SinglePartition" not in p, f"{name} has a single-reducer stage"
        assert "CartesianProduct" not in p, f"{name} has a cartesian product"
        if name != "q22_cosine_topk":
            assert "NestedLoop" not in p, f"{name} has a nested-loop join"


def test_lsh_partitioned_probe_prunes_buckets(spark, tmp_path):
    """The ANN probe against a bucket-partitioned corpus must push the
    probed bucket ids into the scan as PartitionFilters — the probe
    reads only its bucket directories, never the corpus."""
    from etl_rs_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    rows = [(i, [float(i % 7) - 3, float(i % 5) - 2, 1.0, 0.5]) for i in range(64)]
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    path = str(tmp_path / "corpus")
    sim.write_lsh_partitioned(vecs, path, dim=4, n_planes=3)
    q = sim.lsh_topk_partitioned(
        spark, path, vecs.filter(F.col("vec_id") < 2), dim=4, k=3,
        n_planes=3, n_probe=1,
    )
    p = plan_of(q)
    scan_lines = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert scan_lines, "corpus scan has no partition filter"
    # the probed bucket ids reach the scan (IN-list, or an equality
    # when Catalyst simplifies a single probe)
    assert any("bucket" in l and "PartitionFilters: []" not in l for l in scan_lines)


def test_whole_stage_codegen_on_transforms(spark):
    """The expression-flavor transforms stay inside WholeStageCodegen
    (no Python eval nodes in the plan)."""
    p = plan_of(entry.q13_transform_nom(spark, SF))
    assert "codegen id" in p  # formatted-mode codegen marker
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
