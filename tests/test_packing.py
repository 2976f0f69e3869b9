"""Sequence packing (operators/packing.py) — concat-and-chunk of
tokenized docs into fixed max_len training windows.

Exactness bar: bit-equality against a driver-side python oracle over
randomized corpora (empty docs, straddling docs, separators), plus the
structural invariants a training pipeline relies on: zero token loss,
every non-final chunk exactly max_len, chunk ids contiguous per shard,
and output independent of input partitioning.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.packing import pack_sequences


def _py_pack(docs, L, n_shards, sep=None):
    """Driver-side oracle: same concat-and-chunk rule, plain python."""
    out = {}
    shards: dict[int, list] = {}
    for i, tk in sorted(docs):
        t = list(tk) + ([sep] if sep is not None else [])
        if not t:
            continue
        shards.setdefault(i % n_shards, []).append((i, t))
    for s, dd in shards.items():
        stream: list[int] = []
        contrib: dict[int, set] = {}
        pos = 0
        for i, t in dd:
            for j in range(len(t)):
                contrib.setdefault((pos + j) // L, set()).add(i)
            stream.extend(t)
            pos += len(t)
        for c in range((len(stream) + L - 1) // L):
            chunk = stream[c * L : (c + 1) * L]
            out[(s, c)] = (tuple(chunk), len(chunk), len(contrib[c]))
    return out


def _spark_pack(df, L, n_shards, sep=None):
    got = pack_sequences(df, L, n_shards=n_shards, sep_token=sep)
    return {
        (r["shard"], r["chunk"]): (tuple(r["tokens"]), r["n_tokens"], r["n_docs"])
        for r in got.collect()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    random.seed(11)
    docs = [
        (i, [random.randrange(50257) for _ in range(random.choice([0, 0, 1, 2, 5, 17, 40, 300]))])
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    return docs, df


@pytest.mark.parametrize(
    "L,ns,sep",
    [
        (64, 4, None),
        (64, 4, 50256),
        (7, 8, None),  # most docs straddle several windows
        (10_000, 2, 0),  # corpus smaller than one window per shard
        (1, 3, None),  # every token its own window
    ],
)
def test_pack_matches_python_oracle_exactly(corpus, L, ns, sep):
    docs, df = corpus
    assert _spark_pack(df, L, ns, sep) == _py_pack(docs, L, ns, sep)


def test_pack_invariants(corpus):
    docs, df = corpus
    L, ns = 32, 4
    got = pack_sequences(df, L, n_shards=ns).collect()
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    total_in = sum(len(tk) for _i, tk in docs)
    total_out = sum(r["n_tokens"] for r in got)
    assert total_out == total_in  # zero loss, zero padding
    for s, rows in by_shard.items():
        rows.sort(key=lambda r: r["chunk"])
        # contiguous 0-based chunk ids per shard
        assert [r["chunk"] for r in rows] == list(range(len(rows)))
        # every chunk but the shard's last is exactly full
        assert all(r["n_tokens"] == L for r in rows[:-1])
        assert 0 < rows[-1]["n_tokens"] <= L
        assert all(len(r["tokens"]) == r["n_tokens"] for r in rows)
        assert all(r["n_docs"] >= 1 for r in rows)
        # shard stream equality: concatenating the chunks reproduces the
        # shard's docs concatenated in doc_id order
        stream = [t for r in rows for t in r["tokens"]]
        expect = [
            t for i, tk in sorted(docs) if i % ns == s for t in tk
        ]
        assert stream == expect


def test_pack_partitioning_invariance(corpus):
    """Output is a pure function of the rows: repartitioning the input
    arbitrarily (including a skewed coalesce) changes nothing."""
    docs, df = corpus
    base = _spark_pack(df, 48, 4)
    assert _spark_pack(df.repartition(13), 48, 4) == base
    assert _spark_pack(df.coalesce(1), 48, 4) == base


def test_pack_separator_and_empty_docs(spark):
    docs = [(0, [1, 2, 3]), (4, []), (8, [9]), (12, [])]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    # without separator: empty docs vanish entirely
    got = _spark_pack(df, 4, 1)
    assert got == {(0, 0): ((1, 2, 3, 9), 4, 2)}
    # with separator: EVERY doc contributes tokens+sep — an empty doc
    # is a lone separator in the stream (the GPT-style EOS convention)
    got = _spark_pack(df, 4, 1, sep=99)
    assert got == {
        (0, 0): ((1, 2, 3, 99), 4, 1),
        (0, 1): ((99, 9, 99, 99), 4, 3),
    }


def test_pack_plans_one_shuffle(spark, corpus):
    """The whole pack is ONE exchange: the window's hash(shard)
    partitioning satisfies the (shard, chunk) groupBy (subset of the
    grouping keys), so chunk assembly runs map-side with no second
    shuffle — the property that makes the operator one-pass at 100 TB."""
    _docs, df = corpus
    df = df.repartition(5)  # arbitrary input partitioning
    plan = pack_sequences(df, 64, n_shards=8)._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange \w+", plan)
    assert exchanges.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_pack_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, [1])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError, match="max_len"):
        pack_sequences(df, 0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, 8, n_shards=0)
    # string ids without shard_expr: a silent cast would put everything
    # in one NULL shard — must be a loud error instead
    sdf = spark.createDataFrame([("d1", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError, match="numeric id"):
        pack_sequences(sdf, 8)


def test_pack_composite_identity(spark):
    """mix_sample replicas pack as distinct docs via a composite id:
    order is lexicographic on (doc_id, replica), shard from the first
    id column — no lossy doc_id*K+replica encoding."""
    rows = [
        (2, 0, [20, 21]), (2, 1, [20, 21]),  # two replicas of doc 2
        (1, 0, [10]), (3, 0, [30, 31, 32]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, replica int, tokens array<int>")
    got = {
        (r["shard"], r["chunk"]): (tuple(r["tokens"]), r["n_docs"])
        for r in pack_sequences(df, 4, id_col=("doc_id", "replica"), n_shards=2).collect()
    }
    # shard 0: doc 2 replicas in replica order -> [20,21,20,21]
    # shard 1: docs 1 then 3 -> [10,30,31,32]
    assert got == {
        (0, 0): ((20, 21, 20, 21), 2),
        (1, 0): ((10, 30, 31, 32), 2),
    }


def test_pack_custom_shard_expr(spark):
    """String ids via a caller-supplied shard key: same packing rule,
    shard from xxhash64 — deterministic but not SQL-portable, which is
    why the contract query keeps pmod(doc_id, n)."""
    docs = [(f"d{i:03d}", list(range(i % 5))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    out = pack_sequences(
        df, 16, n_shards=4,
        shard_expr=F.pmod(F.xxhash64("doc_id"), F.lit(4)),
    )
    rows = out.collect()
    assert sum(r["n_tokens"] for r in rows) == sum(len(t) for _, t in docs)
    assert set(r["shard"] for r in rows) <= {0, 1, 2, 3}


def _upsert(prefix_chunks: dict, tail_chunks: dict) -> dict:
    out = dict(prefix_chunks)
    out.update(tail_chunks)
    return out


@pytest.mark.parametrize(
    "L,ns,sep,split",
    [
        (64, 4, None, 150),
        (64, 4, 50256, 150),
        (7, 8, None, 17),     # boundary chunk almost always partial
        (7, 8, None, 299),    # single-doc tail
        (64, 4, None, 0),     # empty prefix: tail == full pack
        (64, 4, None, 300),   # empty tail: nothing emitted
    ],
)
def test_pack_tail_upsert_equals_full_repack(spark, corpus, L, ns, sep, split):
    """The incremental-append invariant: pack the prefix, derive the
    O(n_shards) pack_state, pack ONLY the suffix with pack_tail, upsert
    by (shard, chunk) — bit-identical to packing the whole corpus,
    including n_docs on the completed boundary chunks."""
    from etl_rs_spark.operators.packing import pack_state, pack_tail

    docs, df = corpus
    pre_df = df.filter(F.col("doc_id") < split)
    tail_df = df.filter(F.col("doc_id") >= split)

    pre = pack_sequences(pre_df, L, n_shards=ns, sep_token=sep)
    state = pack_state(pre, L)
    tail = pack_tail(tail_df, state, L, n_shards=ns, sep_token=sep)

    def as_dict(chunks_df):
        return {
            (r["shard"], r["chunk"]): (tuple(r["tokens"]), r["n_tokens"], r["n_docs"])
            for r in chunks_df.collect()
        }

    got = _upsert(as_dict(pre), as_dict(tail))
    assert got == _py_pack(docs, L, ns, sep)
    # tail must not touch committed interior chunks: everything it
    # emits is at or after each shard's boundary chunk
    pre_d = as_dict(pre)
    boundary = {}
    for (s, c) in pre_d:
        boundary[s] = max(boundary.get(s, -1), c)
    for (s, c) in as_dict(tail):
        assert c >= boundary.get(s, 0)


def test_pack_state_shape(spark, corpus):
    """pack_state is O(n_shards): base = total tokens, carry = the
    partial boundary chunk's tokens (empty on an exact boundary)."""
    from etl_rs_spark.operators.packing import pack_state

    _, df = corpus
    packed = pack_sequences(df, 64, n_shards=4)
    st = {r["shard"]: r for r in pack_state(packed, 64).collect()}
    totals = {
        r["shard"]: (r["base"], r["mx"])
        for r in packed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("base"), F.max("chunk").alias("mx"))
        .collect()
    }
    assert set(st) == set(totals)
    for s, r in st.items():
        base, _ = totals[s]
        assert r["base"] == base
        assert len(r["carry"]) == (base % 64 if base % 64 else 0)
        assert (r["carry_docs"] > 0) == (base % 64 != 0)


def test_pack_tail_plans_one_shuffle_and_broadcast_state(spark):
    """pack_tail over a MATERIALIZED state is the same single shard
    shuffle as pack_sequences plus a broadcast of the O(n_shards)
    state — the carry folds into each shard's first run through the
    broadcast join instead of a union, which would erase the window's
    partitioning and force a second full shuffle of the tail."""
    import re

    from etl_rs_spark.operators.packing import pack_tail

    df = spark.createDataFrame(
        [(i, list(range(i % 7))) for i in range(100, 160)],
        "doc_id long, tokens array<int>",
    ).repartition(5)
    state = spark.createDataFrame(
        [(s, 13, [1, 2, 3, 4, 5], 2) for s in range(4)],
        "shard int, base long, carry array<int>, carry_docs int",
    )
    plan = (
        pack_tail(df, state, 8, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = re.findall(r"Exchange \w+", plan)
    assert exchanges.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "Broadcast" in plan


def test_pack_tail_no_new_docs_emits_nothing(spark):
    """A shard with no new documents emits NOTHING — its committed
    chunks, boundary included, are already correct on storage."""
    from etl_rs_spark.operators.packing import pack_state, pack_tail

    df = spark.createDataFrame(
        [(0, [1, 2, 3]), (1, [4, 5])], "doc_id long, tokens array<int>"
    )
    packed = pack_sequences(df, 2, n_shards=2)
    st = pack_state(packed, 2)
    empty = df.filter("doc_id < 0")
    assert pack_tail(empty, st, 2, n_shards=2).count() == 0


def test_pack_tail_streaming_foreachbatch_maintains_packed_table(spark, tmp_path):
    """The CDC-ingest composition for APPEND-ONLY corpora: a document
    stream drains through foreachBatch; each micro-batch derives the
    O(n_shards) pack_state from the packed table so far, tail-packs
    only the batch, and upserts by (shard, chunk) — only boundary
    chunks are ever rewritten. Final table == one-shot full repack."""
    import random

    from pyspark.sql import functions as F  # noqa: F811

    from etl_rs_spark.operators.packing import pack_state, pack_tail

    random.seed(23)
    docs = [
        (i, [random.randrange(997) for _ in range(random.choice([0, 3, 9, 21, 50]))])
        for i in range(120)
    ]
    src = str(tmp_path / "docs_stream")
    # three append-only arrivals, ascending id ranges, one file each
    for lo, hi in ((0, 40), (40, 90), (90, 120)):
        spark.createDataFrame(
            docs[lo:hi], "doc_id long, tokens array<int>"
        ).coalesce(1).write.mode("append").parquet(src)

    packed_dir = str(tmp_path / "packed")
    L, NS = 16, 4

    def upsert_batch(batch_df, _bid):
        import os

        if os.path.isdir(packed_dir) and any(
            f.endswith(".parquet") for f in os.listdir(packed_dir)
        ):
            committed = spark.read.parquet(packed_dir)
            st = pack_state(committed, L)
        else:
            committed = None
            st = spark.createDataFrame(
                [], "shard int, base long, carry array<int>, carry_docs int"
            )
        tail = pack_tail(batch_df, st, L, n_shards=NS)
        if committed is not None:
            keep = committed.join(
                tail.select("shard", "chunk"), ["shard", "chunk"], "left_anti"
            )
            out = keep.unionByName(tail)
        else:
            out = tail
        # collect-then-rewrite: the committed table is also this job's
        # input, so a direct overwrite would read-under-write
        rows = out.collect()
        spark.createDataFrame(rows, out.schema).write.mode("overwrite").parquet(
            packed_dir
        )

    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["shard"], r["chunk"]): (tuple(r["tokens"]), r["n_tokens"], r["n_docs"])
        for r in spark.read.parquet(packed_dir).collect()
    }
    full_df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    want = {
        (r["shard"], r["chunk"]): (tuple(r["tokens"]), r["n_tokens"], r["n_docs"])
        for r in pack_sequences(full_df, L, n_shards=NS).collect()
    }
    assert got == want
    assert len(want) > 4
