"""Data mixing (operators/mixing.py) — deterministic source-weighted
up/down-sampling. Exactness bar: bit-equality with a driver-side python
oracle (same md5 formula, same integer thresholds), plus the plan
property that makes it free at scale: zero exchanges.
"""
from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.mixing import mix_sample

WEIGHTS = {"a": 3.0, "b": 0.5, "c": 1.25, "d": 0.0}


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_mix(docs, weights, seed=17, default=0.0):
    out = set()
    for i, s in docs:
        w = weights.get(s, default)
        k = int(math.floor(w))
        thr = int((w - k) * (1 << 60))
        for r in range(k + (1 if thr > 0 else 0)):
            if r < k or _h60(f"{i}:{r}:{seed}") < thr:
                out.add((i, r))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [(i, "abcde"[i % 5]) for i in range(500)]
    return docs, spark.createDataFrame(docs, "doc_id long, source string")


def _spark_mix(df, weights, **kw):
    return {
        (r["doc_id"], r["replica"])
        for r in mix_sample(df, weights, **kw).collect()
    }


def test_mix_matches_python_oracle_exactly(corpus):
    docs, df = corpus
    assert _spark_mix(df, WEIGHTS) == _py_mix(docs, WEIGHTS)
    # default_weight keeps sources missing from the dict ('e' here)
    assert _spark_mix(df, WEIGHTS, default_weight=1.0) == _py_mix(
        docs, WEIGHTS, default=1.0
    )


def test_mix_shares_and_determinism(corpus):
    docs, df = corpus
    got = _spark_mix(df, WEIGHTS)
    per_src = {}
    for i, r in got:
        s = "abcde"[i % 5]
        per_src[s] = per_src.get(s, 0) + 1
    assert per_src["a"] == 300  # exactly 3 copies of 100 docs
    assert "d" not in per_src and "e" not in per_src  # dropped
    assert 25 <= per_src["b"] <= 75  # ~0.5 of 100
    assert 105 <= per_src["c"] <= 145  # ~1.25 of 100
    # reruns and repartitioning change nothing
    assert _spark_mix(df.repartition(11), WEIGHTS) == got
    # a new seed redraws fractional picks but never integer copies
    got2 = _spark_mix(df, WEIGHTS, seed=99)
    a = {(i, r) for i, r in got if i % 5 == 0}
    assert a == {(i, r) for i, r in got2 if i % 5 == 0}
    assert got2 == _py_mix(docs, WEIGHTS, seed=99)


def test_mix_replica_identity_feeds_packing(corpus):
    """Replicated docs are distinct identities downstream: (id, replica)
    is unique and replicas of one doc can land in different windows."""
    _docs, df = corpus
    out = mix_sample(df, {"a": 2.0})
    n = out.count()
    assert n == out.select("doc_id", "replica").distinct().count() == 200
    assert {r["replica"] for r in out.select("replica").distinct().collect()} == {0, 1}


def test_mix_rejects_bad_weights(corpus):
    _docs, df = corpus
    with pytest.raises(ValueError, match="weight"):
        mix_sample(df, {"a": -0.1})
    with pytest.raises(ValueError, match="weight"):
        mix_sample(df, {"a": float("inf")})
    with pytest.raises(ValueError, match="default_weight"):
        mix_sample(df, {"a": 1.0}, default_weight=-1)
    # absurd replication factors fail eagerly, not as an executor OOM
    with pytest.raises(ValueError, match="weight"):
        mix_sample(df, {"a": 1e12})


def test_mix_null_id_matches_sql_null_semantics(spark):
    """A NULL id must behave like the SQL oracle's `||` concatenation:
    integer copies survive (replica < k needs no hash), fractional
    draws never win (NULL comparison). concat_ws would instead skip the
    NULL and give every NULL-id row one shared real draw."""
    df = spark.createDataFrame(
        [(None, "a"), (7, "a")], "doc_id long, source string"
    )
    got = {
        (r["doc_id"], r["replica"])
        for r in mix_sample(df, {"a": 2.9}).collect()
    }
    # both rows keep replicas 0,1; only the non-null id may win replica 2
    assert {(None, 0), (None, 1), (7, 0), (7, 1)} <= got
    assert (None, 2) not in got


def test_mix_plans_zero_exchanges(corpus):
    """Mixing is a narrow projection: no shuffle, no broadcast — the
    weight map folds into the plan as literals and the hash filter runs
    at the scan."""
    _docs, df = corpus
    plan = (
        mix_sample(df, WEIGHTS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
