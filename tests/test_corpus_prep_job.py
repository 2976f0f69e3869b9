"""jobs/corpus_prep.py CLI contract: the spark-submit corpus pipeline
runs end-to-end, emits one parseable JSON metrics line, and writes
readable packed parquet whose token count matches its own metrics."""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpus_prep_cli(tmp_path):
    out_dir = str(tmp_path / "packed")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "corpus_prep.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", out_dir,
            "--max-len", "128", "--shards", "4", "--cpus", "4",
            "--weight", "src0=2.0", "--weight", "src1=0.5",
            "--jaccard", "0.9", "--sep-token", "50256",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"metric"')][-1]
    m = json.loads(line)
    assert m["metric"] == "corpus_prep"
    for s in ("input", "exact_dedup", "near_dedup", "mix", "pack_write"):
        assert m["stages"][s]["rows"] > 0
    # the mix doubled src0 and halved src1: row count moved
    assert m["stages"]["mix"]["rows"] != m["stages"]["near_dedup"]["rows"]
    assert 0 < m["full_chunk_frac"] <= 1.0
    # written shards are readable and agree with the reported totals
    import duckdb

    con = duckdb.connect()
    n, tok, mx = con.execute(
        f"SELECT count(*), sum(n_tokens), max(n_tokens) "
        f"FROM read_parquet('{out_dir}/*/*.parquet', hive_partitioning=1)"
    ).fetchone()
    assert (n, tok) == (m["chunks"], m["tokens_packed"])
    assert mx <= 128
    # a malformed --weight is a usage error, not a stack trace
    for w, msg in [("novalue", "source=weight"), ("src0=abc", "not a number")]:
        bad = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "jobs", "corpus_prep.py"),
                "--docs", "x", "--out", "y", "--weight", w,
            ],
            capture_output=True, text=True, timeout=120,
        )
        assert bad.returncode == 2 and msg in bad.stderr, (w, bad.stderr[-300:])
    # --no-stage-counts is metrics-only: the packed corpus is IDENTICAL
    # (the near-dup stop-shingle cap must not silently change with it)
    out2 = str(tmp_path / "packed2")
    p2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "corpus_prep.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", out2,
            "--max-len", "128", "--shards", "4", "--cpus", "4",
            "--weight", "src0=2.0", "--weight", "src1=0.5",
            "--jaccard", "0.9", "--sep-token", "50256",
            "--no-stage-counts",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert p2.returncode == 0, p2.stderr[-2000:]
    m2 = json.loads([l for l in p2.stdout.splitlines() if l.startswith('{"metric"')][-1])
    assert (m2["chunks"], m2["tokens_packed"]) == (m["chunks"], m["tokens_packed"])
