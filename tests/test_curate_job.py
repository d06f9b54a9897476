"""End-to-end curation pipeline job (jobs/curate_job.py): one
subprocess run over the sf0.001 documents table with every optional
stage enabled, asserting the stage-count invariants and the packed
output's integrity."""
import json
import os
import subprocess
import sys

import duckdb
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.mark.skipif(not os.path.exists(SF), reason="driver testdata absent")
def test_curate_job_end_to_end(tmp_path):
    bench = str(tmp_path / "bench.parquet")
    out = str(tmp_path / "curated")
    duckdb.sql(
        f"COPY (SELECT text FROM read_parquet('{SF}') WHERE doc_id < 5) "
        f"TO '{bench}' (FORMAT parquet)"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "/root/repo/jobs/curate_job.py",
            "--input", SF, "--output", out,
            "--benchmark", bench, "--pii",
            "--rates", "src1=1.0,src2=0.5", "--default-rate", "0.8",
            "--token-budget", "5000", "--seq-len", "256", "--cores", "4",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    # monotone survivor counts through the removal stages
    assert (
        m["input_docs"]
        >= m["after_exact_dedup"]
        >= m["after_near_dedup"]
        >= m["after_decontaminate"]
        >= m["after_mixing"]
        >= m["after_token_budget"]
        == m["output_docs"]
        > 0
    )
    # the 5 benchmark docs come from the corpus itself -> all dropped
    assert m["after_near_dedup"] - m["after_decontaminate"] >= 5
    assert m["output_tokens"] <= 5000
    # packed layout is readable and consistent
    rows = duckdb.sql(
        f"SELECT max(start_offset + 0) < sum(n_tokens) AS ok, "
        f"max(chunk_id) <= sum(n_tokens) // 256 AS ok2, "
        f"count(*) = count(DISTINCT doc_id) AS ok3 "
        f"FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert all(rows)
