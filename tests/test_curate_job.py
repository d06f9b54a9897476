"""End-to-end curation pipeline job (jobs/curate_job.py): one
subprocess run over a crawl-shaped copy of the sf0.001 documents table
with every optional stage enabled — including the crawl-side domain
blocklist and URL snapshot dedup — asserting the stage-count
invariants and the packed output's integrity."""
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
    crawl = str(tmp_path / "crawl.parquet")
    out = str(tmp_path / "curated")
    duckdb.sql(
        f"COPY (SELECT text FROM read_parquet('{SF}') WHERE doc_id < 5) "
        f"TO '{bench}' (FORMAT parquet)"
    )
    # crawl shape: synthetic url (re-crawled pages share doc_id % 20
    # within a source; 1/3 carry a trailing slash the canonicalizer
    # must fold) + capture timestamp
    duckdb.sql(
        f"""COPY (
            SELECT *,
                   'https://' || source || '.example.org/docs/'
                     || (doc_id % 20)
                     || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
                     AS url,
                   doc_id AS warc_ts
            FROM read_parquet('{SF}')
        ) TO '{crawl}' (FORMAT parquet)"""
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "/root/repo/jobs/curate_job.py",
            "--input", crawl, "--output", out,
            "--url-col", "url", "--ts-col", "warc_ts",
            "--block-hosts", "src3.example.org",
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
        >= m["after_host_filter"]
        >= m["after_url_dedup"]
        >= m["after_exact_dedup"]
        >= m["after_near_dedup"]
        >= m["after_decontaminate"]
        >= m["after_mixing"]
        >= m["after_token_budget"]
        == m["output_docs"]
        > 0
    )
    # src3 pages exist in the corpus and were blocked up front
    n_src3 = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{crawl}') WHERE source = 'src3'"
    ).fetchone()[0]
    assert n_src3 > 0
    assert m["input_docs"] - m["after_host_filter"] == n_src3
    # re-crawled pages collapsed: strictly fewer docs than survived the
    # blocklist (doc_id % 20 collides within sources at 50 docs)
    n_pages = duckdb.sql(
        f"""SELECT count(DISTINCT (source, doc_id % 20))
            FROM read_parquet('{crawl}') WHERE source <> 'src3'"""
    ).fetchone()[0]
    assert m["after_url_dedup"] == n_pages
    assert m["output_tokens"] <= 5000
    # packed layout is readable and consistent; no blocked host leaks
    rows = duckdb.sql(
        f"SELECT max(start_offset + 0) < sum(n_tokens) AS ok, "
        f"max(chunk_id) <= sum(n_tokens) // 256 AS ok2, "
        f"count(*) = count(DISTINCT doc_id) AS ok3, "
        f"count(*) FILTER (url LIKE '%src3%') = 0 AS ok4 "
        f"FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert all(rows)
