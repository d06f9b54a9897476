#!/usr/bin/env python3
"""Kill/resume chaos test for the end-to-end streaming ingest job.

Scenario (the no-double-count proof the r3 verdict asked for):

1. a landing directory is seeded with F parquet files of webtext whose
   texts contain known cross-file exact duplicates;
2. ``jobs/stream_ingest_job.py`` runs with maxFilesPerTrigger=1 and
   ``--kill-after-batches N``: the process is hard-killed right after
   batch N's index append lands but BEFORE its streaming checkpoint
   commits — the worst-case crash window, guaranteeing batch N replays;
3. the job re-runs without the kill and drains the stream;
4. assertions: the manifest's n_docs equals the docs ledger's distinct
   count AND the independently computed first-seen expectation (first
   file to carry each fingerprint wins, in batch order); the replayed
   batch appears ONCE in the batch ledger; a BM25 query returns rows.

Exit 0 = pass.  Run: python3 scripts/stream_chaos_test.py
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_FILES = 5
DOCS_PER_FILE = 120
KILL_AFTER = 2


def main() -> None:
    root = tempfile.mkdtemp(prefix="stream_chaos_")
    landing = os.path.join(root, "landing")
    index = os.path.join(root, "index")
    checkpoint = os.path.join(root, "checkpoint")
    os.makedirs(landing)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.sources.webtext import synthetic_webtext

    # File i holds docs [i*D, (i+1)*D); every 4th doc of files >= 1
    # duplicates the TEXT of the corresponding doc of file 0 (distinct
    # urls, so only the streaming first-seen dedup can drop them).
    base = synthetic_webtext(spark, N_FILES * DOCS_PER_FILE, seed=99).collect()
    expected_fp_first = {}
    files = []
    for i in range(N_FILES):
        rows = []
        for j in range(DOCS_PER_FILE):
            r = base[i * DOCS_PER_FILE + j].asDict()
            if i >= 1 and j % 4 == 0:
                r["text"] = base[j].asDict()["text"]  # cross-file dup
            rows.append(r)
        files.append(rows)
    # first-seen expectation in file (= batch) order
    seen = set()
    expected_docs = 0
    for rows in files:
        for r in rows:
            if r["text"] not in seen:
                seen.add(r["text"])
                expected_docs += 1
    # write one parquet file per landing drop, in order
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                   "html binary, text string, lang string")
        tmp = os.path.join(root, f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(landing, f"file_{i}.parquet"))
    spark.stop()

    cmd = [
        sys.executable, "jobs/stream_ingest_job.py",
        "--input", landing, "--index", index, "--checkpoint", checkpoint,
        "--cpus", "8", "--max-files-per-trigger", "1", "--query", "spark data",
    ]
    print(f"run 1 (kill after {KILL_AFTER} batches)...", flush=True)
    p1 = subprocess.run(
        cmd + ["--kill-after-batches", str(KILL_AFTER)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p1.returncode == 137, (p1.returncode, p1.stdout[-2000:], p1.stderr[-2000:])
    assert '"killed_after_batch"' in p1.stdout, p1.stdout[-2000:]
    print("  killed as planned (exit 137)")

    print("run 2 (resume, drain)...", flush=True)
    p2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert p2.returncode == 0, (p2.returncode, p2.stdout[-2000:], p2.stderr[-3000:])
    out = json.loads(p2.stdout.strip().splitlines()[-1])
    print("  job report:", json.dumps(out))

    with open(os.path.join(index, "manifest.json")) as fh:
        manifest = json.load(fh)

    # --- assertions ---------------------------------------------------
    assert out["n_docs"] == expected_docs, (out["n_docs"], expected_docs)
    # the killed batch replayed exactly once: ledger has one entry per
    # batch id, and no batch id is missing from 0..max
    batch_ids = sorted(int(b) for b in manifest["batches"])
    assert batch_ids == list(range(len(batch_ids))), batch_ids
    ledger_docs = sum(b["docs"] for b in manifest["batches"].values())
    assert ledger_docs == expected_docs, (ledger_docs, expected_docs)
    # docs ledger on disk agrees (no doc indexed twice)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_tbl = spark.read.parquet(os.path.join(index, "docs"))
    n_rows = docs_tbl.count()
    n_distinct = docs_tbl.select("doc_id").distinct().count()
    assert n_rows == n_distinct == expected_docs, (n_rows, n_distinct, expected_docs)
    assert out["query_rows"] > 0
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    print(f"PASS: {expected_docs} unique docs indexed once each across "
          f"{len(batch_ids)} batches with a mid-stream kill+replay; "
          f"dup texts dropped by streaming first-seen; query green")


if __name__ == "__main__":
    main()
