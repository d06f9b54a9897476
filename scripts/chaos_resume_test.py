#!/usr/bin/env python3
"""Kill/restart resumability evidence (north_rule: 'resumable from
checkpoint with per-partition lineage and build metrics').

1. build an index with many checkpoint slices;
2. SIGKILL the whole build process group once the manifest shows some
   slices committed (a real crash — no cleanup handlers run);
3. rerun the same job and verify it completes from the checkpoint,
   re-running only unacknowledged slices (idempotent dynamic partition
   overwrite), and that the final index answers queries.

Usage: python scripts/chaos_resume_test.py [--n-docs 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

    work = "/tmp/chaos_resume"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus = os.path.join(work, "webtext")
    idx = os.path.join(work, "idx")
    env = {**os.environ, "PYTHONPATH": REPO}
    job = [
        sys.executable, os.path.join(REPO, "jobs", "build_index_job.py"),
        "--cores", str(args.cores), "--input", corpus, "--index-path", idx,
        "--checkpoint-groups", str(args.groups), "--reps", "1",
        "--queries", "the",
    ]

    subprocess.run(
        [*job, "--generate", str(args.n_docs), "--generate-only"],
        check=True, capture_output=True, env=env,
    )

    # Phase 1: start, wait for >=1 committed slice, then SIGKILL the group.
    proc = subprocess.Popen(
        job, env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    manifest_path = os.path.join(idx, "manifest.json")
    killed_after = None
    for _ in range(600):
        time.sleep(0.5)
        if proc.poll() is not None:
            raise SystemExit("build finished before we could kill it — "
                             "raise --n-docs")
        try:
            with open(manifest_path) as fh:
                m = json.load(fh)
            done = len(m.get("completed_slices", {}))
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        if 1 <= done < args.groups:
            os.killpg(proc.pid, signal.SIGKILL)
            killed_after = done
            break
    if killed_after is None:
        raise SystemExit("never observed a partial checkpoint")
    proc.wait()
    print(f"killed (SIGKILL, whole group) after {killed_after}/{args.groups} "
          f"slices committed")

    # Phase 2: rerun the identical job — it must resume and finish.
    out = subprocess.run(job, env=env, capture_output=True, text=True,
                         timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit("resume run failed")
    result = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    with open(manifest_path) as fh:
        m = json.load(fh)
    assert len(m["completed_slices"]) == args.groups, m["completed_slices"]
    assert m["stats_done"]
    assert result["n_docs"] == args.n_docs
    assert result["query_p50"], "query after resume returned nothing"
    print(json.dumps({
        "pass": True,
        "killed_after_slices": killed_after,
        "resumed_slices": args.groups - killed_after,
        "docs_per_sec_resumed_run": result["docs_per_sec"],
        "bm25_p50_sec": result["bm25_p50_sec"],
    }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
