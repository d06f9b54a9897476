"""Writer mutual exclusion (indexing/lock.py).

The reference takes a PID lock so two writers cannot interleave
commits (/root/reference/caterpillar/locking.py:50-195, contention
test processing/test/test_index.py:736-774).  Spark restatement: two
concurrent ``append_batch`` callers on one index path serialize on the
write lock; the manifest ledger and statistics stay exact.
"""

import json
import os
import threading
import time

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.indexing.lock import (
    LOCK_NAME,
    WriterLockTimeout,
    write_lock,
)
from caterpillar_spark.streaming.incremental import append_batch


def test_lock_excludes_and_releases(tmp_path):
    p = str(tmp_path / "idx")
    with write_lock(p):
        assert os.path.exists(os.path.join(p, LOCK_NAME))
        with pytest.raises(WriterLockTimeout, match="write-locked"):
            with write_lock(p, timeout=0.3):
                pass
    assert not os.path.exists(os.path.join(p, LOCK_NAME))
    with write_lock(p, timeout=0.3):  # reacquirable after release
        pass


def test_stale_locks_are_broken(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    lock = os.path.join(p, LOCK_NAME)
    # dead pid on this host -> stale regardless of age
    with open(lock, "w") as f:
        json.dump({"pid": 2**22 + 1234, "host": os.uname().nodename, "ts": time.time()}, f)
    with write_lock(p, timeout=2.0):
        pass
    # over-age lock from another host -> stale
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "elsewhere", "ts": time.time() - 7200}, f)
    with write_lock(p, timeout=2.0, stale_after=3600):
        pass
    # live holder elsewhere, fresh -> NOT stale, times out
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "elsewhere", "ts": time.time()}, f)
    with pytest.raises(WriterLockTimeout):
        with write_lock(p, timeout=0.3):
            pass


def test_concurrent_append_batches_serialize(spark, tmp_path):
    """16 threads race append_batch on one path with disjoint docs: all
    batches land, the manifest ledger has one entry per batch, n_docs
    is exact, and the docs ledger holds every id exactly once."""
    path = str(tmp_path / "idx")
    n_threads, docs_per = 16, 3
    errors = []

    def worker(t):
        try:
            docs = spark.createDataFrame(
                [(t * 100 + i, f"thread {t} doc {i} words") for i in range(docs_per)],
                "doc_id long, text string",
            )
            frames = build_frames(docs, text_cols=["text"], frame_size=0)
            append_batch(frames, path, num_buckets=4, batch_id=t)
        except Exception as e:  # noqa: BLE001 - surface to the assert
            errors.append((t, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    from caterpillar_spark.indexing.build import InvertedIndex

    idx = InvertedIndex(spark, path)
    m = idx.manifest
    assert m["n_docs"] == n_threads * docs_per
    assert len(m["batches"]) == n_threads
    assert m["revision"] == n_threads
    ids = [r["doc_id"] for r in idx.docs().collect()]
    assert len(ids) == len(set(ids)) == n_threads * docs_per
    # statistics stayed exact through the contention: every thread's
    # marker term occurs docs_per times
    from pyspark.sql import functions as F

    ts = (
        idx.term_stats()
        .where(F.col("term") == "words")
        .groupBy("term")
        .agg(F.sum("docs_occuring").alias("d"))
        .collect()
    )
    assert ts[0]["d"] == n_threads * docs_per
