"""Micro-batching scan service: correctness + coalescing."""

import threading

import numpy as np
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.serving import BatchingScanService, _bucket

from test_scan import make_semantic_index


def test_bucket_sizes():
    assert _bucket(1) == 1
    assert _bucket(2) == 8
    assert _bucket(9) == 32
    assert _bucket(300) == 256


@pytest.fixture
def service(rng):
    db = rng.integers(0, 256, size=(1024, 32), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=256)
    svc = BatchingScanService(lambda: idx, k=10, max_wait_ms=20.0, mode="exact")
    yield svc, db
    svc.close()


def test_single_query_matches_oracle(service, rng):
    svc, db = service
    q = rng.integers(0, 256, size=32, dtype=np.uint8)
    dist, idx = svc.submit(q)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=10)
    np.testing.assert_array_equal(dist, exp_d[0])
    np.testing.assert_array_equal(idx, exp_i[0])


def test_concurrent_queries_coalesce(service, rng):
    svc, db = service
    queries = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    results = [None] * 24

    def run(i):
        results[i] = svc.submit(queries[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)

    exp_d, exp_i = oracle.cosine_scan_topk_np(queries, db, k=10)
    for i in range(24):
        dist, idx = results[i]
        np.testing.assert_array_equal(dist, exp_d[i])
        np.testing.assert_array_equal(idx, exp_i[i])
    # Coalescing actually happened: fewer batches than queries.
    assert svc.batches_run < svc.queries_served


def test_error_propagates(rng):
    svc = BatchingScanService(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError):
        svc.submit(rng.integers(0, 256, size=16, dtype=np.uint8), timeout=10)
    svc.close()
