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


def test_multimodal_kinds_coalesce(rng):
    """Mixed semantic + phash + blip bursts: one device pass per modality
    (VERDICT r2: phash and text: queries previously bypassed coalescing)."""
    from pixelbox_tpu.ops.hamming_gemm import (
        build_hamming_gemm_index,
        hamming_gemm_scan_topk_auto,
    )
    from pixelbox_tpu.ops.packed import PackedHammingIndex

    db = rng.integers(0, 256, size=(1024, 32), dtype=np.uint8)
    sem_idx = make_semantic_index(db, block_rows=256)

    phashes = rng.integers(0, 256, size=(512, 16), dtype=np.uint8)
    import jax.numpy as jnp

    n_pad = 512
    ph_index = PackedHammingIndex(
        jnp.asarray(phashes), jnp.asarray(np.ones(n_pad, bool))
    )
    gemm = build_hamming_gemm_index(ph_index)

    def phash_fn(queries, k, md):
        d, i = hamming_gemm_scan_topk_auto(
            jnp.asarray(queries), gemm, k=k, max_distance=md
        )
        return np.asarray(d), np.asarray(i)

    blip_db = rng.integers(0, 256, size=(1024, 32), dtype=np.uint8)
    blip_idx = make_semantic_index(blip_db, block_rows=256)

    def blip_fn(queries, k, md):
        from pixelbox_tpu.ops.scan import cosine_scan_topk

        d, i = cosine_scan_topk(jnp.asarray(queries), blip_idx, k=k)
        return np.asarray(d), np.asarray(i)

    svc = BatchingScanService(
        lambda: sem_idx, k=10, max_wait_ms=40.0, mode="exact",
        scan_fns={"phash": phash_fn},
    )
    svc.register_kind("blip", blip_fn)
    assert set(svc.kinds) == {"semantic", "phash", "blip"}
    try:
        n_each = 6
        sem_q = rng.integers(0, 256, size=(n_each, 32), dtype=np.uint8)
        ph_q = rng.integers(0, 256, size=(n_each, 16), dtype=np.uint8)
        bl_q = rng.integers(0, 256, size=(n_each, 32), dtype=np.uint8)
        results = {}

        def run(kind, i, q):
            results[(kind, i)] = svc.submit(q, kind=kind)

        threads = []
        for i in range(n_each):
            threads.append(threading.Thread(target=run, args=("semantic", i, sem_q[i])))
            threads.append(threading.Thread(target=run, args=("phash", i, ph_q[i])))
            threads.append(threading.Thread(target=run, args=("blip", i, bl_q[i])))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        # Correctness per modality.
        exp_d, exp_i = oracle.cosine_scan_topk_np(sem_q, db, k=10)
        for i in range(n_each):
            d, x = results[("semantic", i)]
            np.testing.assert_array_equal(d, exp_d[i])
            np.testing.assert_array_equal(x, exp_i[i])
        exp_bd, exp_bi = oracle.cosine_scan_topk_np(bl_q, blip_db, k=10)
        for i in range(n_each):
            d, x = results[("blip", i)]
            np.testing.assert_array_equal(d, exp_bd[i])
            np.testing.assert_array_equal(x, exp_bi[i])
        for i in range(n_each):
            d, x = results[("phash", i)]
            exp = oracle.hamming_distance_np(ph_q[i][None, :], phashes)
            np.testing.assert_array_equal(d, np.sort(exp)[:10])
        # 18 queries served in far fewer device batches than queries.
        assert svc.queries_served == 3 * n_each
        assert svc.batches_run < svc.queries_served
    finally:
        svc.close()


def test_unknown_kind_is_loud(service, rng):
    svc, _ = service
    with pytest.raises(KeyError):
        svc.submit(rng.integers(0, 256, size=32, dtype=np.uint8), kind="nope")
