"""Distributed scan parity on a CPU-simulated 8-device mesh.

Multi-chip behavior is tested via xla_force_host_platform_device_count=8
(see conftest), per the driver's dry-run model — the reference offers no
distributed pattern to port (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.parallel import (
    make_mesh,
    shard_semantic_index,
    sharded_cosine_scan_topk,
)
from pixelbox_tpu.parallel.sharded_scan import (
    shard_hamming_index,
    sharded_hamming_scan_topk,
)

from test_scan import check_topk_parity, make_hamming_index, make_semantic_index


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return make_mesh(8)


def test_sharded_cosine_matches_oracle(mesh, rng):
    db = rng.integers(0, 256, size=(4096, 64), dtype=np.uint8)
    q = rng.integers(0, 256, size=(5, 64), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=512)  # capacity 4096 = 8*512
    sharded = shard_semantic_index(idx, mesh)
    got_d, got_i = sharded_cosine_scan_topk(
        jnp.asarray(q), sharded, mesh, k=20, block_rows=512
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=20)
    check_topk_parity(got_d, got_i, exp_d, exp_i)


def test_sharded_respects_threshold_and_padding(mesh, rng):
    db = rng.integers(0, 256, size=(3000, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    # block_rows=4096 pads 3000 → capacity 4096 = 8 shards × 512.
    idx = make_semantic_index(db, block_rows=4096)
    sharded = shard_semantic_index(idx, mesh)
    got_d, got_i = sharded_cosine_scan_topk(
        jnp.asarray(q), sharded, mesh, k=50, max_distance=0.5, block_rows=512
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50, max_distance=0.5)
    check_topk_parity(got_d, got_i, exp_d, exp_i)
    gi = np.asarray(got_i)
    assert gi.max() < 3000  # padding never leaks


def test_sharded_exact_duplicate_found(mesh, rng):
    db = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=512)
    sharded = shard_semantic_index(idx, mesh)
    # Query = a row living on the LAST shard.
    target = 4000
    d, i = sharded_cosine_scan_topk(jnp.asarray(db[target]), sharded, mesh, k=3)
    assert int(np.asarray(i)[0]) == target or float(np.asarray(d)[0]) < 1e-6


def test_sharded_hamming_matches_oracle(mesh, rng):
    db = rng.integers(0, 256, size=(2048, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    idx = make_hamming_index(db, block_rows=256)  # 2048 = 8*256
    sharded = shard_hamming_index(idx, mesh)
    got_d, got_i = sharded_hamming_scan_topk(
        jnp.asarray(q), sharded, mesh, k=15, block_rows=256
    )
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=15)
    check_topk_parity(got_d, got_i, exp_d, exp_i)
