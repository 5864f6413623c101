"""BatchingScanService over an int4 index provider."""

import numpy as np

from pixelbox_tpu.ops.int4 import build_semantic4_index, cosine4a_scan_topk_np
from pixelbox_tpu.serving import BatchingScanService


def test_service_routes_int4_index(rng):
    db = rng.integers(0, 256, size=(2048, 32), dtype=np.uint8)
    index = build_semantic4_index(db, block_rows=1024)
    svc = BatchingScanService(lambda: index, k=10, max_distance=1e7)
    try:
        q = db[7]
        dist, idx = svc.submit(q)
        exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=10, max_distance=1e7)
        np.testing.assert_array_equal(idx, exp_i[0])
        np.testing.assert_array_equal(dist, exp_d[0])
        assert idx[0] == 7 and dist[0] < 0.01  # asym self-match: near-0
    finally:
        svc.close()
