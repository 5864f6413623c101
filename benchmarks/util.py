"""Shared benchmark utilities: the on-device timing loop, index
builders, and synthetic datagens.

Timing methodology: host<->device roundtrips (or async-dispatch
semantics on tunneled platforms) can dominate or fabricate numbers, so
iterations run back-to-back ON DEVICE inside one jitted lax.scan over
distinct inputs, with a single tiny device->host fetch as the barrier.
The fetch costs one tunnel round-trip (~34 ms on the test attachment)
amortized over the iterations; the measured null-body floor is reported
by the runner as ``null_floor_ms_per_iter`` and nothing is subtracted.
"""

import time

import numpy as np

NORTH_STAR_DOTS_PER_SEC = 1e9
NORTH_STAR_INGEST_PER_SEC = 5e3


def device_loop(fn, inputs, iters, *consts):
    """Time `fn(x, *consts)` over `iters` stacked inputs entirely on device.

    ``fn`` may return a scalar or a small vector (e.g. [timing_sink,
    success_count]); the accumulator sums it across iterations and the
    whole accumulated value is returned alongside the per-iteration time.

    Large arrays (the index) MUST be passed via ``consts``, not closed
    over: closed-over device arrays are embedded as literal constants in
    the compiled program (hundreds of MB shipped per compile — remote
    compile services reject them outright).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def multi(xs, *cs):
        def body(c, x):
            return c + fn(x, *cs), None

        init = jnp.zeros(
            jax.eval_shape(fn, jax.tree.map(lambda a: a[0], xs), *cs).shape,
            jnp.float32,
        )
        acc, _ = jax.lax.scan(body, init, xs)
        return acc

    np.asarray(multi(inputs, *consts))  # warmup/compile
    t0 = time.perf_counter()
    sink = np.asarray(multi(inputs, *consts))
    dt = (time.perf_counter() - t0) / iters
    return dt, (float(sink) if sink.ndim == 0 else sink)


def build_semantic_index(n, d, rng, block_rows):
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import (
        PackedSemanticIndex,
        semantic_rows_from_u8,
    )

    n_pad = -(-n // block_rows) * block_rows
    db = rng.integers(0, 256, size=(n_pad, d), dtype=np.uint8)
    data, row_sum, row_mag2 = semantic_rows_from_u8(db)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    index = PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.asarray(valid),
    )
    return db[:n], index


def build_semantic_index_from_rows(db_u8, block_rows=2048):
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import (
        PackedSemanticIndex,
        semantic_rows_from_u8,
    )

    n = db_u8.shape[0]
    n_pad = -(-n // block_rows) * block_rows
    padded = np.zeros((n_pad, db_u8.shape[1]), dtype=np.uint8)
    padded[:n] = db_u8
    data, row_sum, row_mag2 = semantic_rows_from_u8(padded)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    return padded, PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.asarray(valid),
    )


def structured_embeddings(rng, n, d, q, n_clusters=256):
    """Structured latents shared by the recall benches: 256 clusters,
    decaying spectrum (anisotropic), tanh-bounded like the trained
    embedder head (train.py:30-46); queries are corruption-pair
    neighbors (noisy copies) of indexed items — the
    drag-drop-a-similar-photo workload.  Returns (db_u8 [n,d], q_u8
    [q,d])."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.quantize import quantize_embedding

    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    spectrum = (1.0 / np.sqrt(1.0 + np.arange(d))).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    z = centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    z = np.tanh(z * spectrum[None, :])
    db_u8 = np.asarray(quantize_embedding(jnp.asarray(z)))

    pick = rng.integers(0, n, size=q)
    zq = np.tanh(
        (centers[assign[pick]]
         + 0.35 * rng.standard_normal((q, d)).astype(np.float32)
         + 0.15 * rng.standard_normal((q, d)).astype(np.float32))
        * spectrum[None, :]
    )
    q_u8 = np.asarray(quantize_embedding(jnp.asarray(zq)))
    return db_u8, q_u8


def structured_embeddings_device(seed, n, d, q, n_clusters=256):
    """Device-generated twin of :func:`structured_embeddings` — same
    distribution (clustered anisotropic tanh latents, corruption-pair
    queries), different RNG stream, ZERO host-side randn (which measured
    151 s at 1M x 128 on the 1-core bench VM).  Returns device arrays
    (db_u8 [n, d], q_u8 [q, d])."""
    import jax
    import jax.numpy as jnp

    from pixelbox_tpu.ops.quantize import quantize_embedding

    key = jax.random.PRNGKey(seed)
    kc, ka, kn, kp, kq1, kq2 = jax.random.split(key, 6)
    centers = jax.random.normal(kc, (n_clusters, d), jnp.float32)
    spectrum = 1.0 / jnp.sqrt(1.0 + jnp.arange(d, dtype=jnp.float32))
    assign = jax.random.randint(ka, (n,), 0, n_clusters)

    # Chunked so the f32 latents never exceed ~256 MB of HBM at once.
    chunk = min(n, 512 * 1024)
    n_pad = -(-n // chunk) * chunk
    xs = (
        jnp.arange(n_pad // chunk, dtype=jnp.uint32),
        jnp.pad(assign, (0, n_pad - n)).reshape(-1, chunk),
    )

    def gen(_, x):
        i, a = x
        kz = jax.random.fold_in(kn, i)
        z = jnp.take(centers, a, axis=0) + 0.35 * jax.random.normal(
            kz, (chunk, d), jnp.float32
        )
        return None, quantize_embedding(jnp.tanh(z * spectrum[None, :]))

    _, parts = jax.lax.scan(gen, None, xs)
    db_u8 = parts.reshape(n_pad, d)[:n]

    pick = jax.random.randint(kp, (q,), 0, n)
    zq = (
        jnp.take(centers, jnp.take(assign, pick), axis=0)
        + 0.35 * jax.random.normal(kq1, (q, d), jnp.float32)
        + 0.15 * jax.random.normal(kq2, (q, d), jnp.float32)
    )
    q_u8 = quantize_embedding(jnp.tanh(zq * spectrum[None, :]))
    return db_u8, q_u8


def clustered_u8(rng, n, d, q, n_clusters=4096, chunk=2_000_000,
                 noise=18, q_noise=12):
    """Clustered u8 corpus at capacity scale (HOST fallback; the capacity
    row uses ops.ivf_build.device_clustered_corpus).  Integer cluster
    centers + integer noise, generated in chunks."""
    centers = rng.integers(0, 256, size=(n_clusters, d), dtype=np.int16)
    assign = rng.integers(0, n_clusters, size=n)
    db = np.empty((n, d), dtype=np.uint8)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        block = centers[assign[lo:hi]]
        block += rng.integers(-noise, noise + 1, size=(hi - lo, d),
                              dtype=np.int16)
        np.clip(block, 0, 255, out=block)
        db[lo:hi] = block.astype(np.uint8)
    pick = rng.integers(0, n, size=q)
    qs = centers[assign[pick]] + rng.integers(
        -q_noise, q_noise + 1, size=(q, d), dtype=np.int16
    )
    return db, np.clip(qs, 0, 255).astype(np.uint8)


def recall_at(got_i, exp_i, k):
    """Mean top-k overlap between two [Q, >=k] id arrays.

    −1 padding (fewer than k rows passed the filter) is EXCLUDED from
    both sides, and the denominator is the oracle's real hit count — a
    query where both sides pad with −1 must not count the shared
    sentinel as a match (it once inflated bounded-pool recalls)."""
    got_i = np.asarray(got_i)
    exp_i = np.asarray(exp_i)
    qn = got_i.shape[0]
    per_q = []
    for i in range(qn):
        want = {x for x in exp_i[i][:k] if x >= 0}
        have = {x for x in got_i[i][:k] if x >= 0}
        if not want:
            # The oracle found nothing under the filter; agreeing on
            # "nothing" is perfect recall, not zero.
            per_q.append(1.0)
        else:
            per_q.append(len(have & want) / len(want))
    return float(np.mean(per_q))


# Back-compat alias (the repo-root bench.py facade and older tests used
# the underscore name).
_device_loop = device_loop
