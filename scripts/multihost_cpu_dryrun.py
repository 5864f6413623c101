"""Multi-host (DCN) dryrun on CPU: 2 processes × 4 virtual devices.

Executes the comm-backend path SURVEY §5 names (jax.distributed +
cross-host collectives) without TPU hardware: every mesh artifact in the
repo otherwise runs single-process.  Checks, on a REAL 2-process gloo
mesh, that the sharded scan, delta-append, and sharded-IVF probe return
results oracle-equal to the single-process numpy reference:

    python scripts/multihost_cpu_dryrun.py            # launcher
    python scripts/multihost_cpu_dryrun.py --proc I   # worker (internal)

The launcher spawns both workers, requires rc==0 and the MULTIHOST_OK
line from each.  tests/test_multihost_cpu.py drives it under pytest.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
LOCAL_DEVICES = 4
# Workers read the port the launcher chose (ephemeral by default —
# see _pick_port); 9723 only applies when a worker is run by hand.
PORT = int(os.environ.get("PIXELBOX_MH_PORT", "9723"))


def worker(proc_id: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES} "
        "--xla_cpu_enable_fast_math=false"
    )
    sys.path.insert(0, _REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pixelbox_tpu.parallel.distributed import init_distributed

    init_distributed(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=proc_id,
    )
    assert jax.process_count() == NPROC, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == NPROC * LOCAL_DEVICES, n_dev
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops.oracle import cosine_scan_topk_np
    from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8
    from pixelbox_tpu.parallel.sharded_ivf import (
        build_sharded_ivf,
        sharded_ivf_scan_topk,
    )
    from pixelbox_tpu.parallel.sharded_scan import (
        append_to_sharded_index,
        shard_semantic_index,
        sharded_cosine_scan_topk,
    )

    mesh = Mesh(np.array(jax.devices()).reshape(n_dev), ("data",))

    # Deterministic inputs: every process derives the same data, so the
    # single-process numpy oracle is computable locally on each.
    rng = np.random.default_rng(123)
    n, d, q, k = 4096, 32, 5, 10
    rows = rng.integers(0, 256, size=(n, d), dtype=np.uint8)
    queries = rng.integers(0, 256, size=(q, d), dtype=np.uint8)
    valid = np.ones(n, dtype=bool)
    valid[100:140] = False  # tombstones must not resurface

    data, rsum, rmag2 = semantic_rows_from_u8(rows)
    host_index = PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(rsum), jnp.asarray(rmag2),
        jnp.asarray(valid),
    )
    sharded = shard_semantic_index(host_index, mesh)

    def oracle(rows_np, valid_np):
        masked = rows_np[valid_np]
        ids = np.flatnonzero(valid_np)
        dd, ii = cosine_scan_topk_np(queries, masked, k=k)
        ii = np.where(ii >= 0, ids[np.maximum(ii, 0)], -1)
        return dd, ii

    # 1) Sharded exact scan == oracle.
    got_d, got_i = sharded_cosine_scan_topk(
        jnp.asarray(queries), sharded, mesh, k=k
    )
    exp_d, exp_i = oracle(rows, valid)
    np.testing.assert_array_equal(np.asarray(got_i), exp_i)
    np.testing.assert_allclose(np.asarray(got_d), exp_d, rtol=0, atol=2e-5)
    print(f"proc {proc_id}: sharded scan OK", flush=True)

    # 2) Delta-append into the live sharded mirror, then rescan.
    delta = rng.integers(0, 256, size=(64, d), dtype=np.uint8)
    start = 2048  # overwrite a padded hole: rows[2048:2112] become delta
    rows2 = rows.copy()
    rows2[start : start + 64] = delta
    valid2 = valid.copy()
    valid2[start : start + 64] = True
    sharded = append_to_sharded_index(
        sharded, delta, np.ones(64, dtype=bool), start
    )
    got_d, got_i = sharded_cosine_scan_topk(
        jnp.asarray(queries), sharded, mesh, k=k
    )
    exp_d, exp_i = oracle(rows2, valid2)
    np.testing.assert_array_equal(np.asarray(got_i), exp_i)
    np.testing.assert_allclose(np.asarray(got_d), exp_d, rtol=0, atol=2e-5)
    print(f"proc {proc_id}: delta-append OK", flush=True)

    # 3) Sharded IVF with full probe coverage == exact oracle.
    cents = ivf_ops.spherical_kmeans(rows2, valid2, 8, iters=4, seed=0)
    sivf, _ = build_sharded_ivf(rows2, valid2, cents, mesh, bucket_cap=256)
    got_d, got_i = sharded_ivf_scan_topk(
        queries, sivf, mesh, k=k, nprobe=8
    )
    np.testing.assert_array_equal(np.asarray(got_i), exp_i)
    np.testing.assert_allclose(np.asarray(got_d), exp_d, rtol=0, atol=2e-5)
    print(f"proc {proc_id}: sharded ivf OK", flush=True)

    print(f"MULTIHOST_OK proc={proc_id} devices={n_dev} "
          f"processes={jax.process_count()}", flush=True)


def _pick_port() -> int:
    """Ephemeral coordinator port: a fixed constant collides when two
    suite runs share a host or a stale worker survives a killed run
    (ADVICE r4) — bind port 0, let the OS choose, release, and hand the
    number to the workers via env."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launcher() -> int:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PIXELBOX_MH_PORT"] = str(
        int(os.environ.get("PIXELBOX_MH_PORT", 0)) or _pick_port()
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(NPROC)
    ]
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out = (p.communicate()[0] or "") + "\n<timeout>"
        if p.returncode != 0 or f"MULTIHOST_OK proc={i}" not in out:
            ok = False
            print(f"--- proc {i} FAILED (rc={p.returncode}) ---")
            print(out[-4000:])
        else:
            print(f"proc {i}: ok")
    print("MULTIHOST_DRYRUN", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--proc" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--proc") + 1]))
    else:
        sys.exit(launcher())
