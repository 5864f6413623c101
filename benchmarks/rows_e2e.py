"""End-to-end benchmark rows: embedding extraction, drag-drop query,
ingest pipeline + scaling, concurrent serving, BLIP text search, and the
offline trainer step (BASELINE configs 3-5 + SURVEY L0/L3)."""

import time

import numpy as np

from benchmarks.util import (
    NORTH_STAR_INGEST_PER_SEC,
    build_semantic_index,
    device_loop as _device_loop,
)


def bench_embedding(batch=64, iters=8, size=224, dim=128, rng=None):
    """Config 3: batched EfficientNet embedding extraction (images/s)."""
    import jax.numpy as jnp

    from pixelbox_tpu.models import get_embedder
    from pixelbox_tpu.ops.quantize import quantize_embedding

    rng = rng or np.random.default_rng(3)
    emb = get_embedder("efficientnet", dim=dim, input_size=size)
    xs = jnp.asarray(
        rng.uniform(0, 1, size=(iters, batch, size, size, 3)).astype(np.float32)
    )

    def one(x):
        z = emb.embed_preprocessed(x)
        return jnp.sum(quantize_embedding(z).astype(jnp.float32))

    dt, _ = _device_loop(one, xs, iters)
    return {
        "images_per_sec": batch / dt,
        "batch": batch,
        "input_size": size,
        "latent_dim": dim,
        "ms_per_batch": dt * 1e3,
        "vs_ingest_north_star": batch / dt / NORTH_STAR_INGEST_PER_SEC,
    }


def bench_e2e_dragdrop(n=1_000_000, d=128, iters=5, rng=None):
    """Config 4: end-to-end drag-drop query at 1M vectors:
    decode → preprocess → embed → quantize → top-k (wall clock)."""
    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pixelbox_tpu.models import get_embedder
    from pixelbox_tpu.ops.preprocess import preprocess_host
    from pixelbox_tpu.ops.quantize import quantize_embedding
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(4)
    _, index = build_semantic_index(n, d, rng, block_rows=2**17)
    emb = get_embedder("efficientnet", dim=d, input_size=224)

    # A realistic on-disk JPEG to decode each iteration.
    img = (rng.uniform(0, 255, size=(960, 1280, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    jpeg_bytes = buf.getvalue()

    def query_once(noise):
        t0 = time.perf_counter()
        decoded = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
        decoded = np.clip(decoded.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        pre = preprocess_host(decoded, 224)
        z = emb.embed_preprocessed(jnp.asarray(pre[None]))
        hq = quantize_embedding(z)
        dist, idx = cosine_scan_topk(hq[0], index, k=100, block_rows=2**17)
        _ = float(np.asarray(dist[0]))
        return time.perf_counter() - t0

    query_once(0)  # compile
    times = [query_once(i + 1) for i in range(iters)]
    return {
        "e2e_ms_median": float(np.median(times) * 1e3),
        "e2e_ms_best": float(np.min(times) * 1e3),
        "n": n,
    }


def bench_ingest(n_images=200, workers=8, rng=None):
    """Ingest pipeline end-to-end: crawl → decode → thumbnail/phash →
    device embed/quantize → append (images/s vs the 5k/s north star)."""
    import shutil
    import tempfile

    from PIL import Image

    from pixelbox_tpu.engine import Engine

    rng = rng or np.random.default_rng(6)
    tmp = tempfile.mkdtemp(prefix="pxbench_")
    try:
        photo_dir = f"{tmp}/photos"
        import os

        os.makedirs(photo_dir)
        warm_dir = f"{tmp}/warm"
        os.makedirs(warm_dir)
        base = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((1280, 960), Image.BILINEAR))
        for i in range(n_images):
            jig = np.clip(img.astype(np.int16) + int(i % 17) - 8, 0, 255).astype(
                np.uint8
            )
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=88)
        # Small warmup set: absorbs the embed-batch jit compile so the
        # timed run measures pipeline throughput, not compilation.
        for i in range(2):
            Image.fromarray(img).save(f"{warm_dir}/w{i}.jpg", quality=88)

        eng = Engine.new(
            f"{tmp}/bench.db", embedder="stub", embedder_kwargs={"dim": 128}
        )
        eng.add_tracked_folder(warm_dir)
        eng.start_indexing(num_workers=workers)
        eng.wait_for_indexing()
        eng.remove_tracked_folder(warm_dir)

        eng.add_tracked_folder(photo_dir)
        t0 = time.perf_counter()
        eng.start_indexing(num_workers=workers)
        eng.wait_for_indexing()
        dt = time.perf_counter() - t0
        count = eng.get_num_indexed_images() - 2
        eng.close()
        return {
            "images_per_sec": count / dt,
            "images": count,
            "workers": workers,
            "total_s": dt,
            "vs_ingest_north_star": count / dt / NORTH_STAR_INGEST_PER_SEC,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_ingest_scaling(n_images=120, workers=(1, 2, 4, 8), rng=None):
    """Measured (not extrapolated) ingest scaling: images/s vs decode
    workers on THIS host, plus the single-image host floor per stage.
    On a 1-core VM the worker curve shows contention behavior, not
    speedup — the per-core floor is the honest scaling basis and is
    reported alongside (PERF.md 'Host ingest stages')."""
    import io
    import os
    import shutil
    import tempfile

    from PIL import Image

    rng = rng or np.random.default_rng(6)
    out = {"host": {"nproc": os.cpu_count()}}

    # Single-image stage floor (measured on the bench image).
    base = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((1280, 960), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    data = buf.getvalue()

    from pixelbox_tpu.ingest.decode import decode_image_bytes
    from pixelbox_tpu.ingest.thumbnail import make_thumbnail, qoi_encode
    from pixelbox_tpu.ops import phash as phash_ops
    from pixelbox_tpu.ops.preprocess import fill_resize_u8_with_big

    def _t(fn, reps=5, inner=8):
        """min-of-reps over inner-averaged runs: the MIN is the robust
        floor estimator on a contended host (a single mean-of-40 swung
        ±25-40% between rounds and could hide a real 20% regression)."""
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                fn()
            best = min(best, (time.perf_counter() - t0) / inner)
        return best * 1e3

    dec = decode_image_bytes(data, "x.jpg", "/x.jpg")
    # The pipeline pays ONE full-res resample per image: the embed
    # frame's pre-crop cover image is re-used as the thumbnail source
    # (ingest/pipeline.py decode worker).  Stage set mirrors that.
    _, big = fill_resize_u8_with_big(dec.rgb, 224)
    t_thumb_shared = _t(lambda: make_thumbnail(dec.rgb, prescaled=big))
    thumb = make_thumbnail(dec.rgb, prescaled=big)
    stages = {
        "decode_exif_ms": _t(lambda: decode_image_bytes(data, "x.jpg", "/x.jpg")),
        "embed_frame_ms": _t(lambda: fill_resize_u8_with_big(dec.rgb, 224)),
        "thumbnail_from_frame_ms": t_thumb_shared,
        "qoi_ms": _t(lambda: qoi_encode(thumb)),
        "phash_compat_ms": _t(
            lambda: phash_ops.phash(dec.rgb, aspect_preserving=True)
        ),
    }
    stages["total_per_core_ms"] = sum(max(v, 0.0) for v in stages.values())
    # Turbo mode (phash on device from the embed frame) drops the host
    # phash stage entirely.
    stages["total_per_core_turbo_ms"] = (
        stages["total_per_core_ms"] - max(stages["phash_compat_ms"], 0.0)
    )
    out["stage_floor"] = stages
    out["per_core_images_per_sec"] = 1e3 / stages["total_per_core_ms"]
    out["cores_to_reach_north_star"] = (
        NORTH_STAR_INGEST_PER_SEC / out["per_core_images_per_sec"]
    )

    # Worker scaling curve (end-to-end pipeline, stub embedder).
    from pixelbox_tpu.engine import Engine

    tmp = tempfile.mkdtemp(prefix="pxscale_")
    try:
        photo_dir = f"{tmp}/photos"
        os.makedirs(photo_dir)
        for i in range(n_images):
            jig = np.clip(
                img.astype(np.int16) + int(i % 17) - 8, 0, 255
            ).astype(np.uint8)
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=88)
        curve = {}
        for w in workers:
            eng = Engine.new(
                f"{tmp}/scale_w{w}.db", embedder="stub",
                embedder_kwargs={"dim": 128},
            )
            eng.add_tracked_folder(photo_dir)
            # Warm the embed-batch compile on two images first.
            warm = f"{tmp}/warm{w}"
            os.makedirs(warm, exist_ok=True)
            for i in range(2):
                Image.fromarray(img).save(f"{warm}/w{i}.jpg", quality=88)
            eng.add_tracked_folder(warm)
            eng.start_indexing(num_workers=w)
            eng.wait_for_indexing()
            # Timed run over a fresh library (skip-check makes re-index a no-op).
            eng.close()
            eng = Engine.new(
                f"{tmp}/scale2_w{w}.db", embedder="stub",
                embedder_kwargs={"dim": 128},
            )
            eng.add_tracked_folder(photo_dir)
            t0 = time.perf_counter()
            eng.start_indexing(num_workers=w)
            eng.wait_for_indexing()
            dt = time.perf_counter() - t0
            count = eng.get_num_indexed_images()
            eng.close()
            curve[str(w)] = {
                "images_per_sec": count / dt,
                "images": count,
                "total_s": dt,
            }
        out["workers_curve"] = curve
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_serve_e2e(n_images=300, clients=8, reqs_per_client=6, rng=None):
    """End-to-end serving: HTTP upload → decode → embed → batched scan →
    catalog assembly → JSON, with CONCURRENT clients through the
    BatchingScanService.  This is the user-visible query metric (the
    device-scan qps elsewhere excludes result assembly and HTTP)."""
    import http.client
    import io
    import os
    import shutil
    import tempfile
    import threading

    from PIL import Image

    from pixelbox_tpu.engine import Engine
    from pixelbox_tpu.serve import make_handler
    from pixelbox_tpu.serving import BatchingScanService

    rng = rng or np.random.default_rng(11)
    tmp = tempfile.mkdtemp(prefix="pxserve_")
    server = None
    svc = None
    try:
        photo_dir = f"{tmp}/photos"
        os.makedirs(photo_dir)
        base = rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((640, 480), Image.BILINEAR))
        for i in range(n_images):
            jig = np.clip(img.astype(np.int16) + int(i % 13) - 6, 0, 255).astype(
                np.uint8
            )
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=85)
        eng = Engine.new(
            f"{tmp}/serve.db", embedder="stub", embedder_kwargs={"dim": 128}
        )
        eng.add_tracked_folder(photo_dir)
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()

        from http.server import ThreadingHTTPServer

        lock = threading.Lock()
        svc = BatchingScanService(
            lambda: eng._sem_store.device_index,
            k=eng.max_search_results,
            max_distance=eng.max_distance_from_query,
        )
        eng.attach_scan_service(svc)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(eng, lock, svc)
        )
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        jpeg = buf.getvalue()

        # Warm the scan compile with one request.
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/api/similar", body=jpeg)
        c.getresponse().read()
        c.close()

        lat = []
        lat_lock = threading.Lock()

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            for _ in range(reqs_per_client):
                t0 = time.perf_counter()
                conn.request("POST", "/api/similar", body=jpeg)
                r = conn.getresponse()
                body = r.read()
                assert r.status == 200, body[:200]
                with lat_lock:
                    lat.append(time.perf_counter() - t0)
            conn.close()

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        total = clients * reqs_per_client

        # Text-search path (filename query through the catalog).
        t1 = time.perf_counter()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for _ in range(10):
            conn.request("GET", "/api/search?q=img")
            conn.getresponse().read()
        search_ms = (time.perf_counter() - t1) / 10 * 1e3
        conn.close()

        return {
            "serve_e2e_qps": total / wall,
            "e2e_latency_ms_median": float(np.median(lat) * 1e3),
            "e2e_latency_ms_p90": float(np.quantile(lat, 0.9) * 1e3),
            "clients": clients,
            "requests": total,
            "scan_batches": svc.batches_run,
            "scan_queries": svc.queries_served,
            "indexed_images": eng.get_num_indexed_images(),
            "text_search_ms": search_ms,
        }
    finally:
        if server is not None:
            server.shutdown()
        if svc is not None:
            svc.close()
        shutil.rmtree(tmp, ignore_errors=True)


def bench_blip_text(n=1_000_000, iters=8, q=32, rng=None):
    """Config 5: BLIP text→image search (text embed + 1M×256 scan)."""
    import jax.numpy as jnp

    from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(5)
    searcher = BlipSearcher(cfg=BlipConfig(), max_text_len=32)
    d = searcher.dim
    _, index = build_semantic_index(n, d, rng, block_rows=2**16)

    texts = ["a photo of a %s on a %s" % (a, b)
             for a in ("cat", "dog", "car", "tree")
             for b in ("beach", "street", "table", "hill")][:q]
    q = len(texts)
    t0 = time.perf_counter()
    hashes = searcher.text_hashes(texts)  # includes compile
    compile_and_embed_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    hashes = searcher.text_hashes(texts)
    text_embed_s = time.perf_counter() - t0

    qs = jnp.asarray(np.broadcast_to(hashes, (iters, q, d)).copy())

    # Measure the path the engine actually serves text: queries on — the
    # guaranteed-exact auto threshold scan with cached θ-sample/meta
    # (engine._query_text_filtered), falling back to the direct exact
    # scan off-TPU.
    from pixelbox_tpu.ops.scan import (
        _default_backend_is_tpu,
        build_scan_sample,
    )

    if _default_backend_is_tpu() and d % 128 == 0:
        from pixelbox_tpu.ops.pallas_scan import (
            build_row_meta,
            pallas_threshold_scan_topk_v2,
        )

        sample = build_scan_sample(index)
        meta = build_row_meta(index)

        def one(qi, index, meta, sample):
            dist, idx, exact = pallas_threshold_scan_topk_v2(
                qi, index, meta, sample, k=100, max_distance=np.inf
            )
            return jnp.sum(dist[:, 0]) + jnp.sum(exact.astype(jnp.float32))

        dt, _ = _device_loop(one, qs, iters, index, meta, sample)
        scan_path = "pallas_threshold_auto"
    else:
        def one(qi, index):
            dist, idx = cosine_scan_topk(qi, index, k=100, block_rows=2**16)
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

        dt, _ = _device_loop(one, qs, iters, index)
        scan_path = "xla_exact"
    return {
        "text_embed_ms_per_batch": text_embed_s * 1e3,
        "texts_per_sec": q / text_embed_s,
        "scan_qps": q / dt,
        "scan_path": scan_path,
        "n": n,
        "proj_dim": d,
        "first_call_s": compile_and_embed_s,
    }


def bench_train_step(iters=20, rng=None):
    """Offline-trainer throughput (SURVEY L0): one contrastive step =
    EfficientNet-B0 forward×2 + backward + Adam (training/train.py,
    mirroring /root/reference/resources/train.py:118-160).  Reported as
    images/sec/chip at the reference's shipped config (latent 8, 224²,
    batch 32, f32 — train.py:178-191) and at a TPU-native config
    (batch 256, bf16 compute on the MXU)."""
    import jax
    import jax.numpy as jnp

    from pixelbox_tpu.parallel.mesh import make_mesh
    from pixelbox_tpu.training.train import (
        TrainConfig,
        init_train_state,
        make_sharded_train_step,
    )

    rng = rng or np.random.default_rng(5)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, axis_names=("data", "model"), shape=(n_dev, 1))
    out = {}
    for name, cfg in (
        ("ref_b32_f32", TrainConfig(latent_dim=8, batch_size=32)),
        (
            "tpu_b256_bf16",
            TrainConfig(latent_dim=8, batch_size=256, dtype=jnp.bfloat16),
        ),
    ):
        state = init_train_state(cfg, mesh)
        step = make_sharded_train_step(cfg, mesh)
        b = cfg.batch_size
        shape = (b, cfg.input_size, cfg.input_size, 3)
        left = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        right = jnp.asarray(
            np.clip(
                np.asarray(left) + rng.normal(0, 0.05, shape), 0, 1
            ).astype(np.float32)
        )
        labels = jnp.asarray(
            np.where(rng.uniform(size=b) < 0.5, 1.0, -1.0).astype(np.float32)
        )
        t0 = time.perf_counter()
        state, loss = step(state, left, right, labels)  # compile
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, left, right, labels)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        out[f"train_{name}_images_per_s"] = 2 * b / dt  # a pair = 2 images
        out[f"train_{name}_step_ms"] = dt * 1e3
        out[f"train_{name}_first_call_s"] = compile_s
        out[f"train_{name}_loss_finite"] = bool(
            np.isfinite(np.asarray(loss, dtype=np.float32))
        )
    return out

