"""pixelbox-tpu CLI — the library's operational surface.

The reference ships an egui desktop GUI (src/main.rs, src/ui/*); the
TPU-native build is a server-side framework, so the equivalent surface is
this CLI (plus the web UI in ``pixelbox_tpu.serve``).  Subcommands map to
the GUI's capabilities:

    init <db>                      — "New DB" (menutabs.rs:11-19)
    add-folder/remove-folder/folders — folders panel (folders.rs:26-41)
    index <db>                     — "Reindex" button (folders.rs:60-62)
    watch <db>                     — index + auto-index new files (roadmap)
    search <db> <query...>         — search panel text query (search.rs:40-49)
    similar <db> <image>           — drag-and-drop / "Search for similar"
    similar-id <db> <id>           — per-result find-similar by stored hash
    face-similar <db> <image>      — face search (roadmap; also face: queries)
    faces <db> <id> / index-faces  — stored face boxes / backfill detection
    phash-similar <db> <image>     — near-duplicate search
    duplicates <db>                — whole-index near-duplicate pairs/groups
    tag/untag <db> <id> <name>     — editable tags (roadmap)
    show <db> <id>                 — view panel metadata (view.rs:14-78)
    stats <db>                     — settings/status surfaces
    serve <db>                     — thin web UI
    train / finalize               — offline trainer + deployable export

Perf harness: ``python bench.py`` at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys


def _open_engine(args, create=False):
    from pixelbox_tpu.engine import Engine

    kwargs = {}
    if getattr(args, "embedder", None):
        kwargs["embedder"] = args.embedder
    if getattr(args, "dim", None):
        kwargs["dim"] = args.dim
    if getattr(args, "model", None):
        ek = kwargs.setdefault("embedder_kwargs", {})
        if getattr(args, "embedder", None) in (None, "efficientnet", "nomic"):
            # These embedders take checkpoint_path (nomic routes its
            # .onnx through the graph interpreter); 'onnx' takes model=.
            ek["checkpoint_path"] = args.model
        else:
            ek["model"] = args.model
    if getattr(args, "blip", False):
        kwargs["blip"] = True
    if getattr(args, "ocr", False):
        kwargs["ocr"] = True
    if getattr(args, "precision", None):
        kwargs["semantic_precision"] = args.precision
    if getattr(args, "no_int4_rerank", False):
        kwargs["int4_rerank"] = False
    if getattr(args, "faces", False):
        kwargs["faces"] = True
    if getattr(args, "face_onnx", None):
        kwargs["face_detector_kwargs"] = {"onnx_path": args.face_onnx}
    if getattr(args, "scan_mode", None):
        pass  # applied post-construction below
    eng = Engine(args.db, create=create, **kwargs)
    if getattr(args, "scan_mode", None):
        eng.scan_mode = args.scan_mode
    if getattr(args, "nprobe", None):
        eng.ivf_nprobe = int(args.nprobe)
    if getattr(args, "ivf_target_recall", None):
        eng.ivf_target_recall = float(args.ivf_target_recall)
    if getattr(args, "ivf_clusters", None):
        eng.ivf_clusters = int(args.ivf_clusters)
    return eng


def _print_results(engine, as_json=False):
    results = engine.get_query_results() or []
    if as_json:
        print(
            json.dumps(
                [
                    {
                        "id": r.id,
                        "filename": r.filename,
                        "path": r.path,
                        "resolution": list(r.resolution),
                        "distance": r.distance_from_query,
                        "tags": r.tags,
                    }
                    for r in results
                ],
                indent=2,
            )
        )
        return
    for r in results:
        dist = "" if r.distance_from_query is None else f"  dist={r.distance_from_query:.6f}"
        # Similarity display matches the search panel: 1/(1+dist)
        # (reference src/ui/search.rs:91).
        sim = (
            ""
            if r.distance_from_query is None
            else f"  sim={1.0 / (1.0 + r.distance_from_query):.4f}"
        )
        print(f"{r.id:6d}  {r.path}{dist}{sim}")
    print(f"{len(results)} results", file=sys.stderr)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pixelbox-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_db_cmd(name, **kw):
        sp = sub.add_parser(name, **kw)
        sp.add_argument("db", help="catalog database path")
        sp.add_argument(
            "--embedder", default=None,
            help="stub|efficientnet|onnx|nomic|none ('none' = tags-only "
            "mode: index without semantic hashes, similarity search "
            "disabled; 'onnx' runs an arbitrary user .onnx via --model). "
            "The choice persists in the library: later commands restore "
            "it automatically; explicit flags override.",
        )
        sp.add_argument("--dim", type=int, default=None, help="embedding width")
        sp.add_argument(
            "--model", default=None,
            help="path to a user .onnx model (embedder=onnx, or an "
            "image_similarity.onnx for embedder=efficientnet) - the "
            "reference's user-moddable model drop-in (README.md:51-59)",
        )
        sp.add_argument(
            "--blip", action="store_true",
            help="enable the BLIP text->image index (text: queries)",
        )
        sp.add_argument(
            "--ocr", action="store_true",
            help="extract machine-rendered text at index time "
            "(searchable via the ocr: operator; classical template OCR "
            "- screenshots/scans, not photographic text)",
        )
        sp.add_argument(
            "--scan-mode", dest="scan_mode", default=None,
            choices=("auto", "exact", "fast", "pallas", "ivf"),
            help="similarity scan mode (default auto: verified-exact; "
            "ivf = clustered ANN — approximate selection over the "
            "--nprobe nearest clusters, exact distances; composes with "
            "--precision int4: half-byte buckets + exact-u8 rerank)",
        )
        sp.add_argument(
            "--nprobe", type=int, default=None,
            help="ivf mode: clusters probed per query (default: "
            "recall-governed — 2%% of clusters, floor 8; higher = "
            "better recall, slower)",
        )
        sp.add_argument(
            "--ivf-target-recall", dest="ivf_target_recall", type=float,
            default=None,
            help="ivf mode: MEASURE nprobe instead of the 2%% policy — "
            "tune on held-out noisy copies of indexed rows until "
            "recall@10 vs the exact scan meets this target (e.g. 0.99); "
            "--nprobe overrides",
        )
        sp.add_argument(
            "--ivf-clusters", dest="ivf_clusters", type=int, default=None,
            help="ivf mode: k-means cluster count (default ~4*sqrt(N))",
        )
        sp.add_argument(
            "--precision", default=None, choices=("int8", "int4"),
            help="semantic index precision: int4 packs 2x rows per chip "
            "(catalog keeps full u8 hashes). Queries retrieve top-C "
            "candidates from the int4 index and rescore them with the "
            "EXACT u8 metric from the host mirror - measured recall@10 "
            "vs the full u8 scan is 1.0 (recall@100 ~0.999) on the "
            "structured bench (bench.py int4_scan recall_at_10_vs_u8), "
            "and reported distances are true u8 values. Persisted in "
            "the library; later commands inherit it.",
        )
        sp.add_argument(
            "--no-int4-rerank", action="store_true",
            help="skip the exact-u8 rescoring of int4 candidates "
            "(raw asymmetric int4-metric results; recall@10 ~0.5)",
        )
        sp.add_argument(
            "--faces", action="store_true",
            help="detect + embed faces at index time (face: queries, "
            "face-similar). Built-in classical frontal-face detector; "
            "persisted in the library like --precision. Reference "
            "roadmap 'Face search'",
        )
        sp.add_argument(
            "--face-onnx", default=None, metavar="DETECTOR.onnx",
            help="run a user ONNX face detector instead of the built-in "
            "(UltraFace-convention outputs; executed by the JAX graph "
            "interpreter).  Persisted in the library like --faces so "
            "query-time detection matches index-time; pass 'builtin' "
            "to clear",
        )
        return sp

    add_db_cmd("init", help="create a new library database")

    sp = add_db_cmd("add-folder", help="track a folder for indexing")
    sp.add_argument("folder")
    sp = add_db_cmd("remove-folder", help="stop tracking a folder")
    sp.add_argument("folder")
    sp.add_argument(
        "--purge", action="store_true",
        help="ALSO remove every indexed image under the folder (the "
        "reference stages this as a TODO, engine.rs:414)",
    )

    sp = add_db_cmd("remove-image", help="remove one image from the index")
    sp.add_argument("id", type=int)

    add_db_cmd(
        "compact",
        help="drop tombstoned rows from the device stores after removals",
    )
    add_db_cmd("folders", help="list tracked folders")

    sp = add_db_cmd("index", help="crawl tracked folders and index new images")
    sp.add_argument("--workers", type=int, default=None)

    sp = add_db_cmd(
        "watch",
        help="index once, then keep watching tracked folders for new "
        "images until interrupted (reference roadmap 'Watched "
        "directories')",
    )
    sp.add_argument("--workers", type=int, default=None)
    sp.add_argument("--interval", type=float, default=30.0,
                    help="poll interval in seconds")

    sp = add_db_cmd("tag", help="set a user tag on an indexed image")
    sp.add_argument("id", type=int)
    sp.add_argument("name")
    sp.add_argument("value", nargs="?", default="")
    sp = add_db_cmd("untag", help="remove a tag from an indexed image")
    sp.add_argument("id", type=int)
    sp.add_argument("name")

    sp = add_db_cmd(
        "search",
        help="text query (supports similar:/face:/text:/ocr:/tag:/exif:/all:)",
    )
    sp.add_argument("query", nargs="+")
    sp.add_argument("--json", action="store_true")
    sp.add_argument("--limit", type=int, default=100)

    sp = add_db_cmd("similar", help="find images similar to a file")
    sp.add_argument("image")
    sp.add_argument("--json", action="store_true")
    sp.add_argument("--limit", type=int, default=100)
    sp.add_argument("--max-distance", type=float, default=1e3)

    sp = add_db_cmd(
        "similar-id", help="find images similar to an INDEXED image "
        "(uses its stored hash — no re-decode)"
    )
    sp.add_argument("id", type=int)
    sp.add_argument("--json", action="store_true")
    sp.add_argument("--limit", type=int, default=100)
    sp.add_argument("--max-distance", type=float, default=1e3)

    sp = add_db_cmd(
        "face-similar",
        help="find images whose FACES match the largest face in a file "
        "(reference roadmap 'Face search'; also: search 'face:<path>')",
    )
    sp.add_argument("image")
    sp.add_argument("--json", action="store_true")
    sp.add_argument("--limit", type=int, default=100)
    sp.add_argument("--max-distance", type=float, default=1e3)

    sp = add_db_cmd("faces", help="list stored face boxes for an image")
    sp.add_argument("id", type=int)

    sp = add_db_cmd(
        "index-faces",
        help="backfill face detection/embeddings for images indexed "
        "without --faces (turns the mode on for the library)",
    )

    sp = add_db_cmd(
        "phash-similar", help="find near-duplicates by perceptual hash"
    )
    sp.add_argument("image")
    sp.add_argument("--json", action="store_true")
    sp.add_argument("--limit", type=int, default=100)
    sp.add_argument("--max-distance", type=float, default=1e3)

    sp = add_db_cmd(
        "duplicates",
        help="find near-duplicate image pairs across the whole index "
        "(batched device self-scan)",
    )
    sp.add_argument("--by", default="phash", choices=("phash", "semantic"))
    sp.add_argument(
        "--max-distance", type=float, default=None,
        help="strict distance cutoff (default: 0.1 hamming for phash, "
        "0.05 reciprocal-cosine for semantic)",
    )
    sp.add_argument("--k", type=int, default=8,
                    help="max neighbors considered per image")
    sp.add_argument("--groups", action="store_true",
                    help="print transitive duplicate GROUPS instead of pairs")
    sp.add_argument("--json", action="store_true")

    sp = add_db_cmd("show", help="show one indexed image's metadata")
    sp.add_argument("id", type=int)

    add_db_cmd("stats", help="index statistics")

    sp = add_db_cmd("serve", help="serve the thin web UI")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8333)
    sp.add_argument(
        "--no-batching", action="store_true",
        help="disable micro-batched query coalescing",
    )

    sp = sub.add_parser(
        "train", help="train the contrastive embedder (reference train.py port)"
    )
    sp.add_argument("data_dir", help="folder of training images")
    sp.add_argument("--latent", type=int, default=8)
    sp.add_argument("--input-size", type=int, default=224)
    sp.add_argument("--epochs", type=int, default=10)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--checkpoint-dir", default="checkpoints")
    sp.add_argument("--steps-per-epoch", type=int, default=None)
    sp.add_argument(
        "--finalize-dir", default=None,
        help="after training, write the deployable bundle (model.npz + "
        "image_similarity.onnx + model.json) here",
    )
    sp.add_argument(
        "--resume", default=None, metavar="STATE_DIR",
        help="resume from a checkpoint-dir/state directory (restores "
        "params AND optimizer state)",
    )
    sp.add_argument(
        "--bf16", action="store_true",
        help="run the backbone in bfloat16 (~2x MXU training throughput "
        "on TPU; the head/loss stay f32 and optimizer state is f32, so "
        "checkpoints and the deployable export are f32 either way)",
    )

    sp = sub.add_parser(
        "finalize",
        help="export a trained checkpoint as the deployable bundle "
        "(image_similarity.onnx, reference train.py:167-174)",
    )
    sp.add_argument("checkpoint", help="checkpoint .npz from train")
    sp.add_argument("out_dir")
    sp.add_argument("--input-size", type=int, default=224)

    args = p.parse_args(argv)

    from pixelbox_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    if args.cmd == "train":
        from pixelbox_tpu.ingest.crawler import crawl
        from pixelbox_tpu.parallel.mesh import make_mesh
        from pixelbox_tpu.training.train import TrainConfig, finalize, train_loop

        import jax

        paths = list(crawl([args.data_dir]))
        if not paths:
            print(f"error: no images under {args.data_dir}", file=sys.stderr)
            return 1
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, axis_names=("data", "model"), shape=(n_dev, 1))
        import jax.numpy as jnp

        cfg = TrainConfig(
            latent_dim=args.latent,
            input_size=args.input_size,
            batch_size=args.batch_size,
            lr=args.lr,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        state, _ = train_loop(
            paths, cfg, mesh,
            epochs=args.epochs,
            steps_per_epoch=args.steps_per_epoch,
            checkpoint_dir=args.checkpoint_dir,
            resume_from=args.resume,
        )
        if args.finalize_dir:
            out = finalize(state, args.finalize_dir, cfg)
            print(f"Deployable bundle written to {out}")
        return 0

    if args.cmd == "finalize":
        from pixelbox_tpu.models.efficientnet import load_params
        from pixelbox_tpu.training.train import TrainConfig, finalize

        variables = load_params(args.checkpoint)
        latent = int(variables["params"]["linear"]["bias"].shape[0])
        out = finalize(
            variables, args.out_dir,
            TrainConfig(latent_dim=latent, input_size=args.input_size),
        )
        print(f"Deployable bundle written to {out}")
        return 0

    if args.cmd == "init":
        engine = _open_engine(args, create=True)
        print(f"Created library at {args.db}")
        engine.close()
        return 0

    engine = _open_engine(args)
    try:
        if args.cmd == "add-folder":
            engine.add_tracked_folder(args.folder)
            print(f"Tracking {args.folder}")
        elif args.cmd == "remove-folder":
            if args.purge:
                n = engine.remove_tracked_folder_and_images(args.folder)
                print(f"Stopped tracking {args.folder}; removed {n} images")
            else:
                engine.remove_tracked_folder(args.folder)
                print(f"Stopped tracking {args.folder}")
        elif args.cmd == "remove-image":
            if engine.remove_image(args.id):
                print(f"Removed image {args.id}")
            else:
                print(f"No image with id {args.id}", file=sys.stderr)
                return 1
        elif args.cmd == "compact":
            engine.compact()
            print("Compacted device stores")
        elif args.cmd == "folders":
            for f in engine.get_tracked_folders():
                print(f)
        elif args.cmd == "index":
            engine.start_indexing(num_workers=args.workers)
            engine.wait_for_indexing()
            pl = engine._pipeline
            print(f"Indexed images: {engine.get_num_indexed_images()}")
        elif args.cmd == "watch":
            engine.start_indexing(num_workers=args.workers)
            engine.wait_for_indexing()
            print(f"Indexed images: {engine.get_num_indexed_images()}")
            engine.watch(interval_s=args.interval, num_workers=args.workers)
            print(
                f"Watching {len(engine.get_tracked_folders())} folder(s) "
                f"every {args.interval:g}s — Ctrl-C to stop."
            )
            try:
                import time as _time

                while True:
                    _time.sleep(3600)
            except KeyboardInterrupt:
                pass
        elif args.cmd == "tag":
            if engine.set_tag(args.id, args.name, args.value):
                print(f"Tagged {args.id}: {args.name}={args.value!r}")
            else:
                print(f"No image with id {args.id}", file=sys.stderr)
                return 1
        elif args.cmd == "untag":
            if engine.remove_tag(args.id, args.name):
                print(f"Untagged {args.id}: {args.name}")
            else:
                print(
                    f"No tag {args.name!r} on image {args.id}", file=sys.stderr
                )
                return 1
        elif args.cmd == "search":
            from pixelbox_tpu.query import QueryTokenizeError

            engine.max_search_results = args.limit
            try:
                engine.query(" ".join(args.query))
            except QueryTokenizeError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            if engine.last_query_error:
                # Non-fatal (e.g. similar: in tags-only mode — filtered
                # results still valid, ordering degraded).
                print(f"warning: {engine.last_query_error}", file=sys.stderr)
            _print_results(engine, as_json=args.json)
        elif args.cmd == "similar":
            engine.max_search_results = args.limit
            engine.max_distance_from_query = args.max_distance
            engine.query_by_image_hash_from_file(args.image)
            if engine.last_query_error:
                print(f"error: {engine.last_query_error}", file=sys.stderr)
                return 1
            _print_results(engine, as_json=args.json)
        elif args.cmd == "similar-id":
            engine.max_search_results = args.limit
            engine.max_distance_from_query = args.max_distance
            engine.query_by_image_hash_from_id(args.id)
            if engine.last_query_error:
                print(f"error: {engine.last_query_error}", file=sys.stderr)
                return 1
            _print_results(engine, as_json=args.json)
        elif args.cmd == "face-similar":
            engine.max_search_results = args.limit
            engine.max_distance_from_query = args.max_distance
            engine.query_by_face_from_file(args.image)
            if engine.last_query_error:
                print(f"error: {engine.last_query_error}", file=sys.stderr)
                return 1
            _print_results(engine, as_json=args.json)
        elif args.cmd == "faces":
            if engine.catalog.get_image(args.id) is None:
                print(f"No image with id {args.id}", file=sys.stderr)
                return 1
            print(json.dumps(engine.get_faces(args.id), indent=2))
        elif args.cmd == "index-faces":
            try:
                n = engine.index_faces()
            except RuntimeError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            print(f"Indexed faces: {n}")
        elif args.cmd == "phash-similar":
            from pixelbox_tpu.ingest.decode import decode_image_file
            from pixelbox_tpu.ops.phash import phash as phash_fn

            decoded = decode_image_file(args.image)
            if decoded is None:
                print(f"error: cannot decode image: {args.image}", file=sys.stderr)
                return 1
            engine.max_search_results = args.limit
            engine.max_distance_from_query = args.max_distance
            engine.query_by_phash(
                phash_fn(decoded.rgb, aspect_preserving=engine.phash_compat)
            )
            _print_results(engine, as_json=args.json)
        elif args.cmd == "duplicates":
            md = args.max_distance
            if md is None:
                md = 0.1 if args.by == "phash" else 0.05
            if args.groups:
                groups = engine.find_duplicate_groups(
                    max_distance=md, k=args.k, by=args.by
                )
                if args.json:
                    print(json.dumps(groups, indent=2))
                else:
                    for g in groups:
                        print("group:")
                        for i in g:
                            info = engine.catalog.get_image(i)
                            print(f"  {i}  {info['path'] if info else '?'}")
                    print(f"{len(groups)} duplicate groups", file=sys.stderr)
                return 0
            pairs = engine.find_duplicate_pairs(
                max_distance=md, k=args.k, by=args.by
            )
            if args.json:
                print(
                    json.dumps(
                        [
                            {"a": a, "b": b, "distance": d}
                            for a, b, d in pairs
                        ],
                        indent=2,
                    )
                )
            else:
                for a, b, d in pairs:
                    ia = engine.catalog.get_image(a)
                    ib = engine.catalog.get_image(b)
                    print(
                        f"dist={d:.6f}  {a}:{ia['path'] if ia else '?'}"
                        f"  <->  {b}:{ib['path'] if ib else '?'}"
                    )
                print(f"{len(pairs)} near-duplicate pairs", file=sys.stderr)
        elif args.cmd == "show":
            info = engine.catalog.get_image(args.id)
            if info is None:
                print(f"No image with id {args.id}", file=sys.stderr)
                return 1
            info["tags"] = engine.catalog.get_tags(args.id)
            info["thumbnail"] = (
                f"<{len(info['thumbnail'])} bytes QOI>" if info["thumbnail"] else None
            )
            print(json.dumps(info, indent=2))
        elif args.cmd == "stats":
            from pixelbox_tpu.utils.timing import get_stats

            n = engine.get_num_indexed_images()
            print(
                json.dumps(
                    {
                        "images": n,
                        "tracked_folders": engine.get_tracked_folders(),
                        "semantic_dim": (
                            engine._sem_store.dim if engine._sem_store else None
                        ),
                        "semantic_precision": engine.semantic_precision,
                        "embedder": engine._embedder_name,
                        "blip_enabled": engine._blip_enabled,
                        "ocr_enabled": engine.ocr_enabled,
                        "phash_compat": engine.phash_compat,
                        "phash_dim": engine._ph_store.dim if engine._ph_store else None,
                        "faces_enabled": engine.faces_enabled,
                        "faces": engine.catalog.num_faces(),
                        "timings": get_stats(),
                    },
                    indent=2,
                )
            )
        elif args.cmd == "serve":
            from pixelbox_tpu.serve import serve

            serve(engine, host=args.host, port=args.port,
                  batching=not args.no_batching)
    finally:
        engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
