"""Cross-feature lifecycle stress: int4 precision + faces + mesh serving
with removal, compaction, post-compaction appends, and watcher deletion
sync all interacting in ONE library.

Each feature has its own unit/integration tests; this file guards the
seams between them — store renumbering vs. the int4 rerank host mirror,
sharded-mirror invalidation across modalities, and tombstone visibility
in every query path (reference lifecycle semantics: engine.rs removal /
re-index idempotency, README.md:27 "Remove from index on folder clear").
"""

import numpy as np
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.parallel.mesh import make_mesh

from fixtures import face_image, textured_image


def _results(eng):
    return [
        (r.filename, round(float(r.distance_from_query), 5))
        for r in eng.get_query_results()
    ]


def test_int4_faces_mesh_lifecycle(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(6):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"t{s}.png"
        )
    for i in range(4):
        img, _ = face_image(person=i % 2, bg_seed=30 + i)
        Image.fromarray(img).save(d / f"f{i}.png")

    eng = Engine.new(
        str(tmp_path / "lib.db"),
        embedder="stub",
        embedder_kwargs={"dim": 32},
        semantic_precision="int4",
        faces=True,
    )
    eng.max_distance_from_query = 1e7
    try:
        for s in range(6):
            eng.insert_image_from_path(str(d / f"t{s}.png"))
        for i in range(4):
            eng.insert_image_from_path(str(d / f"f{i}.png"))
        assert eng._face_store is not None and eng._face_store.size > 0

        # Single-chip expectations (int4 + exact-u8 rerank path).
        probe = str(d / "t1.png")
        eng.query_by_image_hash_from_file(probe)
        sem_single = _results(eng)
        assert sem_single[0] == ("t1.png", 0.0)

        faces = eng.detect_and_embed_faces(
            np.asarray(Image.open(d / "f0.png").convert("RGB"))
        )
        assert faces
        q_face = faces[0][1]
        eng.query_by_face_hash(q_face)
        face_single = _results(eng)
        assert face_single and face_single[0][0] == "f0.png"

        rec = eng.load_image(str(d / "t2.png"))
        eng.query_by_phash(rec.phash)
        ph_single = _results(eng)
        assert ph_single[0] == ("t2.png", 0.0)

        # Same answers from the mesh (sharded int4 scan + u8 rerank,
        # sharded face scan, sharded phash).
        eng.serve_on_mesh(make_mesh(8))
        eng.query_by_image_hash_from_file(probe)
        assert _results(eng) == sem_single
        eng.query_by_face_hash(q_face)
        assert _results(eng) == face_single
        eng.query_by_phash(rec.phash)
        assert _results(eng) == ph_single

        # Remove a semantic result and a FACE image while serving from
        # the mesh: every modality must stop returning them.
        victim_sem = next(
            r.id for r in eng.get_query_results() if r.filename == "t2.png"
        )
        eng.query_by_image_hash_from_file(str(d / "f1.png"))
        victim_face = next(
            r.id for r in eng.get_query_results() if r.filename == "f1.png"
        )
        assert eng.remove_image(victim_sem)
        assert eng.remove_image(victim_face)

        eng.query_by_image_hash_from_file(probe)
        sem_after = _results(eng)
        assert all(f != "t2.png" and f != "f1.png" for f, _ in sem_after)
        # Distances of the survivors are unchanged (exact u8 rerank).
        kept = [x for x in sem_single if x[0] not in ("t2.png", "f1.png")]
        assert sem_after == kept

        eng.query_by_face_hash(q_face)
        assert all(f != "f1.png" for f, _ in _results(eng))
        assert _results(eng)[0][0] == "f0.png"

        eng.query_by_phash(rec.phash)
        assert all(f != "t2.png" for f, _ in _results(eng))

        # Compact (renumbers every store) while the mesh mirrors exist:
        # the int4 rerank host mirror, face row→image maps, and the
        # sharded mirrors must all stay consistent.
        eng.compact()

        eng.query_by_image_hash_from_file(probe)
        assert _results(eng) == kept
        eng.query_by_face_hash(q_face)
        assert _results(eng)[0][0] == "f0.png"
        eng.query_by_phash(rec.phash)
        assert all(f not in ("t2.png", "f1.png") for f, _ in _results(eng))

        # Post-compaction appends (delta path) are immediately queryable
        # in every modality.
        img, _ = face_image(person=0, bg_seed=99)
        Image.fromarray(img).save(d / "f_new.png")
        Image.fromarray(textured_image(seed=77, size=(48, 48))).save(
            d / "t_new.png"
        )
        eng.insert_image_from_path(str(d / "f_new.png"))
        eng.insert_image_from_path(str(d / "t_new.png"))

        eng.query_by_image_hash_from_file(str(d / "t_new.png"))
        assert _results(eng)[0] == ("t_new.png", 0.0)
        new_faces = eng.detect_and_embed_faces(
            np.asarray(Image.open(d / "f_new.png").convert("RGB"))
        )
        if new_faces:  # detector found the synthetic face again
            eng.query_by_face_hash(new_faces[0][1])
            assert _results(eng)[0][0] == "f_new.png"

        # IVF on the same battle-worn library: int4 precision + mesh +
        # post-compaction state + fresh appends, full-probe must equal
        # the current exact scan (the sharded clustered index packs the
        # padded post-compact mirror; note `kept` predates the appends).
        eng.query_by_image_hash_from_file(probe)
        exact_now = _results(eng)
        eng.scan_mode = "ivf"
        eng.ivf_clusters = 2
        eng.ivf_nprobe = 2
        try:
            eng.query_by_image_hash_from_file(probe)
            assert eng._ivf_sharded is not None
            assert _results(eng) == exact_now
            eng.query_by_image_hash_from_file(str(d / "t_new.png"))
            assert _results(eng)[0] == ("t_new.png", 0.0)
        finally:
            eng.scan_mode = "auto"
    finally:
        eng.scan_mesh = None
        eng.close()


def test_watch_deletion_syncs_faces_and_int4(tmp_path):
    """Watcher tombstones must propagate to the face store and the int4
    index (not just the semantic u8 path)."""
    import os
    import time

    d = tmp_path / "photos"
    d.mkdir()
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"t{s}.png"
        )
    img, _ = face_image(person=1, bg_seed=5)
    Image.fromarray(img).save(d / "gone.png")

    eng = Engine.new(
        str(tmp_path / "w.db"),
        embedder="stub",
        embedder_kwargs={"dim": 32},
        semantic_precision="int4",
        faces=True,
    )
    eng.max_distance_from_query = 1e7
    try:
        eng.add_tracked_folder(str(d))
        eng.start_indexing()
        eng.wait_for_indexing()
        assert eng.get_num_indexed_images() == 4
        had_faces = eng._face_store is not None and eng._face_store.size > 0

        probe = str(d / "t0.png")
        eng.query_by_image_hash_from_file(probe)
        assert any(f == "gone.png" for f, _ in _results(eng))

        os.remove(d / "gone.png")
        eng.watch(interval_s=0.05)
        deadline = time.time() + 60
        while time.time() < deadline and eng.watch_removals < 1:
            time.sleep(0.1)
        eng.stop_watching()
        assert eng.watch_removals >= 1

        eng.query_by_image_hash_from_file(probe)
        assert all(f != "gone.png" for f, _ in _results(eng))
        if had_faces:
            # All of gone.png's face rows are tombstoned with it.
            live_imgs = set()
            for img_id, rows in eng._face_rows_by_image.items():
                if rows:
                    live_imgs.add(img_id)
            names = {
                r[0]
                for r in eng.catalog._connect().execute(
                    "SELECT filename FROM images"
                )
            }
            assert "gone.png" not in names
    finally:
        eng.scan_mesh = None
        eng.close()
