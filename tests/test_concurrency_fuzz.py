"""Bounded multi-thread fuzz over the engine's full mutation surface.

Four threads hammer ONE int4+faces engine concurrently for a fixed
number of rounds — semantic/phash/face queries, inserts, removals,
compactions, tag edits — asserting no exceptions, no torn results
(query results must always reference live catalog rows), and exact
eventual consistency once the churn stops.  This guards the
reader-writer seams the single-flow tests can't reach.
"""

import threading

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import face_image, textured_image


@pytest.mark.parametrize("on_mesh", [False, True], ids=["single", "mesh8"])
def test_engine_mutation_fuzz(tmp_path, on_mesh):
    d = tmp_path / "photos"
    d.mkdir()
    n_static = 8
    for s in range(n_static):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"static{s}.png"
        )
    img, _ = face_image(person=1, bg_seed=3)
    Image.fromarray(img).save(d / "face_static.png")
    for i in range(4):
        Image.fromarray(textured_image(seed=50 + i, size=(48, 48))).save(
            d / f"churn{i}.png"
        )

    eng = Engine.new(
        str(tmp_path / "fuzz.db"),
        embedder="stub",
        embedder_kwargs={"dim": 32},
        semantic_precision="int4",
        faces=True,
    )
    eng.max_distance_from_query = 1e7
    for s in range(n_static):
        eng.insert_image_from_path(str(d / f"static{s}.png"))
    eng.insert_image_from_path(str(d / "face_static.png"))
    if on_mesh:
        # The same churn, served row-sharded: hammers the sharded-mirror
        # delta sync, sharded ivf/phash/face caches, and full reshards
        # on removal/compaction — the reader-writer seams multiplied by
        # the mesh state.  Single-chip/mesh results must stay identical
        # (checked by the fresh-engine comparison at the end, which runs
        # single-chip).
        from pixelbox_tpu.parallel.mesh import make_mesh

        eng.serve_on_mesh(make_mesh(8))

    probe = eng.load_image(str(d / "static3.png"))
    ph_probe = eng.load_image(str(d / "static4.png"))
    face_probe = None
    faces = eng.detect_and_embed_faces(
        np.asarray(Image.open(d / "face_static.png").convert("RGB"))
    )
    if faces:
        face_probe = faces[0][1]

    errors = []
    stop = threading.Event()
    ROUNDS = 16 if on_mesh else 40  # mesh pays more compiles per shape
    # The engine keeps ONE result set (reference semantics: a single
    # cached_search_results the UI pages through) — concurrent CALLERS
    # serialize query→read pairs at the app level, exactly like
    # serve.py's request lock.  Mutations (insert/remove/compact/tag)
    # need no caller lock: the engine's internal rwlock covers them —
    # THAT interleaving is what this fuzz hammers.
    qlock = threading.Lock()

    def guard(fn):
        def run():
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                stop.set()
        return run

    @guard
    def querier():
        # Semantic int4+rerank queries; static3 must always rank first,
        # every returned id must exist in the catalog at fetch time.
        while not stop.is_set():
            with qlock:
                eng.query_by_image_hash_from_image(probe)
                res = eng.get_query_results()
            assert res and res[0].path.endswith("static3.png"), res
            assert all(r.id > 0 and r.filename for r in res)

    @guard
    def ph_querier():
        while not stop.is_set():
            with qlock:
                eng.query_by_phash(ph_probe.phash)
                res = eng.get_query_results()
            assert res and res[0].path.endswith("static4.png"), res

    @guard
    def face_querier():
        while not stop.is_set():
            if face_probe is None:
                return
            with qlock:
                eng.query_by_face_hash(face_probe)
                res = eng.get_query_results()
            assert res and res[0].path.endswith("face_static.png"), res

    @guard
    def tagger():
        i = 0
        while not stop.is_set():
            eng.set_tag(1, "fuzz", f"v{i}")
            with qlock:
                eng.query("tag:fuzz")
                res = eng.get_query_results()
            assert res and res[0].id == 1, res
            i += 1

    @guard
    def ivf_querier():
        # Clustered-ANN queries against the same churn: hammers the IVF
        # cache machinery (k-means train, bucket pack, incremental spill
        # extend, invalidation on remove/compact) under concurrent
        # mutation.  scan_mode flips under qlock, which serializes
        # query→read pairs across all querier threads.
        while not stop.is_set():
            with qlock:
                eng.scan_mode = "ivf"
                try:
                    eng.query_by_image_hash_from_image(probe)
                    res = eng.get_query_results()
                finally:
                    eng.scan_mode = "auto"
            assert res and res[0].path.endswith("static3.png"), res
            assert float(res[0].distance_from_query) == 0.0
            assert all(r.id > 0 and r.filename for r in res)

    threads = [
        threading.Thread(target=f)
        for f in (querier, ph_querier, face_querier, tagger, ivf_querier)
    ]
    for t in threads:
        t.start()
    try:
        # Mutation churn on the main thread: insert/remove/compact the
        # churn images while the query threads run.
        conn = eng.catalog._connect()
        for r in range(ROUNDS):
            if stop.is_set():
                break
            i = r % 4
            path = str(d / f"churn{i}.png")
            row = conn.execute(
                "SELECT id FROM images WHERE path = ?", (path,)
            ).fetchone()
            if row:
                assert eng.remove_image(int(row[0]))
                if r % 8 == 3:
                    eng.compact()
            else:
                eng.insert_image_from_path(path)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
        alive = [t for t in threads if t.is_alive()]
    assert not errors, errors[:3]
    assert not alive, "worker thread hung"

    # Eventual consistency: after churn, results equal a fresh engine's.
    eng.compact()
    eng.query_by_image_hash_from_image(probe)
    final = [
        (r.filename, round(float(r.distance_from_query), 5))
        for r in eng.get_query_results()
    ]
    db_path = eng.db_path
    eng.close()
    eng2 = Engine.open(db_path)
    eng2.max_distance_from_query = 1e7
    try:
        eng2.query_by_image_hash_from_image(probe)
        fresh = [
            (r.filename, round(float(r.distance_from_query), 5))
            for r in eng2.get_query_results()
        ]
        assert final == fresh
    finally:
        eng2.close()
