"""Mixed-width compat phash: reference zip-truncate semantics
(engine.rs:594-604) over variable-length aspect-preserving hashes
(phash.rs:7), store growth without truncation, and reopen consistency."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ops import oracle

from fixtures import textured_image


def test_oracle_zip_semantics():
    a = bytes([0xFF, 0x00, 0xF0])
    b = bytes([0x0F, 0x00])  # shorter: zip truncates to 2 bytes
    # xor over first 2 bytes = F0, 00 → 4 bits; divisor 8*2.
    assert oracle.hamming_distance_zip_np(a, b) == np.float32(4 / 16)
    assert oracle.hamming_distance_zip_np(b, a) == np.float32(4 / 16)
    # Equal-width zip equals the fixed-width distance.
    assert oracle.hamming_distance_zip_np(a, a) == 0.0
    # Zero-length pair → NaN (Rust 0f32/0f32), which fails dist < max.
    assert np.isnan(oracle.hamming_distance_zip_np(b"", a))


def _zip_oracle_rank(query: bytes, blobs, k, max_distance):
    dists = np.array(
        [oracle.hamming_distance_zip_np(query, b) for b in blobs],
        dtype=np.float32,
    )
    keep = np.nonzero(dists < np.float32(max_distance))[0]
    order = keep[np.argsort(dists[keep], kind="stable")][:k]
    return [(int(i), float(dists[i])) for i in order]


@pytest.fixture(scope="module")
def mixed_engine(tmp_path_factory):
    """Images spanning several aspect ratios → several phash widths."""
    d = tmp_path_factory.mktemp("mixed")
    sizes = [
        (64, 64),    # square → 32 bytes
        (128, 64),   # 2:1 → 16 bytes
        (64, 128),
        (200, 40),   # 5:1 → shorter still
        (48, 192),
        (96, 64),
        (64, 96),
        (80, 80),
    ]
    for s, (w, h) in enumerate(sizes):
        Image.fromarray(textured_image(seed=s, size=(h, w))).save(
            d / f"m{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "m.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    for s in range(len(sizes)):
        eng.insert_image_from_path(str(d / f"m{s}.png"))
    yield eng, d, str(db)
    eng.close()


def test_widths_actually_vary(mixed_engine):
    eng, d, _ = mixed_engine
    assert len(set(eng._ph_widths)) >= 3
    # No hash was truncated: stored padded rows reproduce the catalog blob.
    for image_id, blob in eng.catalog.iter_hashes("phashes"):
        row = eng._ph_row_by_image[image_id]
        w = eng._ph_widths[row]
        assert w == len(blob)
        stored = eng._ph_store.get_rows([row])[0]
        assert bytes(stored[:w]) == blob
        assert not stored[w:].any()


@pytest.mark.parametrize("probe", [0, 1, 3])
def test_mixed_width_matches_zip_oracle(mixed_engine, probe):
    eng, d, _ = mixed_engine
    rec = eng.load_image(str(d / f"m{probe}.png"))
    eng.query_by_phash(rec.phash)
    got = [
        (r.id, round(r.distance_from_query, 6))
        for r in eng.get_query_results()
    ]

    blobs, ids = [], []
    for image_id, blob in eng.catalog.iter_hashes("phashes"):
        ids.append(image_id)
        blobs.append(blob)
    want = [
        (ids[i], round(dv, 6))
        for i, dv in _zip_oracle_rank(
            rec.phash.tobytes(), blobs, eng.max_search_results,
            eng.max_distance_from_query,
        )
    ]
    assert got == want
    assert got[0][0] == ids[probe]  # self-match first
    assert got[0][1] == 0.0


def test_narrow_query_against_wider_rows(mixed_engine):
    """Query narrower than every row: zip truncates to the query width."""
    eng, d, _ = mixed_engine
    q = np.asarray([0x12, 0x34, 0x56, 0x78], dtype=np.uint8)  # 4 bytes
    eng.query_by_phash(q)
    got = [
        (r.id, round(r.distance_from_query, 6))
        for r in eng.get_query_results()
    ]
    blobs, ids = [], []
    for image_id, blob in eng.catalog.iter_hashes("phashes"):
        ids.append(image_id)
        blobs.append(blob)
    want = [
        (ids[i], round(dv, 6))
        for i, dv in _zip_oracle_rank(
            q.tobytes(), blobs, eng.max_search_results,
            eng.max_distance_from_query,
        )
    ]
    assert got == want


def test_results_stable_across_reopen(mixed_engine):
    """Insert-order store and reopen-order store must rank identically
    (round 1 truncated on insert but padded on load, so they differed)."""
    eng, d, db = mixed_engine
    rec = eng.load_image(str(d / "m2.png"))
    eng.query_by_phash(rec.phash)
    before = [
        (r.id, round(r.distance_from_query, 6))
        for r in eng.get_query_results()
    ]

    eng2 = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 16})
    eng2.query_by_phash(rec.phash)
    after = [
        (r.id, round(r.distance_from_query, 6))
        for r in eng2.get_query_results()
    ]
    eng2.close()
    assert before == after


def test_wider_hash_grows_store(tmp_path):
    """First insert narrow, then a square (wider) hash: the store grows and
    the wide hash keeps every byte."""
    d = tmp_path / "imgs"
    d.mkdir()
    wide = textured_image(seed=1, size=(128, 128))[:32, :, :]  # 128w × 32h
    Image.fromarray(wide).save(d / "wide.png")
    Image.fromarray(textured_image(seed=2, size=(64, 64))).save(d / "sq.png")
    eng = Engine.new(str(tmp_path / "g.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.insert_image_from_path(str(d / "wide.png"))
    narrow_dim = eng._ph_store.dim
    eng.insert_image_from_path(str(d / "sq.png"))
    assert eng._ph_store.dim == 32 > narrow_dim
    rec = eng.load_image(str(d / "sq.png"))
    row = eng._ph_row_by_image[eng.catalog.get_image_by_path(str(d / "sq.png"))["id"]]
    assert bytes(eng._ph_store.get_rows([row])[0]) == rec.phash.tobytes()
    # Self-query still exact.
    eng.query_by_phash(rec.phash)
    assert eng.get_query_results()[0].filename == "sq.png"
    assert eng.get_query_results()[0].distance_from_query == 0.0
    eng.close()


def test_uniform_width_still_uses_gemm_path(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for s in range(4):
        Image.fromarray(textured_image(seed=s, size=(64, 64))).save(
            d / f"s{s}.png"
        )
    eng = Engine.new(str(tmp_path / "u.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    for s in range(4):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    rec = eng.load_image(str(d / "s1.png"))
    eng.query_by_phash(rec.phash)
    assert eng.get_query_results()[0].filename == "s1.png"
    assert eng._ph_gemm is not None  # the MXU GEMM path was taken
    eng.close()
