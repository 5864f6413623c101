"""Int4 (half-byte) semantic index — 2× rows per HBM byte, opt-in.

The scan is HBM-bandwidth-bound (PERF.md: ~38 GB/s effective on the test
chip), so index bytes ARE the capacity/throughput budget.  This packs two
4-bit codes per byte: a 1M×128 index drops from 128 MB to 64 MB, doubling
either the rows a chip can serve or the batched scan rate.

Quantization: the u8 code v8 ∈ [0,255] (ops/quantize.py, the reference's
saturating-cast semantics) maps to v4 = round(v8·15/255) ∈ [0,15]; v4
dequantizes to the exact u8 grid value 17·v4 (17 = 255/15, so 0 and 255
are representable exactly).  Distances reuse the exact-integer cosine
spec over centered values 2·(17·v4) − 255 = 34·v4 − 255:

    Σ(34a−255)(34b−255) = 1156·Σab − 8670·(Σa + Σb) + 65025·D

— an int32 affine fix over the int8 GEMM of the 4-bit codes, with the
same canonical f32 epilogue as the u8 path, so numpy oracle == XLA ==
Pallas bit-for-bit.  This is a DIFFERENT (coarser) metric than the u8
index — an explicit capacity/precision trade the reference has no analog
for — not a compressed view of it.

Packing layout: column-blocked, NOT interleaved — byte j of a row holds
dim j in its low nibble and dim j + D/2 in its high nibble.  Unpacking is
then a mask/shift + concatenate along lanes (Mosaic-friendly; dot
products don't care about dim order as long as queries pack the same).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.distances import _cosine_distance_from_moments
from pixelbox_tpu.ops.scan import DEFAULT_BLOCK_ROWS, _block_iota


class PackedSemantic4Index(NamedTuple):
    """Device arrays for the int4 semantic index."""

    data: jnp.ndarray      # uint8 [N_pad, D/2], two 4-bit codes per byte
    row_sum: jnp.ndarray   # int32 [N_pad]: Σ v4
    row_mag2: jnp.ndarray  # int32 [N_pad]: Σ (34·v4 − 255)²
    valid: jnp.ndarray     # bool [N_pad]

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return 2 * self.data.shape[1]


def quantize_u8_to_u4(v8: np.ndarray) -> np.ndarray:
    """u8 codes → 4-bit codes, round-half-up on the 15/255 rescale."""
    v8 = np.asarray(v8, dtype=np.uint16)
    return ((v8 * 15 + 127) // 255).astype(np.uint8)


def dequantize_u4_to_u8(v4: np.ndarray) -> np.ndarray:
    return (np.asarray(v4, dtype=np.uint16) * 17).astype(np.uint8)


def pack_u4_rows(v4: np.ndarray) -> np.ndarray:
    """4-bit codes [n, D] → packed bytes [n, D/2] (column-blocked)."""
    v4 = np.asarray(v4, dtype=np.uint8)
    n, d = v4.shape
    assert d % 2 == 0, d
    half = d // 2
    return (v4[:, :half] | (v4[:, half:] << 4)).astype(np.uint8)


def unpack_u4_rows_np(packed: np.ndarray) -> np.ndarray:
    p = np.asarray(packed, dtype=np.uint8)
    return np.concatenate([p & 0xF, p >> 4], axis=-1)


def semantic4_rows_from_u8(rows_u8: np.ndarray):
    """u8 rows [n, D] → (packed [n, D/2], row_sum [n], row_mag2 [n])."""
    v4 = quantize_u8_to_u4(rows_u8)
    packed = pack_u4_rows(v4)
    # int32 temporaries like the u8 twin (packed.py): |34v−255| ≤ 255, so
    # row_mag2 ≤ 65025·D fits int32 for any realistic D — int64 would
    # double host peak memory on every store realloc.
    v = v4.astype(np.int32)
    row_sum = np.sum(v, axis=-1, dtype=np.int32)
    c = 34 * v - 255
    row_mag2 = np.sum(c * c, axis=-1, dtype=np.int32)
    return packed, row_sum, row_mag2


def build_semantic4_index(
    rows_u8: np.ndarray, block_rows: int = DEFAULT_BLOCK_ROWS
) -> PackedSemantic4Index:
    """Pack u8 rows into a padded int4 device index."""
    n, d = rows_u8.shape
    n_pad = -(-n // block_rows) * block_rows
    packed, row_sum, row_mag2 = semantic4_rows_from_u8(rows_u8)
    data = np.zeros((n_pad, d // 2), dtype=np.uint8)
    data[:n] = packed
    rs = np.zeros(n_pad, np.int32)
    rs[:n] = row_sum
    rm = np.zeros(n_pad, np.int32)
    rm[:n] = row_mag2
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    return PackedSemantic4Index(
        jnp.asarray(data), jnp.asarray(rs), jnp.asarray(rm), jnp.asarray(valid)
    )


# --------------------------------------------------------------------- #
# Oracle (numpy, exact)


def cosine4_distance_np(a_u8: np.ndarray, b_u8: np.ndarray) -> np.ndarray:
    """Reciprocal cosine over the int4-quantized codes (canonical f32
    rounding spec, ops/distances.py)."""
    ca = 34 * quantize_u8_to_u4(a_u8).astype(np.int64) - 255
    cb = 34 * quantize_u8_to_u4(b_u8).astype(np.int64) - 255
    dot = np.sum(ca * cb, axis=-1)
    mag2_a = np.sum(ca * ca, axis=-1).astype(np.float32)
    mag2_b = np.sum(cb * cb, axis=-1).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = (np.float32(1.0) / np.sqrt(mag2_a)) * (
            np.float32(1.0) / np.sqrt(mag2_b)
        )
        cos = dot.astype(np.float32) * inv
        dist = np.float32(1.0) / np.maximum(cos, np.float32(1e-6)) - np.float32(1.0)
    dist = np.maximum(dist, np.float32(0.0))
    dot_f = dot.astype(np.float32)
    ident = (dot_f == mag2_a) & (mag2_a == mag2_b)
    zero = (mag2_a == np.float32(0.0)) | (mag2_b == np.float32(0.0))
    return np.where(ident | zero, np.float32(0.0), dist).astype(np.float32)


def cosine4a_distance_np(a_u8: np.ndarray, b_u8: np.ndarray) -> np.ndarray:
    """ASYMMETRIC int4 distance: unquantized u8 query (centered 2q−255)
    vs int4-quantized rows (centered 34·v4 − 255).  Same canonical f32
    spec; far better retrieval vs the u8 ground truth than the symmetric
    metric because only ONE side pays quantization error (classic ADC —
    asymmetric distance computation — from the PQ literature)."""
    ca = 2 * np.asarray(a_u8, dtype=np.int64) - 255
    cb = 34 * quantize_u8_to_u4(b_u8).astype(np.int64) - 255
    dot = np.sum(ca * cb, axis=-1)
    mag2_a = np.sum(ca * ca, axis=-1).astype(np.float32)
    mag2_b = np.sum(cb * cb, axis=-1).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = (np.float32(1.0) / np.sqrt(mag2_a)) * (
            np.float32(1.0) / np.sqrt(mag2_b)
        )
        cos = dot.astype(np.float32) * inv
        dist = np.float32(1.0) / np.maximum(cos, np.float32(1e-6)) - np.float32(1.0)
    dist = np.maximum(dist, np.float32(0.0))
    dot_f = dot.astype(np.float32)
    ident = (dot_f == mag2_a) & (mag2_a == mag2_b)
    zero = (mag2_a == np.float32(0.0)) | (mag2_b == np.float32(0.0))
    return np.where(ident | zero, np.float32(0.0), dist).astype(np.float32)


def cosine4a_scan_topk_np(query_u8, db_u8, k=100, max_distance=1e3):
    from pixelbox_tpu.ops.oracle import _scan_topk_np

    q = np.atleast_2d(np.asarray(query_u8, dtype=np.uint8))
    db = np.asarray(db_u8, dtype=np.uint8)
    n, dim = db.shape
    chunk = max(1, (1 << 27) // max(1, n * dim))
    dist = np.empty((q.shape[0], n), dtype=np.float32)
    for st in range(0, q.shape[0], chunk):
        e = min(st + chunk, q.shape[0])
        dist[st:e] = cosine4a_distance_np(q[st:e, None, :], db[None, :, :])
    return _scan_topk_np(dist, k, max_distance)


def cosine4_scan_topk_np(query_u8, db_u8, k=100, max_distance=1e3):
    """Oracle for :func:`cosine4_scan_topk`.  Memory-bounded like the u8
    oracle: the naive broadcast would materialize [Q, N, D] int64."""
    from pixelbox_tpu.ops.oracle import _scan_topk_np

    q = np.atleast_2d(np.asarray(query_u8, dtype=np.uint8))
    db = np.asarray(db_u8, dtype=np.uint8)
    n, dim = db.shape
    chunk = max(1, (1 << 27) // max(1, n * dim))
    dist = np.empty((q.shape[0], n), dtype=np.float32)
    for s in range(0, q.shape[0], chunk):
        e = min(s + chunk, q.shape[0])
        dist[s:e] = cosine4_distance_np(q[s:e, None, :], db[None, :, :])
    return _scan_topk_np(dist, k, max_distance)


# --------------------------------------------------------------------- #
# XLA blocked scan


def _unpack_u4(packed):
    return jnp.concatenate(
        [packed & jnp.uint8(0xF), packed >> 4], axis=-1
    ).astype(jnp.int8)


def query4_moments_from_u8(q_u8: jnp.ndarray):
    """Device-side query precompute: u8 [Q, D] → int4 codes + moments."""
    v = (jnp.asarray(q_u8).astype(jnp.int32) * 15 + 127) // 255
    q_i8 = v.astype(jnp.int8)
    q_sum = jnp.sum(v, axis=-1).astype(jnp.int32)
    c = 34 * v - 255
    q_mag2 = jnp.sum(c * c, axis=-1).astype(jnp.int32)
    return q_i8, q_sum, q_mag2


def _cosine4_block_dist(
    q_i8, q_sum, q_mag2_f, blk_packed, blk_sum, blk_mag2, blk_valid,
    max_distance, d,
):
    blk = _unpack_u4(blk_packed)
    dot4 = lax.dot_general(
        q_i8, blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dot_c = (
        1156 * dot4
        - 8670 * (q_sum[:, None] + blk_sum[None, :])
        + jnp.int32(65025 * d)
    )
    dist = _cosine_distance_from_moments(
        dot_c.astype(jnp.float32), q_mag2_f,
        blk_mag2.astype(jnp.float32)[None, :],
    )
    keep = blk_valid[None, :] & (dist < max_distance)
    return jnp.where(keep, dist, jnp.inf)


def _cosine4a_block_dist(
    q_i8, q_sum, q_mag2_f, blk_packed, blk_sum, blk_mag2, blk_valid,
    max_distance, d,
):
    """Asymmetric block distances: q_i8 = u8−128 codes (ops.packed
    query moments); rows = packed int4."""
    blk = _unpack_u4(blk_packed)
    dot8 = lax.dot_general(
        q_i8, blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dot_c = (
        68 * dot8 + 34 * blk_sum[None, :] - 510 * q_sum[:, None]
        - jnp.int32(255 * d)
    )
    dist = _cosine_distance_from_moments(
        dot_c.astype(jnp.float32), q_mag2_f,
        blk_mag2.astype(jnp.float32)[None, :],
    )
    keep = blk_valid[None, :] & (dist < max_distance)
    return jnp.where(keep, dist, jnp.inf)


@partial(jax.jit, static_argnames=("k", "block_rows"))
def cosine4a_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemantic4Index,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
):
    """Exact blocked top-k with ASYMMETRIC distances (u8 query, int4
    rows); ``cosine4a_scan_topk_np`` is the oracle."""
    from pixelbox_tpu.ops.packed import query_moments_from_u8

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows
    assert index.dim == d, (index.dim, d)

    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    md = jnp.asarray(max_distance, dtype=jnp.float32)

    xs = (
        index.data.reshape(nb, block_rows, d // 2),
        index.row_sum.reshape(nb, block_rows),
        index.row_mag2.reshape(nb, block_rows),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    def body(carry, x):
        best_d, best_i = carry
        blk, blk_sum, blk_mag2, blk_valid, base = x
        dist = _cosine4a_block_dist(
            q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid, md, d
        )
        idx = _block_iota(base, block_rows, qn)
        cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
        return topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k), None

    init = topk_ops.empty_topk((qn,), k)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "block_rows"))
def cosine4_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemantic4Index,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
):
    """Exact blocked top-k over the int4 index (u8 queries are int4-
    quantized on device; ``cosine4_scan_topk_np`` is the oracle)."""
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows
    assert index.dim == d, (index.dim, d)

    q_i8, q_sum, q_mag2 = query4_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    md = jnp.asarray(max_distance, dtype=jnp.float32)

    xs = (
        index.data.reshape(nb, block_rows, d // 2),
        index.row_sum.reshape(nb, block_rows),
        index.row_mag2.reshape(nb, block_rows),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    def body(carry, x):
        best_d, best_i = carry
        blk, blk_sum, blk_mag2, blk_valid, base = x
        dist = _cosine4_block_dist(
            q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid, md, d
        )
        idx = _block_iota(base, block_rows, qn)
        cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
        return topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k), None

    init = topk_ops.empty_topk((qn,), k)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


# --------------------------------------------------------------------- #
# Fused Pallas threshold scan (guaranteed exact vs the int4 oracle)


@partial(
    jax.jit,
    static_argnames=(
        "k", "tile_rows", "target_count", "max_rounds", "query_mode",
    ),
)
def pallas_threshold4_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemantic4Index,
    meta: jnp.ndarray,            # [4, N] int32 (build_semantic4_meta)
    sample,                       # ops.scan.ScanSample over the PACKED data
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    tile_rows: int = 2048,
    target_count: int | None = None,
    max_rounds: int = 96,
    query_mode: str = "asym",
):
    """Int4 twin of ``pallas_threshold_scan_topk_v2``: the one threshold
    kernel reads HALF the HBM bytes (packed nibbles, unpacked in VMEM).
    ``query_mode="asym"`` (default) keeps the query at full u8 precision
    against the int4 rows (kind="cosine4a" — better retrieval, same
    index); "sym" quantizes the query too (kind="cosine4", the r2
    behavior).  Returns (dist [Q,k], idx, exact [Q]); repair unproven
    queries with :func:`cosine4a_scan_topk` / :func:`cosine4_scan_topk`
    respectively."""
    from pixelbox_tpu.ops.pallas_scan import (
        _generic_threshold_scan,
        _sample_meta4,
    )

    assert query_mode in ("asym", "sym"), query_mode
    assert index.dim == query_u8.shape[-1], (index.dim, query_u8.shape)
    kind = "cosine4a" if query_mode == "asym" else "cosine4"
    return _generic_threshold_scan(
        kind, "carry", query_u8, index.data, meta,
        sample.data, _sample_meta4(sample), index.capacity, index.dim,
        k, max_distance, tile_rows, target_count, max_rounds, 0,
    )


def build_semantic4_meta(index: PackedSemantic4Index) -> jnp.ndarray:
    """[2, N] int32 meta for the int4 threshold kernel — the same layout
    as the u8 kernel's (row_sum; row_mag2 with 0 marking invalid)."""
    from pixelbox_tpu.ops.pallas_scan import build_row_meta

    return build_row_meta(index)


def cosine4_scan_topk_auto(
    query_u8,
    index: PackedSemantic4Index,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    sample=None,
    meta: jnp.ndarray | None = None,
    prefer_pallas: bool | None = None,
    query_mode: str = "asym",
):
    """Guaranteed-exact int4 scan: fused Pallas threshold on TPU, direct
    exact scan elsewhere; unproven queries re-scan exactly.  Default
    query_mode="asym" keeps queries at u8 precision against the int4
    rows (exact vs the ASYMMETRIC oracle; measurably better retrieval
    vs the u8 ground truth — bench recall rows); "sym" restores the
    round-2 both-sides-quantized metric (self-matches exactly 0)."""
    from pixelbox_tpu.ops.scan import _default_backend_is_tpu, build_scan_sample

    assert query_mode in ("asym", "sym"), query_mode
    exact_fn = cosine4a_scan_topk if query_mode == "asym" else cosine4_scan_topk
    q = jnp.asarray(query_u8)
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None, :]
    if index.capacity <= 4 * block_rows:
        # Small index: selection costs are negligible; scan directly.
        best_d, best_i = exact_fn(
            q, index, k=k, max_distance=max_distance, block_rows=block_rows
        )
        if squeeze:
            return best_d[0], best_i[0]
        return best_d, best_i
    use_pallas = (
        prefer_pallas if prefer_pallas is not None else _default_backend_is_tpu()
    ) and index.capacity % 2048 == 0 and index.dim % 128 == 0 and q.shape[0] <= 512
    if sample is None:
        sample = build_scan_sample(index)
    if use_pallas:
        from pixelbox_tpu.ops.scan import _pick_tile_rows

        if meta is None:
            meta = build_semantic4_meta(index)
        best_d, best_i, exact = pallas_threshold4_scan_topk(
            q, index, meta, sample, k=k, max_distance=max_distance,
            tile_rows=_pick_tile_rows(max(q.shape[0], 32), index.capacity),
            query_mode=query_mode,
        )
    else:
        # Off the Mosaic path (CPU/GPU, odd shapes, huge batches) the XLA
        # threshold scan still beats the direct exact scan.
        from pixelbox_tpu.ops.scan import cosine_scan_topk_threshold

        best_d, best_i, exact = cosine_scan_topk_threshold(
            q, index, sample, k=k, max_distance=max_distance,
            block_rows=block_rows,
            precision="int4a" if query_mode == "asym" else "int4",
        )
    from pixelbox_tpu.ops.scan import repair_unproven

    best_d, best_i = repair_unproven(
        q, best_d, best_i, exact,
        lambda rq: exact_fn(
            rq, index, k=k, max_distance=max_distance, block_rows=block_rows
        ),
    )
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


# --------------------------------------------------------------------- #
# Exact u8 rerank of int4 candidates (round 3)
#
# The int4 device index trades precision for 2× row capacity, but the
# store's AUTHORITATIVE u8 rows never leave the host mirror
# (index/store.py: "the host mirror and checkpoints stay u8").  Rescoring
# the scan's top-C candidates with the exact u8 metric therefore costs
# one tiny host GEMM — and it recovers essentially all of the retrieval
# quality the 4-bit metric loses: on the structured-embedding recall
# bench (bench.py:bench_int4_recall_vs_u8, n=200k) asymmetric int4 alone
# measures recall@10 ≈ 0.49 vs the u8 ground truth; with C=4·k exact-u8
# rerank it measures 1.00 (recall@100 ≈ 0.999).  Per-dim scaled 4-bit
# grids were prototyped as an alternative and measured ≈ +0.05 recall@10
# — not worth a second index format (PERF.md, round-3 int4 section).
#
# Returned distances are TRUE u8 reciprocal-cosine distances (canonical
# numpy spec, ops/oracle.cosine_distance_np), so results are directly
# comparable with int8-mode results, `max_distance_from_query` keeps its
# u8-metric meaning (strict `dist < max` in u8 space, engine.rs:375-383),
# and stored-hash self-matches score exactly 0 again.


#: "Unbounded" max_distance for the candidate-retrieval scan.  The
#: reciprocal-cosine distance tops out at 1/1e-6 − 1 < 1e6 (ops/distances,
#: engine.rs:582-587), so a strict `dist < 1e7` filter excludes nothing —
#: the real `max_distance_from_query` bound applies in u8 space after the
#: rescore.  (1e3, the engine's DEFAULT max distance, is NOT unbounded.)
UNBOUNDED_DISTANCE = 1e7


def default_rerank_candidates(k: int) -> int:
    """Candidate-list size for the u8 rerank: 4·k with a 400 floor (the
    measured knee — recall@10 hits 1.0 at C=400 on the 200k structured
    bench; C=100 already measures 0.98).  Very large k caps the margin at
    +4096 extra candidates so kernel top-k lanes stay bounded."""
    k = int(k)
    return max(4 * k, 400) if k <= 1024 else k + 4096


def rerank_candidates_u8(
    query_u8: np.ndarray,
    cand_idx: np.ndarray,
    host_rows_u8: np.ndarray,
    k: int = 100,
    max_distance: float = 1e3,
    chunk_queries: int = 32,
):
    """Exact u8 rescoring of per-query candidate rows.

    Parameters
    ----------
    query_u8: [Q, D] (or [D]) u8 query codes.
    cand_idx: [Q, C] (or [C]) global row ids from an int4 scan; −1 marks
        empty slots (filtered out).
    host_rows_u8: [N, D] u8 — the store's host mirror
        (``VectorStore.get_rows`` backing array).
    k, max_distance: final ``WHERE dist < max … LIMIT k`` semantics,
        evaluated in the exact u8 metric.

    Returns (dist [Q, k] f32 inf-padded, idx [Q, k] int64 −1-padded),
    ordered exactly as the full u8 oracle orders the same rows:
    (dist, global row id) lexicographic ascending — so whenever the
    candidate set covers the true top-k, the output IS the exact u8
    top-k (tests/test_int4_rerank.py).
    """
    from pixelbox_tpu.ops.oracle import cosine_distance_np

    q = np.atleast_2d(np.asarray(query_u8, dtype=np.uint8))
    squeeze = np.asarray(cand_idx).ndim == 1
    ci = np.atleast_2d(np.asarray(cand_idx, dtype=np.int64))
    qn, c = ci.shape
    assert q.shape[0] == qn, (q.shape, ci.shape)
    rows = np.asarray(host_rows_u8, dtype=np.uint8)
    out_d = np.full((qn, k), np.inf, dtype=np.float32)
    out_i = np.full((qn, k), -1, dtype=np.int64)
    maxd = np.float32(max_distance)
    for s in range(0, qn, chunk_queries):
        e = min(s + chunk_queries, qn)
        idx_blk = ci[s:e]
        # −1 marks empty slots.  The length bound only guards the gather
        # against crashing; it is NOT a compaction-race guard — a
        # compact() renumbers surviving rows, so a stale in-range id
        # would rescore the wrong vector.  Callers must hold the index
        # read lock across scan + rerank (every engine path does;
        # serve.py holds it across submit→assemble).
        ok = (idx_blk >= 0) & (idx_blk < rows.shape[0])
        safe = np.where(ok, idx_blk, 0)
        gathered = rows[safe]                       # [B, C, D]
        dist = cosine_distance_np(q[s:e, None, :], gathered)
        dist = np.where(ok, dist, np.inf).astype(np.float32)
        for bi in range(e - s):
            d_row = dist[bi]
            keep = np.nonzero(d_row < maxd)[0]
            order = keep[np.lexsort((idx_blk[bi, keep], d_row[keep]))][:k]
            out_d[s + bi, : len(order)] = d_row[order]
            out_i[s + bi, : len(order)] = idx_blk[bi, order]
    if squeeze:
        return out_d[0], out_i[0]
    return out_d, out_i


def scan_with_u8_rerank(
    scan_fn,
    query_u8: np.ndarray,
    host_rows_u8: np.ndarray,
    k: int = 100,
    max_distance: float = 1e3,
    n_real: int | None = None,
):
    """Candidates-then-rerank orchestration, in ONE place.

    The engine's ``int4_rerank`` contract: retrieve ``C =
    default_rerank_candidates(k)`` candidates in the int4 metric
    UNBOUNDED (the ``WHERE dist < max`` filter applies in the exact u8
    metric after rescoring), then rescore them against the store's u8
    host mirror with the real ``(k, max_distance)``.

    ``scan_fn(candidates, unbounded_distance) -> (dist, idx)`` wraps
    whichever int4 scan the caller uses (single-chip auto, sharded,
    masked-filtered, serving-batched) — routing every path through this
    helper keeps new scan paths rerank-correct by construction instead
    of hand-copying the scan_k/UNBOUNDED/rescore dance per call site.
    Callers must hold the index read lock across scan + rerank: a
    compaction between them renumbers rows, and a renumbered id that is
    still in range would silently rescore the wrong row.

    ``n_real``: for batched callers that zero-pad queries up to a compile
    bucket (serving), the padded device scan still runs on the full
    batch, but only the first ``n_real`` rows are rescored on the host
    (and only those rows are returned).
    """
    c = default_rerank_candidates(k)
    _dist, idx = scan_fn(c, UNBOUNDED_DISTANCE)
    idx = np.asarray(idx)
    q = np.asarray(query_u8, dtype=np.uint8)
    if n_real is not None:
        idx = idx[:n_real]
        q = q[:n_real]
    return rerank_candidates_u8(
        q, idx, host_rows_u8,
        k=k, max_distance=max_distance,
    )
