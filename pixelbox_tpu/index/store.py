"""Device-resident vector stores with streaming append.

The reference's vector storage is one SQLite blob row per image
(``semantic_hashes`` / ``phashes``, src/engine.rs:48, 106-109), read back
row-by-row at query time.  Here vectors live packed in HBM (see
``ops.packed``) so queries are MXU GEMMs; the host keeps a uint8 mirror for
checkpointing and cheap re-packing.

Append strategy ("streaming append into padded device buffers without
reallocation", SURVEY.md §7 hard part 4): capacity grows by doubling in
block-aligned steps; appends within capacity are in-place dynamic-update
slices (donated, so XLA updates the HBM buffer without copying the whole
index); the validity mask gates padded/deleted rows out of every scan.

Deletes are tombstones (valid=False) — the analog of removing a row —
compacted away by :meth:`VectorStore.compact`.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.packed import (
    PackedHammingIndex,
    PackedSemanticIndex,
    semantic_rows_from_u8,
)

DEFAULT_BLOCK_ROWS = 32768
_MIN_CAPACITY = 1024


@partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _update_rows(buf, rows, start):
    return jax.lax.dynamic_update_slice_in_dim(buf, rows, start, axis=0)


class VectorStore:
    """A growable device-resident u8 vector index (semantic or hamming).

    Parameters
    ----------
    dim: vector width in bytes (embedding dim for semantic, hash bytes for
        phash).  The reference treats hash width as opaque/user-defined
        (engine.rs:48; README.md:51-59), so any dim works.
    kind: "semantic" (int8 GEMM cosine scan), "semantic4" (half-byte
        packed device index, ops/int4.py — 2× rows per HBM byte; the host
        mirror and checkpoints stay u8), or "hamming" (xor-popcount).
    """

    def __init__(
        self,
        dim: int,
        kind: str = "semantic",
        block_rows: int = DEFAULT_BLOCK_ROWS,
        device: Optional[jax.Device] = None,
    ):
        assert kind in ("semantic", "semantic4", "hamming"), kind
        self.dim = int(dim)
        self.kind = kind
        self.block_rows = int(block_rows)
        self.device = device
        self.n = 0  # live row count (including tombstones)
        self.n_deleted = 0
        #: Mutation counter: bumps on every append/delete/compact/grow.
        #: Derived layouts (hamming-GEMM unpack, pallas row meta, sharded
        #: copies) key their caches on this — NOT on ``n``, which does not
        #: change on tombstone deletes.
        self.version = 0
        #: Bumps only on layout-changing mutations (realloc/delete/compact/
        #: grow).  In-capacity appends bump ``version`` alone, letting
        #: sharded mirrors sync incrementally (ship just the delta rows)
        #: instead of re-transferring the whole index.
        self.structural_version = 0
        # Host mirrors (uint8 raw rows; authoritative for checkpoint/repack).
        self._host_rows = np.zeros((0, self.dim), dtype=np.uint8)
        self._host_valid = np.zeros((0,), dtype=bool)
        self._capacity = 0
        self._device_arrays = None  # PackedSemanticIndex | PackedHammingIndex

    # ------------------------------------------------------------------ #
    # Capacity management

    def _target_capacity(self, n: int) -> int:
        cap = max(_MIN_CAPACITY, self.block_rows)
        while cap < n:
            cap *= 2
        # Keep capacity block-aligned for the blocked scans.
        return -(-cap // self.block_rows) * self.block_rows

    def _alloc(self, capacity: int):
        """(Re)allocate device arrays at ``capacity`` and repack live rows."""
        self._capacity = capacity
        self.structural_version += 1
        n = self.n
        rows = np.zeros((capacity, self.dim), dtype=np.uint8)
        rows[:n] = self._host_rows[:n]
        valid = np.zeros((capacity,), dtype=bool)
        valid[:n] = self._host_valid[:n]
        if self.kind == "semantic":
            data, row_sum, row_mag2 = semantic_rows_from_u8(rows)
            self._device_arrays = PackedSemanticIndex(
                self._put(data), self._put(row_sum), self._put(row_mag2), self._put(valid)
            )
        elif self.kind == "semantic4":
            from pixelbox_tpu.ops.int4 import (
                PackedSemantic4Index,
                semantic4_rows_from_u8,
            )

            data, row_sum, row_mag2 = semantic4_rows_from_u8(rows)
            self._device_arrays = PackedSemantic4Index(
                self._put(data), self._put(row_sum), self._put(row_mag2), self._put(valid)
            )
        else:
            self._device_arrays = PackedHammingIndex(self._put(rows), self._put(valid))

    def _put(self, x: np.ndarray) -> jnp.ndarray:
        if self.device is not None:
            return jax.device_put(x, self.device)
        return jnp.asarray(x)

    # ------------------------------------------------------------------ #
    # Mutation

    def append(self, rows_u8: np.ndarray) -> np.ndarray:
        """Append u8 rows [m, dim]; returns their assigned row ids [m].

        Row ids are stable for the life of the store (until :meth:`compact`).
        """
        rows_u8 = np.ascontiguousarray(rows_u8, dtype=np.uint8)
        if rows_u8.ndim == 1:
            rows_u8 = rows_u8[None, :]
        m, d = rows_u8.shape
        assert d == self.dim, (d, self.dim)
        start = self.n
        new_n = start + m

        # Host mirror grows amortized-doubling too.
        if new_n > self._host_rows.shape[0]:
            new_cap = max(_MIN_CAPACITY, 2 * self._host_rows.shape[0])
            while new_cap < new_n:
                new_cap *= 2
            grown = np.zeros((new_cap, self.dim), dtype=np.uint8)
            grown[: self.n] = self._host_rows[: self.n]
            self._host_rows = grown
            grown_v = np.zeros((new_cap,), dtype=bool)
            grown_v[: self.n] = self._host_valid[: self.n]
            self._host_valid = grown_v
        self._host_rows[start:new_n] = rows_u8
        self._host_valid[start:new_n] = True
        self.n = new_n
        self.version += 1

        if self._device_arrays is None or new_n > self._capacity:
            self._alloc(self._target_capacity(new_n))
        else:
            self._write_device_rows(rows_u8, start)
        return np.arange(start, new_n, dtype=np.int64)

    def _write_device_rows(self, rows_u8: np.ndarray, start: int):
        m = rows_u8.shape[0]
        valid_upd = jnp.ones((m,), dtype=bool)
        if self.kind == "semantic":
            data, row_sum, row_mag2 = semantic_rows_from_u8(rows_u8)
            a = self._device_arrays
            self._device_arrays = PackedSemanticIndex(
                _update_rows(a.data, self._put(data), start),
                _update_rows(a.row_sum, self._put(row_sum), start),
                _update_rows(a.row_mag2, self._put(row_mag2), start),
                _update_rows(a.valid, valid_upd, start),
            )
        elif self.kind == "semantic4":
            from pixelbox_tpu.ops.int4 import (
                PackedSemantic4Index,
                semantic4_rows_from_u8,
            )

            data, row_sum, row_mag2 = semantic4_rows_from_u8(rows_u8)
            a = self._device_arrays
            self._device_arrays = PackedSemantic4Index(
                _update_rows(a.data, self._put(data), start),
                _update_rows(a.row_sum, self._put(row_sum), start),
                _update_rows(a.row_mag2, self._put(row_mag2), start),
                _update_rows(a.valid, valid_upd, start),
            )
        else:
            a = self._device_arrays
            self._device_arrays = PackedHammingIndex(
                _update_rows(a.data, self._put(rows_u8), start),
                _update_rows(a.valid, valid_upd, start),
            )

    def delete(self, row_ids) -> None:
        """Tombstone rows (they stop appearing in scans; ids stay stable)."""
        row_ids = np.atleast_1d(np.asarray(row_ids, dtype=np.int64))
        fresh = self._host_valid[row_ids]
        self._host_valid[row_ids] = False
        self.n_deleted += int(np.count_nonzero(fresh))
        self.version += 1
        self.structural_version += 1
        if self._device_arrays is not None:
            a = self._device_arrays
            new_valid = a.valid.at[jnp.asarray(row_ids)].set(False)
            self._device_arrays = a._replace(valid=new_valid)

    def compact(self) -> np.ndarray:
        """Drop tombstones; returns old→new row-id mapping (−1 = deleted)."""
        old_n = self.n
        live = self._host_valid[:old_n]
        mapping = np.full(old_n, -1, dtype=np.int64)
        keep = np.nonzero(live)[0]
        mapping[keep] = np.arange(len(keep), dtype=np.int64)
        self._host_rows = np.ascontiguousarray(self._host_rows[:old_n][live])
        self._host_valid = np.ones(len(keep), dtype=bool)
        self.n = len(keep)
        self.n_deleted = 0
        self.version += 1
        self._alloc(self._target_capacity(max(self.n, 1)))
        return mapping

    def grow_dim(self, new_dim: int) -> None:
        """Widen rows to ``new_dim`` bytes, zero-padding existing rows.

        Used by variable-width hamming stores (aspect-preserving compat
        phashes, reference src/image_hashes/phash.rs:7): when a wider hash
        arrives the whole store grows so no hash bits are ever truncated.
        """
        if new_dim <= self.dim:
            return
        grown = np.zeros((self._host_rows.shape[0], new_dim), dtype=np.uint8)
        grown[:, : self.dim] = self._host_rows
        self._host_rows = grown
        self.dim = int(new_dim)
        self.version += 1
        self._alloc(self._target_capacity(max(self.n, 1)))

    # ------------------------------------------------------------------ #
    # Access

    @property
    def device_index(self):
        """The packed device arrays for the scan kernels (padded/masked)."""
        if self._device_arrays is None:
            self._alloc(self._target_capacity(1))
        return self._device_arrays

    @property
    def size(self) -> int:
        """Number of live (non-deleted) rows."""
        return self.n - self.n_deleted

    def get_rows(self, row_ids) -> np.ndarray:
        return self._host_rows[np.asarray(row_ids, dtype=np.int64)]

    # ------------------------------------------------------------------ #
    # Checkpoint (the index-shard analog of the reference's "SQLite DB is
    # the checkpoint", SURVEY.md §5)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez_compressed(
            path,
            rows=self._host_rows[: self.n],
            valid=self._host_valid[: self.n],
            meta=np.frombuffer(
                json.dumps(
                    {"dim": self.dim, "kind": self.kind, "block_rows": self.block_rows}
                ).encode(),
                dtype=np.uint8,
            ),
        )

    @classmethod
    def load(cls, path: str, device: Optional[jax.Device] = None) -> "VectorStore":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            rows = z["rows"]
            valid = z["valid"]
        store = cls(
            dim=meta["dim"], kind=meta["kind"], block_rows=meta["block_rows"], device=device
        )
        store._host_rows = np.ascontiguousarray(rows, dtype=np.uint8)
        store._host_valid = np.ascontiguousarray(valid, dtype=bool)
        store.n = rows.shape[0]
        store.n_deleted = int(np.count_nonzero(~store._host_valid))
        store._alloc(store._target_capacity(max(store.n, 1)))
        return store
