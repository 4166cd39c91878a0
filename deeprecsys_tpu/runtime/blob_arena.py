"""Shared-memory blob arena: variable-size payloads for cpu-mp engines.

The cpu-mp topology's transport is the native 64-byte POD ring
(runtime/shm_queue.py) — deliberately fixed-size, so real-inference
payloads (client feature arrays) could not cross it and ``/v1/predict``
refused the process backend (round-3 asymmetry). This module closes that:
a SharedMemory segment of fixed slots carries the arrays, and the POD
packet carries only the SLOT ID (``ServiceRequest.payload_slot``).

Ownership protocol (single-allocator, zero cross-process locking):

- The PARENT allocates a slot (in-parent free list + lock), writes the
  request's feature batch, and enqueues the request packet. The ring
  push/pop pair is release/acquire (native MPMC), so the slot bytes are
  visible to the engine child before it can see the packet.
- The CHILD reads the batch (copied out — it will overwrite the slot),
  runs it, writes the scores back into the SAME slot, then pushes the
  response packet: again push-after-write orders the bytes before the
  parent's read.
- The PARENT reads the scores when the response arrives and returns the
  slot to the free list. Error responses (deadline, over-ladder,
  readback) free the slot without reading. A slot whose engine dies
  mid-flight leaks until the arena is unlinked at server stop — bounded
  by the slot count, and the death already degrades the run.

Slots are self-describing (n_rows/T/L/dense_dim in a header), sized at
creation for the largest sub-request the serving config can produce.
The reference has no analog: its engines only ever run pre-generated
synthetic rows (inferenceEngine.py:200-206).
"""

from __future__ import annotations

import threading

import numpy as np

# Slot header: kind, n_rows, T, L, dense_dim, out_dim|has_mask (int32
# each). The last word is out_dim for score slots and the ragged-mask
# flag for batch slots (a batch never needs out_dim; scores never carry
# a mask).
_HDR_WORDS = 6
_HDR_BYTES = _HDR_WORDS * 4
_K_BATCH, _K_SCORES = 1, 2


def slot_bytes_for(n_rows: int, num_tables: int, lookups: int,
                   dense_dim: int, out_dim: int,
                   with_mask: bool = False) -> int:
    """Slot size holding either a payload batch or its scores, 64-aligned.
    ``with_mask``: reserve room for the ragged slot mask (1 byte per
    lookup slot — only when the serving config accepts ragged input)."""
    payload = n_rows * (num_tables * lookups * 4 + dense_dim * 4)
    if with_mask:
        payload += n_rows * num_tables * lookups
    scores = n_rows * out_dim * 4
    n = _HDR_BYTES + max(payload, scores)
    return -(-n // 64) * 64


class BlobArena:
    """Fixed-slot payload arena over multiprocessing SharedMemory.

    ``create=True`` (parent) owns allocation and unlinking; children
    attach by name and only read/write slots handed to them via packets.
    """

    def __init__(self, name: str, n_slots: int, slot_bytes: int,
                 create: bool = True):
        from multiprocessing import shared_memory

        self.n_slots = int(n_slots)
        self.slot_bytes = int(slot_bytes)
        self.name = name
        self._created = create
        size = self.n_slots * self.slot_bytes
        if create:
            self._shm = shared_memory.SharedMemory(name=name, create=True,
                                                   size=size)
        else:
            self._shm = shared_memory.SharedMemory(name=name)
        self._free = list(range(self.n_slots)) if create else None
        self._free_set = set(self._free) if create else None
        self._lock = threading.Lock() if create else None

    # -- parent-side allocation ----------------------------------------

    def alloc(self) -> int:
        with self._lock:
            if not self._free:
                raise RuntimeError(
                    f"payload arena exhausted ({self.n_slots} slots in "
                    f"flight); raise the slot count or apply client-side "
                    f"backpressure")
            slot = self._free.pop()
            self._free_set.discard(slot)
            return slot

    def free(self, slot: int):
        # Double-free guard: a slot returned twice would be handed to two
        # concurrent queries, which then alias one slot's bytes across
        # processes — silent payload/score corruption. Fail loudly instead
        # (the router's pop-from-_slot_owners makes this unreachable today;
        # the guard keeps it that way).
        with self._lock:
            if not 0 <= slot < self.n_slots:
                raise ValueError(
                    f"free of slot {slot} outside [0, {self.n_slots})")
            if slot in self._free_set:
                raise RuntimeError(f"double free of arena slot {slot}")
            self._free.append(slot)
            self._free_set.add(slot)

    def in_flight(self) -> int:
        with self._lock:
            return self.n_slots - len(self._free)

    # -- slot IO ----------------------------------------------------------

    def _view(self, slot: int) -> memoryview:
        if not 0 <= slot < self.n_slots:
            raise ValueError(f"slot {slot} out of range [0, {self.n_slots})")
        off = slot * self.slot_bytes
        return self._shm.buf[off: off + self.slot_bytes]

    def write_batch(self, slot: int, indices: np.ndarray,
                    dense: "np.ndarray | None",
                    mask: "np.ndarray | None" = None):
        """Parent: stage one sub-request's features into ``slot``.
        ``mask``: optional (n, T, L) bool ragged slot mask (1 byte each,
        after dense — needs a ``with_mask``-sized arena)."""
        n, T, L = indices.shape
        dd = 0 if dense is None else int(dense.shape[1])
        body = indices.astype(np.int32, copy=False).tobytes()
        if dense is not None:
            body += dense.astype(np.float32, copy=False).tobytes()
        if mask is not None:
            body += mask.astype(np.bool_, copy=False).tobytes()
        if _HDR_BYTES + len(body) > self.slot_bytes:
            raise ValueError(
                f"payload ({_HDR_BYTES + len(body)} B) exceeds the arena "
                f"slot size ({self.slot_bytes} B)")
        view = self._view(slot)
        view[:_HDR_BYTES] = np.asarray(
            [_K_BATCH, n, T, L, dd, 0 if mask is None else 1],
            dtype=np.int32).tobytes()
        view[_HDR_BYTES:_HDR_BYTES + len(body)] = body

    def read_batch(self, slot: int):
        """Child: (indices (n,T,L) i32, dense (n,dd) f32 | None,
        mask (n,T,L) bool | None) — COPIES, because the child will
        overwrite the slot with scores."""
        view = self._view(slot)
        kind, n, T, L, dd, has_mask = np.frombuffer(view[:_HDR_BYTES],
                                                    np.int32)
        if kind != _K_BATCH:
            raise ValueError(f"slot {slot} does not hold a batch (kind {kind})")
        ib = int(n) * int(T) * int(L) * 4
        idx = np.frombuffer(view[_HDR_BYTES:_HDR_BYTES + ib],
                            np.int32).reshape(n, T, L).copy()
        off = _HDR_BYTES + ib
        dense = None
        if dd:
            db = int(n) * int(dd) * 4
            dense = np.frombuffer(view[off:off + db],
                                  np.float32).reshape(n, dd).copy()
            off += db
        mask = None
        if has_mask:
            mb = int(n) * int(T) * int(L)
            mask = np.frombuffer(view[off:off + mb],
                                 np.bool_).reshape(n, T, L).copy()
        return idx, dense, mask

    def write_scores(self, slot: int, scores: np.ndarray):
        """Child: overwrite the slot with this request's (n, out_dim) f32
        scores (the payload was copied out at read_batch)."""
        n, od = scores.shape
        body = scores.astype(np.float32, copy=False).tobytes()
        if _HDR_BYTES + len(body) > self.slot_bytes:
            raise ValueError(
                f"scores ({_HDR_BYTES + len(body)} B) exceed the arena "
                f"slot size ({self.slot_bytes} B)")
        view = self._view(slot)
        view[:_HDR_BYTES] = np.asarray(
            [_K_SCORES, n, 0, 0, 0, od], dtype=np.int32).tobytes()
        view[_HDR_BYTES:_HDR_BYTES + len(body)] = body

    def read_scores(self, slot: int) -> np.ndarray:
        view = self._view(slot)
        kind, n, _, _, _, od = np.frombuffer(view[:_HDR_BYTES], np.int32)
        if kind != _K_SCORES:
            raise ValueError(
                f"slot {slot} does not hold scores (kind {kind}) — the "
                f"engine answered without writing them")
        nb = int(n) * int(od) * 4
        return np.frombuffer(view[_HDR_BYTES:_HDR_BYTES + nb],
                             np.float32).reshape(n, od).copy()

    # -- lifecycle ------------------------------------------------------

    def close(self):
        self._shm.close()

    def unlink(self):
        if self._created:
            self._shm.unlink()
