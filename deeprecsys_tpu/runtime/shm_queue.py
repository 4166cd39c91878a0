"""Zero-copy packet queue over the native MPMC ring.

Packets (ServiceRequest/ServiceResponse) serialize into one fixed 64-byte
POD slot — no pickling. The ring lives either in a private buffer (thread
mode) or a ``multiprocessing.shared_memory`` segment (process mode), so the
same queue type serves both the reference's thread handoffs
(``inferenceEngine.py:68-69``) and its process-level queues
(``DeepRecSys.py:44-51``).
"""

from __future__ import annotations

import ctypes
import struct
import time

from deeprecsys_tpu.runtime import native
from deeprecsys_tpu.serving.packets import ServiceRequest, ServiceResponse

# kind: 0=request, 1=response, 2=sentinel(None), 3=reload-path fragment
# Padded to EXACTLY the 64-byte slot: the C++ side memcpy's 64 bytes from
# the buffer (drs_runtime.cpp drs_ring_push), so a shorter bytes object
# would be over-read past its allocation.
# Field reuse across kinds: the second double slot carries the request's
# DEADLINE (queue_start_time is response-only); the trailing byte carries
# the response's error_code (requests have none).
_FMT = "<BB7i4dBx"  # kind, exp, [consumer,epoch,batch,bsz,sub,total,out], 4 times, err, pad
assert struct.calcsize(_FMT) == 64

_K_REQUEST, _K_RESPONSE, _K_SENTINEL, _K_RELOAD = 0, 1, 2, 3

# Reload fragments carry a checkpoint PATH across the POD ring in 58-byte
# utf-8 chunks (the zero-downtime reload side channel for cpu-mp process
# engines; paths up to 255*58 bytes). ``gen`` tags every fragment AND the
# engine's ACK with the reload request that produced it: without it, a
# superseding reload's ACK could resolve the wrong handle, and two
# concurrent producers' interleaved fragments could not be reassembled.
_FMT_RELOAD = "<BBBBB58sx"  # kind, gen, seq, total, frag_len, payload, pad
assert struct.calcsize(_FMT_RELOAD) == 64
_RELOAD_CHUNK = 58


import dataclasses as _dc


@_dc.dataclass(slots=True)
class ReloadFragment:
    """One 58-byte chunk of a checkpoint path (transport detail of the
    cpu-mp reload channel; engines reassemble per ``gen`` in sequence
    order and echo ``gen`` in the ACK)."""

    gen: int
    seq: int
    total: int
    payload: bytes


def reload_fragments(path: str, gen: int = 0) -> "list[ReloadFragment]":
    if not 0 <= gen <= 255:
        raise ValueError(f"gen must fit one byte; got {gen}")
    raw = path.encode()
    chunks = [raw[i:i + _RELOAD_CHUNK]
              for i in range(0, len(raw), _RELOAD_CHUNK)] or [b""]
    if len(chunks) > 255:
        raise ValueError(f"checkpoint path too long ({len(raw)} bytes)")
    return [ReloadFragment(gen=gen, seq=i, total=len(chunks), payload=c)
            for i, c in enumerate(chunks)]


def pack_packet(obj) -> bytes:
    if obj is None:
        return struct.pack(_FMT, _K_SENTINEL, 0, 0, 0, 0, 0, 0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0)
    if isinstance(obj, ReloadFragment):
        return struct.pack(_FMT_RELOAD, _K_RELOAD, obj.gen, obj.seq,
                           obj.total, len(obj.payload), obj.payload)
    if isinstance(obj, ServiceRequest):
        if obj.payload is not None:
            # An in-memory payload cannot cross the fixed 64-byte POD
            # slot — fail loudly instead of silently dropping the features
            # and serving synthetic rows. The cpu-mp transport for real
            # inference is the blob arena: stage the arrays with
            # BlobArena.write_batch and send payload_slot instead
            # (serving/ingress.py does this for /v1/predict).
            raise TypeError(
                "payload-carrying requests cannot cross the POD ring; "
                "stage the features in the BlobArena and set payload_slot "
                "(or use in-process thread engines)")
        # Requests reuse the response-only consumer_id int for the blob-
        # arena slot id (-1 = no payload slot) — the cpu-mp real-inference
        # transport (runtime/blob_arena.py).
        return struct.pack(
            _FMT, _K_REQUEST, int(obj.exp_packet), obj.payload_slot,
            obj.epoch, obj.batch_id,
            obj.batch_size, obj.sub_id, obj.total_sub_batches, 0,
            obj.arrival_time, obj.deadline, 0.0, 0.0, 0,
        )
    if isinstance(obj, ServiceResponse):
        return struct.pack(
            _FMT, _K_RESPONSE, int(obj.exp_packet), obj.consumer_id, obj.epoch,
            obj.batch_id, obj.batch_size, obj.sub_id, obj.total_sub_batches,
            obj.out_batch_size, obj.arrival_time, obj.queue_start_time,
            obj.queue_end_time, obj.inference_end_time, obj.error_code,
        )
    raise TypeError(f"cannot pack {type(obj)}")


def unpack_packet(buf: bytes):
    if buf[0] == _K_RELOAD:
        _, gen, seq, total, n, payload = struct.unpack_from(_FMT_RELOAD, buf)
        return ReloadFragment(gen=gen, seq=seq, total=total,
                              payload=payload[:n])
    (kind, exp, consumer, epoch, batch_id, bsz, sub, total, out,
     arr, qs, qe, inf, err) = struct.unpack_from(_FMT, buf)
    if kind == _K_SENTINEL:
        return None
    if kind == _K_REQUEST:
        return ServiceRequest(batch_id=batch_id, epoch=epoch, batch_size=bsz,
                              arrival_time=arr, sub_id=sub, total_sub_batches=total,
                              exp_packet=bool(exp), deadline=qs,
                              payload_slot=consumer)
    return ServiceResponse(consumer_id=consumer, epoch=epoch, batch_id=batch_id,
                           batch_size=bsz, arrival_time=arr, queue_start_time=qs,
                           queue_end_time=qe, inference_end_time=inf,
                           out_batch_size=out, sub_id=sub, total_sub_batches=total,
                           exp_packet=bool(exp), error_code=err)


from deeprecsys_tpu.runtime import Empty  # noqa: E402 — canonical home


class ShmRingQueue:
    """queue.Queue-compatible subset backed by the native MPMC ring."""

    def __init__(self, capacity: int = 1024, shm_name: str | None = None, create: bool = True):
        import threading

        self._lib = native.get_lib()
        self._op_lock = threading.Lock()
        cap = 1
        while cap < capacity:
            cap *= 2
        self.capacity = cap
        nbytes = int(self._lib.drs_ring_bytes(cap))
        self._shm = None
        if shm_name is None:
            # RingHeader's head/tail are alignas(64) (cache-line separated);
            # malloc-backed buffers only guarantee ~16 bytes, so over-
            # allocate and round the base up (the shm path is page-aligned
            # already). Placement-new into under-aligned storage is UB and
            # silently loses the false-sharing separation the alignas buys.
            self._buf = ctypes.create_string_buffer(nbytes + 64)
            base = ctypes.addressof(self._buf)
            self._mem = ctypes.c_void_p((base + 63) & ~63)
            self._lib.drs_ring_init(self._mem, cap)
        else:
            from multiprocessing import shared_memory

            if create:
                self._shm = shared_memory.SharedMemory(name=shm_name, create=True, size=nbytes)
            else:
                self._shm = shared_memory.SharedMemory(name=shm_name)
            self._mem = ctypes.c_void_p(
                ctypes.addressof(ctypes.c_char.from_buffer(self._shm.buf))
            )
            if create:
                self._lib.drs_ring_init(self._mem, cap)
        self.name = shm_name

    # -- queue.Queue subset -------------------------------------------

    # Close-vs-in-flight safety: close() unmaps the shm, so any native
    # call racing it would dereference freed memory (SIGSEGV, not an
    # exception). _op_lock serializes THIS PROCESS's native calls against
    # close(); it is held only across one bounded native call at a time
    # (the put retry loop re-takes it per attempt), and cross-process
    # concurrency is untouched (the native ring is MPMC; other processes
    # hold their own mappings). Blocking get() waits are chunked so a
    # pending close() is observed within ~50 ms.
    _WAIT_CHUNK_NS = 50_000_000

    def _checked_mem(self):
        # Caller must hold _op_lock. close() nulls _mem under the lock.
        if self._mem is None:
            raise ValueError("ring is closed")
        return self._mem

    def put(self, obj, timeout: float | None = None):
        data = pack_packet(obj)
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._op_lock:
                if self._lib.drs_ring_push(self._checked_mem(), data) == 0:
                    return
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError("ring full")
            time.sleep(0.00005)

    def get(self, timeout: float | None = None):
        out = ctypes.create_string_buffer(64)
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            if deadline is None:
                t_ns = self._WAIT_CHUNK_NS
            else:
                left = deadline - time.monotonic()
                if left <= 0:
                    raise Empty()
                t_ns = min(int(left * 1e9), self._WAIT_CHUNK_NS)
            with self._op_lock:
                rc = self._lib.drs_ring_pop_wait(self._checked_mem(), out, t_ns)
            if rc == 0:
                return unpack_packet(out.raw)
            if deadline is not None and time.monotonic() >= deadline:
                raise Empty()

    def get_nowait(self):
        out = ctypes.create_string_buffer(64)
        with self._op_lock:
            if self._lib.drs_ring_pop(self._checked_mem(), out) != 0:
                raise Empty()
        return unpack_packet(out.raw)

    def qsize(self) -> int:
        with self._op_lock:
            return int(self._lib.drs_ring_approx_size(self._checked_mem()))

    def close(self):
        if self._shm is not None:
            with self._op_lock:
                self._mem = None
                self._shm.close()

    def unlink(self):
        if self._shm is not None:
            self._shm.unlink()
