"""Native runtime: ring queue correctness (threads + processes) and pacer."""

import multiprocessing as mp
import threading
import time

import pytest

from deeprecsys_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native runtime not built (no g++?)"
)

from deeprecsys_tpu.runtime.shm_queue import ShmRingQueue, Empty, pack_packet, unpack_packet
from deeprecsys_tpu.serving.packets import ServiceRequest, ServiceResponse


def test_pack_roundtrip():
    req = ServiceRequest(batch_id=7, epoch=2, batch_size=128, arrival_time=123.456,
                         sub_id=3, total_sub_batches=5, exp_packet=True)
    r2 = unpack_packet(pack_packet(req))
    assert r2 == req
    resp = ServiceResponse(consumer_id=4, epoch=1, batch_id=9, batch_size=64,
                           arrival_time=1.5, queue_start_time=1.6, queue_end_time=1.7,
                           inference_end_time=1.8, out_batch_size=64, sub_id=0,
                           total_sub_batches=2, exp_packet=False)
    assert unpack_packet(pack_packet(resp)) == resp
    assert unpack_packet(pack_packet(None)) is None
    # New POD fields ride the previously unused slots of the 64-byte
    # layout: request deadline (second double) and response error_code
    # (trailing byte).
    req_dl = ServiceRequest(batch_id=1, batch_size=8, arrival_time=9.25,
                            deadline=10.5)
    assert unpack_packet(pack_packet(req_dl)) == req_dl
    resp_err = ServiceResponse(consumer_id=2, batch_id=3, batch_size=8,
                               error_code=3)
    assert unpack_packet(pack_packet(resp_err)) == resp_err
    # Client-feature payloads cannot cross the fixed 64-byte slot — the
    # pack must fail LOUDLY, not silently serve synthetic rows.
    with pytest.raises(TypeError, match="payload"):
        pack_packet(ServiceRequest(batch_id=1, batch_size=2,
                                   payload=object()))


def test_reload_fragment_roundtrip_carries_gen():
    """Reload-path fragments tag every chunk with the request's gen so
    interleaved concurrent reloads reassemble per-request and ACKs resolve
    the handle that made the request (not whichever reload is newest)."""
    from deeprecsys_tpu.runtime.shm_queue import reload_fragments

    path = "/ckpts/" + "x" * 150  # multi-fragment (58-byte chunks)
    frags = reload_fragments(path, gen=201)
    assert len(frags) > 1
    assert [f.seq for f in frags] == list(range(len(frags)))
    out = [unpack_packet(pack_packet(f)) for f in frags]
    assert out == frags
    assert all(f.gen == 201 for f in out)
    assert b"".join(f.payload for f in out).decode() == path
    with pytest.raises(ValueError, match="gen"):
        reload_fragments(path, gen=256)


def test_fifo_and_empty():
    q = ShmRingQueue(capacity=8)
    with pytest.raises(Empty):
        q.get_nowait()
    for i in range(5):
        q.put(ServiceRequest(batch_id=i))
    assert q.qsize() == 5
    got = [q.get(timeout=1.0).batch_id for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    with pytest.raises(Empty):
        q.get(timeout=0.01)


def test_threaded_producers_consumers():
    q = ShmRingQueue(capacity=256)
    N, P, C = 2000, 4, 4
    seen = []
    lock = threading.Lock()

    def producer(base):
        for i in range(N // P):
            q.put(ServiceRequest(batch_id=base + i))

    def consumer():
        while True:
            try:
                item = q.get(timeout=1.0)
            except Empty:
                return
            if item is None:
                return
            with lock:
                seen.append(item.batch_id)

    ps = [threading.Thread(target=producer, args=(k * 100000,)) for k in range(P)]
    cs = [threading.Thread(target=consumer) for _ in range(C)]
    for t in ps + cs:
        t.start()
    for t in ps:
        t.join()
    for _ in range(C):
        q.put(None)
    for t in cs:
        t.join()
    assert len(seen) == N
    assert len(set(seen)) == N  # no duplicates, no losses


def _child_proc(name, n):
    from deeprecsys_tpu.runtime.shm_queue import ShmRingQueue

    q = ShmRingQueue(capacity=64, shm_name=name, create=False)
    for i in range(n):
        q.put(ServiceRequest(batch_id=1000 + i))
    q.close()


def test_cross_process_shared_memory():
    name = f"drs_test_{time.time_ns() % 100000}"
    q = ShmRingQueue(capacity=64, shm_name=name, create=True)
    try:
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=_child_proc, args=(name, 10))
        p.start()
        got = sorted(q.get(timeout=10.0).batch_id for _ in range(10))
        p.join()
        assert got == list(range(1000, 1010))
    finally:
        q.close()
        q.unlink()


def test_ring_full_put_times_out():
    q = ShmRingQueue(capacity=4)
    for i in range(4):
        q.put(ServiceRequest(batch_id=i))
    with pytest.raises(TimeoutError):
        q.put(ServiceRequest(batch_id=99), timeout=0.05)
    # Draining one slot unblocks the producer.
    assert q.get(timeout=1.0).batch_id == 0
    q.put(ServiceRequest(batch_id=99), timeout=1.0)
    got = [q.get(timeout=1.0).batch_id for _ in range(4)]
    assert got == [1, 2, 3, 99]


def test_precise_sleep():
    t0 = time.perf_counter()
    native.precise_sleep_ns(2_000_000)  # 2 ms
    dt = time.perf_counter() - t0
    assert 0.0019 < dt < 0.01


def test_native_split_hot_cold_matches_numpy():
    import numpy as np

    from deeprecsys_tpu.ops.embedding import split_hot_cold

    rng = np.random.default_rng(7)
    B, T, L = 16, 5, 9
    rows = np.array([300, 50, 1000, 4, 220])
    offsets = np.concatenate([[0], np.cumsum(rows[:-1])]).astype(np.int64)
    idx = (rng.integers(0, rows[None, :, None], size=(B, T, L))).astype(np.int32)
    hot_ids = np.sort(rng.choice(int(rows.sum()), size=64, replace=False)).astype(np.int64)

    ref = split_hot_cold(idx, offsets, hot_ids, impl="numpy")
    got = split_hot_cold(idx, offsets, hot_ids, impl="native")
    assert got["n_cold"] == ref["n_cold"]
    for k in ("hot_sel", "hot_mask", "cold_ids", "cold_seg"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)

    # Edge cases: empty hot set (all cold) and full hot set (all hot).
    for hids in (np.empty(0, np.int64), np.arange(rows.sum(), dtype=np.int64)):
        ref = split_hot_cold(idx, offsets, hids, impl="numpy")
        got = split_hot_cold(idx, offsets, hids, impl="native")
        assert got["n_cold"] == ref["n_cold"]
        for k in ("hot_sel", "hot_mask", "cold_ids", "cold_seg"):
            np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_native_lru_trace_matches_python_distribution():
    """The native LRU trace generator implements the same stack-distance
    model as the Python path: different RNG streams, same distribution.
    Compare hit-frequency profiles over a long stream."""
    import numpy as np

    from deeprecsys_tpu.data.trace import (
        NativeLruTrace,
        synthesize_zipf_distribution,
        trace_generate_lru,
        trace_profile,
    )

    la, sd, cdf = synthesize_zipf_distribution(300, alpha=1.2, num_samples=30000)
    N = 30_000
    nat = NativeLruTrace(list(la), sd, cdf, seed=3).generate(N)
    py = trace_generate_lru(list(la), sd, cdf, N, rng=np.random.default_rng(3))

    # Same line space and similar unique-introduction rate.
    assert set(nat.tolist()) <= set(la) and set(py) <= set(la)
    u_nat, u_py = len(set(nat.tolist())), len(set(py))
    assert abs(u_nat - u_py) / max(u_py, 1) < 0.15

    # Re-profiled stack-distance CDFs agree (the defining statistic).
    _, sds_nat = trace_profile(np.asarray(nat))
    _, sds_py = trace_profile(np.asarray(py))
    q_nat = np.percentile(sds_nat, [25, 50, 75, 90])
    q_py = np.percentile(sds_py, [25, 50, 75, 90])
    assert np.all(np.abs(q_nat - q_py) <= np.maximum(3, 0.2 * np.abs(q_py) + 3))


def test_trace_short_call_mode_matches_long_stream():
    """Regression: the introduced-lines counter i persists across short
    calls in BOTH impls (the generator calls in chunks of L), so chunked
    streams sample the same stack-distance distribution as one long call."""
    import numpy as np

    from deeprecsys_tpu.data.trace import (
        NativeLruTrace,
        synthesize_zipf_distribution,
        trace_generate_lru,
        trace_profile,
    )

    la, sd, cdf = synthesize_zipf_distribution(300, alpha=1.2, num_samples=30000)

    def chunked_python(n, chunk):
        lines, i, out = list(la), 0, []
        rng = np.random.default_rng(5)
        while len(out) < n:
            refs, i = trace_generate_lru(lines, sd, cdf, chunk, rng=rng,
                                         i_start=i, return_i=True)
            out.extend(refs)
        return np.asarray(out[:n])

    N, L = 24_000, 80
    py_chunked = chunked_python(N, L)
    py_long = np.asarray(trace_generate_lru(list(la), sd, cdf, N,
                                            rng=np.random.default_rng(5)))
    nat = NativeLruTrace(list(la), sd, cdf, seed=5)
    nat_chunked = np.concatenate([nat.generate(L) for _ in range(N // L)])

    qs = [25, 50, 75, 90]
    ref = np.percentile(trace_profile(py_long)[1], qs)
    for name, stream in (("py_chunked", py_chunked), ("native_chunked", nat_chunked)):
        got = np.percentile(trace_profile(stream)[1], qs)
        assert np.all(np.abs(got - ref) <= np.maximum(3, 0.25 * np.abs(ref) + 3)), \
            (name, got, ref)


def test_closed_ring_raises_instead_of_segfaulting():
    """put/get on a closed ShmRingQueue must raise ValueError — close()
    nulls the mapped pointer and the native side would dereference NULL
    (a SEGFAULT, found by tools/cpu_mp_soak.py's double server.stop())."""
    from deeprecsys_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime not built")
    from deeprecsys_tpu.runtime.shm_queue import ShmRingQueue

    q = ShmRingQueue(8, shm_name="drs_test_closed_ring", create=True)
    q.put(None)
    q.close()
    with pytest.raises(ValueError, match="closed"):
        q.put(None)
    with pytest.raises(ValueError, match="closed"):
        q.get_nowait()
    with pytest.raises(ValueError, match="closed"):
        q.qsize()
    q.unlink()


def test_packet_is_exactly_slot_sized():
    """The native ring memcpy's exactly 64 bytes per slot; a shorter bytes
    object would be over-read past its allocation (C++ drs_ring_push)."""
    from deeprecsys_tpu.runtime.shm_queue import pack_packet

    assert len(pack_packet(None)) == 64


def test_blob_arena_roundtrip_and_exhaustion():
    """runtime/blob_arena.py: payload batch in, scores out of the same
    slot, self-describing headers, allocator exhaustion is a loud error,
    and freed slots recycle."""
    import numpy as np

    from deeprecsys_tpu.runtime.blob_arena import BlobArena, slot_bytes_for

    n_rows, T, L, dd, od = 8, 4, 3, 5, 2
    sb = slot_bytes_for(n_rows, T, L, dd, od)
    assert sb % 64 == 0
    parent = BlobArena("drs_test_arena", n_slots=2, slot_bytes=sb, create=True)
    child = BlobArena("drs_test_arena", n_slots=2, slot_bytes=sb, create=False)
    try:
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 100, size=(n_rows, T, L)).astype(np.int32)
        dense = rng.normal(size=(n_rows, dd)).astype(np.float32)
        s1 = parent.alloc()
        s2 = parent.alloc()
        assert parent.in_flight() == 2
        with pytest.raises(RuntimeError, match="exhausted"):
            parent.alloc()
        parent.write_batch(s1, idx, dense)
        got_idx, got_dense, got_mask = child.read_batch(s1)
        np.testing.assert_array_equal(got_idx, idx)
        np.testing.assert_array_equal(got_dense, dense)
        assert got_mask is None
        # Ragged: the mask rides after dense (needs a with_mask-sized
        # arena; this slot fits because n_rows is small vs the 64-align).
        m_sb = slot_bytes_for(n_rows, T, L, dd, od, with_mask=True)
        assert m_sb >= sb
        marena = BlobArena("drs_test_arena_m", n_slots=1, slot_bytes=m_sb,
                           create=True)
        try:
            mask = rng.random((n_rows, T, L)) < 0.5
            marena.write_batch(0, idx, dense, mask=mask)
            mi, mdn, mm = marena.read_batch(0)
            np.testing.assert_array_equal(mi, idx)
            np.testing.assert_array_equal(mdn, dense)
            np.testing.assert_array_equal(mm, mask)
        finally:
            marena.close()
            marena.unlink()
        # Reading a batch slot as scores is a loud protocol error.
        with pytest.raises(ValueError, match="does not hold scores"):
            parent.read_scores(s1)
        scores = rng.normal(size=(n_rows, od)).astype(np.float32)
        child.write_scores(s1, scores)
        np.testing.assert_array_equal(parent.read_scores(s1), scores)
        # Dense-less payload round-trips too (ncf-class models).
        parent.write_batch(s2, idx, None)
        got_idx2, got_dense2, got_mask2 = child.read_batch(s2)
        np.testing.assert_array_equal(got_idx2, idx)
        assert got_dense2 is None and got_mask2 is None
        # An over-size payload is rejected before corrupting neighbors.
        big = rng.integers(0, 9, size=(n_rows * 3, T, L)).astype(np.int32)
        with pytest.raises(ValueError, match="exceeds"):
            parent.write_batch(s2, big, None)
        parent.free(s1)
        # Double free is a loud error (two owners would alias one slot's
        # bytes across processes), as is freeing outside the slot range.
        with pytest.raises(RuntimeError, match="double free"):
            parent.free(s1)
        with pytest.raises(ValueError, match="outside"):
            parent.free(parent.n_slots)
        parent.free(s2)
        assert parent.in_flight() == 0
        assert parent.alloc() in (s1, s2)  # recycled
    finally:
        child.close()
        parent.close()
        parent.unlink()
