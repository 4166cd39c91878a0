"""Native (C++) runtime support: lock-free packet IPC and precise pacing.

See ``cpp/drs_runtime.cpp`` for the rationale vs. the reference's
multiprocessing.Queue + Python busy-wait hot paths.
"""

from deeprecsys_tpu.runtime.native import native_available, precise_sleep_ns


class Empty(Exception):
    """Raised by ShmRingQueue.get_nowait on an empty ring. Lives here
    (dependency-free) so consumers that must catch both stdlib
    queue.Empty and the ring's Empty need no import guard."""


__all__ = ["Empty", "native_available", "precise_sleep_ns"]
