"""Native (C++) runtime support: lock-free packet IPC and precise pacing.

See ``cpp/drs_runtime.cpp`` for the rationale vs. the reference's
multiprocessing.Queue + Python busy-wait hot paths.
"""

from deeprecsys_tpu.runtime.native import native_available, precise_sleep_ns

__all__ = ["native_available", "precise_sleep_ns"]
