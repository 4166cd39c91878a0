"""Request/response packets.

Reference: ``utils/packets.py`` — ``ServiceRequest`` carries
(batch_id, epoch, arrival_time, batch_size, sub_id, total_sub_batches,
exp_packet); ``ServiceResponse`` adds consumer id, queue/inference
timestamps and the measured output batch size. ``exp_packet`` marks
warm-up/tuning traffic excluded from final metrics
(``DeepRecSys.py:128-129``).

Slotted dataclasses: these packets cross queues millions of times per run;
fixed layout also maps 1:1 onto the native shared-memory ring buffer in
``deeprecsys_tpu/runtime`` (a packet is plain ints/floats/bools).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(slots=True)
class ServiceRequest:
    batch_id: int = 0
    epoch: int = 0
    batch_size: int = 0
    arrival_time: float = 0.0
    sub_id: int = 0
    total_sub_batches: int = 1
    exp_packet: bool = False


@dataclasses.dataclass(slots=True)
class ServiceResponse:
    consumer_id: int = 0
    epoch: int = 0
    batch_id: int = 0
    batch_size: int = 0
    arrival_time: float = 0.0
    queue_start_time: float = 0.0
    queue_end_time: float = 0.0
    inference_end_time: float = 0.0
    out_batch_size: int = 0
    sub_id: int = 0
    total_sub_batches: int = 1
    exp_packet: bool = False

    def latency(self) -> float:
        return self.inference_end_time - self.arrival_time
