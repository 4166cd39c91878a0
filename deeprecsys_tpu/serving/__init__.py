from deeprecsys_tpu.serving.packets import ServiceRequest, ServiceResponse
from deeprecsys_tpu.serving.scheduler import DeepRecScheduler
from deeprecsys_tpu.serving.load_generator import LoadGenerator
from deeprecsys_tpu.serving.orchestrator import run_serving, ServingResult

__all__ = [
    "ServiceRequest",
    "ServiceResponse",
    "DeepRecScheduler",
    "LoadGenerator",
    "run_serving",
    "ServingResult",
]
