from deeprecsys_tpu.utils.timing import time_jitted_chain

__all__ = ["time_jitted_chain"]
