from deeprecsys_tpu.data.generator import RecDataGenerator

__all__ = ["RecDataGenerator"]
