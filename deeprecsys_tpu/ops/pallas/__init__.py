from deeprecsys_tpu.ops.pallas.embedding_kernel import pallas_embedding_bag

__all__ = ["pallas_embedding_bag"]
