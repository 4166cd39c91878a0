from deeprecsys_tpu.ops.embedding import (
    embedding_bag,
    embedding_bag_packed,
    init_fused_tables,
    pack_table,
    unpack_table,
)
from deeprecsys_tpu.ops.mlp import mlp_init, mlp_apply
from deeprecsys_tpu.ops.interactions import dot_interaction, cat_interaction
from deeprecsys_tpu.ops.rnn import basic_rnn_init, basic_rnn_scan

__all__ = [
    "embedding_bag",
    "embedding_bag_packed",
    "init_fused_tables",
    "pack_table",
    "unpack_table",
    "mlp_init",
    "mlp_apply",
    "dot_interaction",
    "cat_interaction",
    "basic_rnn_init",
    "basic_rnn_scan",
]
