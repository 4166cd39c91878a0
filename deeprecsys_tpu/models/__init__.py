"""Model registry.

``get_model(cfg)`` returns the (init, apply) pair for a config's
``model_type``, with ``apply`` closed over the config — the functional
equivalent of the reference's ``<X>_Wrapper(cli_args)`` dispatch in
``inferenceEngine.py:80-135``.
"""

from __future__ import annotations

import functools

import jax

from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.models.base import Batch, ModelFns
from deeprecsys_tpu.models import dlrm, wide_and_deep, multi_task_wnd, ncf, din, dien

_REGISTRY = {
    "dlrm": dlrm,
    "wnd": wide_and_deep,
    "mtwnd": multi_task_wnd,
    "ncf": ncf,
    "din": din,
    "dien": dien,
}


def get_model(cfg: ModelConfig) -> ModelFns:
    mod = _REGISTRY[cfg.model_type]
    return ModelFns(
        name=cfg.model_name,
        init=functools.partial(mod.init, cfg=cfg),
        apply=functools.partial(mod.apply, cfg=cfg),
        cfg=cfg,
        apply_from_pooled=functools.partial(mod.apply_from_pooled, cfg=cfg),
    )


# Model families whose reference graphs end in a Sigmoid (scores are
# probabilities): dlrm_s_caffe2.py:268-272 (sigmoid_top = last layer),
# wide_and_deep.py / multi_task_wnd.py same. ncf/din/dien emit raw
# FC/ReLU scores (din.py create_mlp has no sigmoid path) — losses must
# treat those as logits (parallel/sharding.py::loss_fn_for).
_SIGMOID_OUTPUT_TYPES = frozenset({"dlrm", "wnd", "mtwnd"})


def sigmoid_output(cfg: ModelConfig) -> bool:
    """Whether this model's apply() returns sigmoid probabilities."""
    return cfg.model_type in _SIGMOID_OUTPUT_TYPES


__all__ = ["get_model", "Batch", "ModelFns", "sigmoid_output"]
