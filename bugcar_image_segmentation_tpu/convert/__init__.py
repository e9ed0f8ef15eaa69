"""Deploy-format bridges: reference weight files → Flax variables.

- :mod:`~.tf_graphdef` — frozen TF1 ``.pb`` GraphDefs (enet.pb/deeplab.pb,
  reference models.py:21-31) → Flax, by zipping graph execution order onto
  Flax parameter-creation order with per-leaf shape checks.
- :mod:`~.keras_h5` — Keras ``model.h5`` → Flax via the same pouring
  machinery.
- :mod:`~.tf_enet` — the reverse bridge: trained Flax ENet variables →
  frozen era-correct ``.pb`` with the reference's tensor contract
  (``freeze_session``, reference utils.py:49-83).
- :mod:`~.torch_segformer` — HF/NVlabs SegFormer torch checkpoints →
  Flax, parity-proven against the official torch forward.

All imports of TF/h5py are lazy: conversion is offline tooling, never on
the inference path.
"""

from .tf_graphdef import (OpExtract, convert_frozen_graph, extract_ops,
                          load_graphdef, param_creation_order,
                          pour_into_module)
from .keras_h5 import convert_keras_h5, extract_h5_ops
from .tf_enet import build_enet_tf, export_enet_pb, freeze_function
from .torch_segformer import (convert_hf_model, convert_state_dict,
                              load_torch_segformer)

__all__ = [
    "OpExtract", "convert_frozen_graph", "extract_ops", "load_graphdef",
    "param_creation_order", "pour_into_module",
    "convert_keras_h5", "extract_h5_ops",
    "build_enet_tf", "export_enet_pb", "freeze_function",
    "convert_hf_model", "convert_state_dict", "load_torch_segformer",
]
