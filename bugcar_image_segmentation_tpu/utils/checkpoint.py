"""Checkpoint save/load — the train→deploy bridge.

The reference's model state lives in frozen ``.pb``/``.h5`` files written
by ``freeze_session`` (reference utils.py:49-83); its pipeline state is
the calibration JSON.  Here the deployment format is a msgpack-serialized
Flax variable dict (via ``flax.serialization``) with a small JSON sidecar
recording the model config — self-describing, dependency-light, and
loadable into any engine whose architecture matches.  Orbax is used for
full training-state checkpoints (optimizer state included) when resuming
training rather than deploying.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..configs import ModelConfig


_SIDE_CAR = ".config.json"


def save_variables(path: str, variables: dict,
                   cfg: Optional[ModelConfig] = None) -> None:
    """Serialize a Flax variable dict (params + batch stats) to msgpack."""
    from flax import serialization

    variables = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    if cfg is not None:
        with open(path + _SIDE_CAR, "w") as f:
            json.dump(dataclasses.asdict(cfg), f)


def load_variables(path: str) -> Tuple[dict, Optional[ModelConfig]]:
    """Load a msgpack checkpoint (+ its config sidecar if present)."""
    from flax import serialization

    with open(path, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    cfg = None
    if os.path.exists(path + _SIDE_CAR):
        with open(path + _SIDE_CAR) as f:
            raw = json.load(f)
        raw["image_mean"] = tuple(raw.get("image_mean", ()))
        raw["image_std"] = tuple(raw.get("image_std", ()))
        cfg = ModelConfig(**raw)
    return variables, cfg


def save_train_state(directory: str, state, step: Optional[int] = None
                     ) -> None:
    """Orbax checkpoint of a full TrainState (resume-able training)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step if step is not None else int(state.step)}"),
               state)
    ckptr.wait_until_finished()


def restore_train_state(directory: str, template, step: int):
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template`` is a matching abstract/concrete state providing the tree
    structure and dtypes.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.join(os.path.abspath(directory), f"step_{step}"), template)


__all__ = ["save_variables", "load_variables", "save_train_state",
           "restore_train_state"]
