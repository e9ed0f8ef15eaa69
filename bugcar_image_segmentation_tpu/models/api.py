"""Inference engines: the reference's model API, jit-compiled end to end.

Plays the role of the reference's ``InferenceModel`` ABC and its ``ENET`` /
``DeepLabV3`` engines (reference models.py:8-136), with the host/device
choreography inverted: where the reference runs preprocess on CPU, crosses
to the GPU for ``sess.run``, comes back, and crosses again for the eager
argmax+remap (SURVEY.md §3.1 boundaries #1/#2), an ``Engine`` here compiles

    uint8 BGR frame → resize/normalize → backbone → argmax → 3-class remap

into ONE XLA program.  The only per-frame host↔device traffic is the raw
frame in and the uint8 class map (or int8 grid, see pipeline.py) out.

Engines are constructed from a :class:`~..configs.ModelConfig` plus either
converted reference weights (convert/) or a checkpoint; absent both they
self-initialize (useful for benchmarks and tests — the compute graph is
identical regardless of where the numbers came from).
"""

from __future__ import annotations


import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModelConfig
from ..ops.resize import upsample_nearest_int
from . import preprocess as pre
from . import remap


class Engine:
    """A segmentation backbone compiled into a frame→class-map program.

    Args:
      module: a Flax module with ``__call__(x, train=False) -> logits``
        taking NHWC float input and returning NHWC logits.
      cfg: model geometry / normalization constants.
      variables: Flax variable dict (``{"params": ..., "batch_stats": ...}``).
        If None, initialized with ``jax.random.PRNGKey(0)`` — random weights,
        real architecture.
      remap_table: backbone-class → drivability-class table
        (default: the ENet table, reference models.py:57-58).
    """

    def __init__(self,
                 module: Any,
                 cfg: ModelConfig,
                 variables: Optional[dict] = None,
                 remap_table: Optional[np.ndarray] = None,
                 apply_fn: Optional[Callable] = None):
        self.module = module
        self.cfg = cfg
        # Alternate executor over the SAME variable tree (e.g. the
        # fused-Pallas ENet trunk, models/enet_fused.py); None = the
        # module's own apply.
        self.apply_fn = apply_fn or module.apply
        self.remap_table = (remap.remap_table(cfg.num_classes)
                            if remap_table is None else remap_table)
        # Labels come out of the head at input_res / label_scale
        # (quarter-resolution heads argmax at the decoder's native 1/4
        # res; _to_input_res lifts).  Consumers that can sample the
        # small map directly (the native grid path, grid.py
        # ``label_scale``) read this to skip the lift.
        self.label_scale = (4 if getattr(module, "head_upsample", "full")
                            == "quarter" else 1)
        if variables is None:
            dummy = jnp.zeros((1, cfg.input_height, cfg.input_width, 3),
                              jnp.dtype(cfg.dtype))
            # Jit the init: eager flax init dispatches (and on a remote
            # TPU, individually compiles) every parameter op — measured
            # ~0.4 s/op through the tunnel, minutes for a transformer.
            # One jitted program compiles once and caches.
            variables = jax.jit(
                functools.partial(module.init, train=False))(
                    jax.random.PRNGKey(0), dummy)
        self.variables = variables

        # Variables are ARGUMENTS of every jitted program (not trace-time
        # closures), so load_variables() takes effect without recompiling
        # — the weights are already on device, passing the tree is free.
        self._predict = jax.jit(self._predict_impl)
        self._predict_binary = jax.jit(self._predict_binary_impl)
        self._logits = jax.jit(self._logits_impl)
        self._predict_pre = jax.jit(self._predict_pre_impl)
        self._predict_pre_binary = jax.jit(self._predict_pre_binary_impl)

    # -- pure jitted bodies --------------------------------------------------

    def _forward(self, variables: dict, frames_bgr: jax.Array) -> jax.Array:
        x = pre.preprocess_for_config(frames_bgr, self.cfg)
        return self.apply_fn(variables, x, train=False)

    def _to_input_res(self, labels: jax.Array) -> jax.Array:
        """Lift a reduced-resolution LABEL map back to input resolution.

        Backbones may emit logits below input resolution (SegFormer
        ``head_upsample="quarter"`` skips the f32 ×4 logits upsample);
        the argmax then runs at that resolution and the uint8 labels are
        nearest-replicated here — inside the same jitted program — so
        ``predict``'s output contract (input-resolution map, reference
        models.py:42-69) holds for every backbone.
        """
        h, w = labels.shape[-2], labels.shape[-1]
        ih, iw = self.cfg.input_height, self.cfg.input_width
        if (h, w) == (ih, iw):
            return labels
        if ih % h or iw % w or ih // h != iw // w:
            raise ValueError(
                f"model label map {(h, w)} is not an integer factor of "
                f"the input resolution {(ih, iw)}")
        return upsample_nearest_int(labels, ih // h)

    def _logits_impl(self, variables: dict,
                     frames_bgr: jax.Array) -> jax.Array:
        return self._forward(variables, frames_bgr)

    def _predict_impl(self, variables: dict,
                      frames_bgr: jax.Array) -> jax.Array:
        return self._to_input_res(remap.logits_to_drivability(
            self._forward(variables, frames_bgr), self.remap_table))

    def _predict_binary_impl(self, variables: dict,
                             frames_bgr: jax.Array) -> jax.Array:
        return self._to_input_res(remap.logits_to_binary_road(
            self._forward(variables, frames_bgr)))

    def _predict_pre_impl(self, variables: dict, x: jax.Array) -> jax.Array:
        # From an already-preprocessed NHWC batch (the reference's
        # predict() contract, models.py:42 — preprocess was a separate
        # host step there).
        logits = self.apply_fn(variables, x, train=False)
        return self._to_input_res(
            remap.logits_to_drivability(logits, self.remap_table))

    def _predict_pre_binary_impl(self, variables: dict,
                                 x: jax.Array) -> jax.Array:
        logits = self.apply_fn(variables, x, train=False)
        return self._to_input_res(remap.logits_to_binary_road(logits))

    # -- public API (reference models.py:42/70 equivalents) ------------------

    def _batched(self, fn: Callable, frames_bgr) -> jax.Array:
        frames = jnp.asarray(frames_bgr)
        if frames.ndim == 3:
            return fn(self.variables, frames[None])[0]
        return fn(self.variables, frames)

    def predict(self, frames_bgr) -> jax.Array:
        """BGR uint8 frame(s) → uint8 3-class drivability map(s).

        Accepts (H, W, 3) or (B, H, W, 3); output spatial size is the
        model's input resolution, like the reference's (models.py:42-69).
        """
        return self._batched(self._predict, frames_bgr)

    def predict_binary(self, frames_bgr) -> jax.Array:
        """BGR uint8 frame(s) → uint8 {0,1} road mask(s)
        (reference models.py:70-82)."""
        return self._batched(self._predict_binary, frames_bgr)

    def logits(self, frames_bgr) -> jax.Array:
        """Raw class logits, for eval / distillation."""
        return self._batched(self._logits, frames_bgr)

    # -- weights --------------------------------------------------------------

    def load_variables(self, variables: dict) -> None:
        """Swap in converted/trained weights (same tree structure).

        Takes effect immediately on all compiled programs — weights are a
        runtime argument, never a compile-time constant.
        """
        jax.tree_util.tree_map(lambda a, b: None, self.variables, variables)
        self.variables = variables


def build_engine(name: str = "enet",
                 cfg: Optional[ModelConfig] = None,
                 variables: Optional[dict] = None) -> Engine:
    """Factory covering the reference's model zoo by name.

    ``enet`` (models.py:14), ``deeplab`` (models.py:98), ``unet``
    (the Keras model.h5 configuration), ``segformer`` (BASELINE config 5).
    """
    name = name.lower()
    apply_fn = None
    if name == "enet":
        from .enet import ENet
        cfg = cfg or ModelConfig()
        module = ENet(num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype))
    elif name == "enet_fused":
        # Same module/variable tree as "enet"; forward runs the Pallas
        # fused-bottleneck trunk (models/enet_fused.py).
        from .enet import ENet
        from .enet_fused import FusedENetApply
        cfg = cfg or ModelConfig(name="enet_fused")
        module = ENet(num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype))
        apply_fn = FusedENetApply(cfg.num_classes, jnp.dtype(cfg.dtype))
    elif name in ("deeplab", "deeplab_q"):
        # "_q": quarter-resolution head — inference logits stay at the
        # decoder's native 1/4 res; Engine nearest-lifts the uint8
        # labels (same scheme as segformer_*_q, PERF.md round 3c).
        from .deeplab import DeepLabV3
        cfg = cfg or ModelConfig(name=name, input_width=1024,
                                 input_height=512, num_classes=15)
        module = DeepLabV3(
            num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            head_upsample="quarter" if name.endswith("_q") else "full")
    elif name == "unet":
        from .unet import UNet
        cfg = cfg or ModelConfig(name="unet", input_width=512,
                                 input_height=256, num_classes=15)
        module = UNet(num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype))
    elif name in ("deeplab_xception", "xception",
                  "deeplab_xception_q", "xception_q"):
        # Architecture-faithful twin of the actual deeplab.pb export
        # (Xception-65 backbone) — the variant the real blob pours into.
        from .xception import Xception65DeepLab
        cfg = cfg or ModelConfig(name="deeplab_xception", input_width=1024,
                                 input_height=512, num_classes=15)
        module = Xception65DeepLab(
            num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            head_upsample="quarter" if name.endswith("_q") else "full")
    elif name == "segformer" or name.startswith("segformer_"):
        from .segformer import SEGFORMER_PRESETS, SegFormer
        # Name grammar: "segformer[_bN][_q][_int8]" with the flags in any
        # order — e.g. "segformer_b2", "segformer_int8" (B0 + int8 W8A8
        # MXU path, same param tree as float: ops/quant.py),
        # "segformer_b0_q" (quarter-resolution head: argmax at 1/4 res +
        # nearest label replication, skipping the f32 logits upsample —
        # models/segformer.py head_upsample), "segformer_b3_q_int8".
        tokens = name.split("_")[1:]
        quant = "int8" in tokens
        quarter = "q" in tokens
        rest = [t for t in tokens if t not in ("int8", "q")]
        if len(rest) > 1 or (rest and rest[0] not in SEGFORMER_PRESETS):
            raise ValueError(
                f"unknown SegFormer variant {name!r}; grammar is "
                f"segformer[_size][_q][_int8] with size in "
                f"{sorted(SEGFORMER_PRESETS)}")
        size = rest[0] if rest else "b0"
        cfg = cfg or ModelConfig(name=name, input_width=1024,
                                 input_height=1024, num_classes=15)
        module = SegFormer.preset(
            size, num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            quant=quant,
            head_upsample="quarter" if quarter else "full")
    else:
        raise ValueError(f"unknown model {name!r}")
    return Engine(module, cfg, variables=variables, apply_fn=apply_fn)


__all__ = ["Engine", "build_engine"]
