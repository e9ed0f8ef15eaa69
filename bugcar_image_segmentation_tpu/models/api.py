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
from . import packing
from . import preprocess as pre
from . import remap


def _cast_float_tree(tree: Any, dtype: jnp.dtype) -> Any:
    """Cast every float32 leaf of a variable tree to ``dtype``.

    Non-float leaves (int8 quant scales' zero-points, counters) and
    already-low-precision leaves pass through untouched.
    """
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return jnp.asarray(x, dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


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
                 apply_fn: Optional[Callable] = None,
                 pack: Optional[bool] = None):
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
        # Set by cache_weights(): serve from low-precision weights
        # (re-applied on every load_variables).  None = float32 masters.
        self.weights_dtype: Optional[jnp.dtype] = None
        # Optional placement hook (tree -> tree) re-applied by every
        # weight-management API, so device placements survive weight
        # swaps.  parallel.tp.shard_engine_tp installs the TP channel
        # shardings here — without it, load_variables would silently
        # replace the sharded tree with a replicated one.
        self.weights_placer: Optional[Callable] = None
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

        # Packed serving weights (models/packing.py): small leaves ride
        # in one flat buffer per dtype instead of one jit argument each
        # (leaves > 1 MB stay separate — see pack_weights).  Each
        # dispatch marshals ~3 µs/argument through the remote-TPU
        # transport (measured: 508 leaves = 1.63 ms/dispatch overhead,
        # PERF.md round 3f); packing collapses that to a few handles.
        # Bit-identical numerics (same values, static slices inside the
        # program).  Default (pack=None): ON unless the backend is CPU —
        # local dispatch has no per-argument marshaling, so packing
        # would only bloat traces (and the CPU test suite's compile
        # time).  ``pack_weights(False)`` reverts.
        self._pack: Optional[Tuple[dict, packing.PackSpec]] = None
        self._pack_cutoff = 1 << 20
        if pack is None:
            pack = jax.default_backend() != "cpu"
        if pack:
            self._pack = packing.pack_tree(self.variables,
                                           self._pack_cutoff)

        # Variables are ARGUMENTS of every jitted program (not trace-time
        # closures), so load_variables() takes effect without recompiling
        # — the weights are already on device, passing the tree is free.
        self._build_programs()

    def _build_programs(self) -> None:
        """(Re)create the jitted serving programs.

        ``jax.jit`` caches the TRACE, not the Python callables it closed
        over — so anything that swaps :attr:`apply_fn` after first use
        (e.g. :func:`~..parallel.spatial.shard_engine_spatial`, which
        wraps it with a sharding constraint) must rebuild the programs,
        or the stale traces would silently keep serving the old
        executor.  Weight swaps do NOT need this (weights are runtime
        arguments, never baked into the trace)."""

        def serve(impl):
            def run(payload, frames):
                return impl(self._materialize(payload), frames)
            return jax.jit(run)

        self._predict = serve(self._predict_impl)
        self._predict_binary = serve(self._predict_binary_impl)
        self._logits = serve(self._logits_impl)
        self._predict_pre = serve(self._predict_pre_impl)
        self._predict_pre_binary = serve(self._predict_pre_binary_impl)

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
            return fn(self.serving_variables, frames[None])[0]
        return fn(self.serving_variables, frames)

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
        if self.weights_dtype is not None:
            variables = _cast_float_tree(variables, self.weights_dtype)
        if self.weights_placer is not None:
            variables = self.weights_placer(variables)
        self.variables = variables
        if self._pack is not None:
            self._pack = packing.pack_tree(self.variables,
                                           self._pack_cutoff)

    def cache_weights(self, dtype: Any = jnp.bfloat16) -> None:
        """Store the float32 weights in the compute dtype (inference only).

        Flax modules built with ``dtype=bfloat16`` cast every float32
        parameter to bfloat16 at use anyway (``promote_dtype`` runs
        before the arithmetic); with the cast done once at load, each
        forward skips the per-leaf convert kernels (~0.12 ms/dispatch on
        ENet's 508 leaves on top of packing) and reads half the weight
        bytes from HBM (0.3 ms on the 220 MB Xception tree).  Numerics:
        BIT-identical on CPU for the flax-normalized backbones
        (DeepLab/Xception/SegFormer/UNet — asserted in
        tests/test_models.py); on the TPU MXU, XLA's mixed-precision
        conv lowering keeps extra weight precision through the convert,
        so f32-arg serving resolves a few argmax ties differently —
        measured 0.06% label flips (tests/test_tpu.py).  ENet's custom
        BatchNorms additionally fold ``scale*rsqrt(var+eps)`` in f32
        before casting (models/enet.py), so w16 re-rounds that fold —
        tie pixels again.

        Training must keep float32 master weights; engines with cached
        low-precision weights are serving-only (``variables["params"]``
        is no longer a valid optimizer target).
        """
        self.weights_dtype = jnp.dtype(dtype)
        self.variables = _cast_float_tree(self.variables, self.weights_dtype)
        if self.weights_placer is not None:
            self.variables = self.weights_placer(self.variables)
        if self._pack is not None:
            self._pack = packing.pack_tree(self.variables,
                                           self._pack_cutoff)

    def pack_weights(self, enable: bool = True,
                     max_leaf_bytes: int = 1 << 20) -> None:
        """Serve from packed flat-buffer weights (models/packing.py).

        Bit-identical outputs — the packed buffers hold the same values
        and the program rebuilds every leaf with static slices; only the
        ARGUMENT layout changes (1 buffer per dtype vs 1 per leaf),
        removing the per-dispatch per-argument marshaling (~3 µs × leaf
        count through the remote-TPU transport; PERF.md round 3f).
        Hybrid: leaves over ``max_leaf_bytes`` ride as their own
        arguments (marshal cost scales with COUNT — the small BN/bias
        tensors; unpack-relayout cost scales with BYTES — the big conv
        kernels; measured round 3f).  Programs retrace on the next call
        after toggling (the payload pytree structure changes).
        ``load_variables`` keeps working — it re-packs.
        ``self.variables`` stays the plain tree for training /
        checkpoint / converter interop.
        """
        if enable and self.weights_placer is not None:
            raise ValueError(
                "packing is incompatible with a weights placer (e.g. "
                "tensor-parallel shardings, parallel.tp.shard_engine_tp):"
                " flat buffers concatenate leaves and would destroy the "
                "per-leaf placements")
        self._pack_cutoff = max_leaf_bytes
        self._pack = (packing.pack_tree(self.variables, max_leaf_bytes)
                      if enable else None)

    @property
    def serving_variables(self):
        """What serving dispatches pass as the weights argument:
        the packed buffers when :meth:`pack_weights` is on, else the
        plain variable tree.  Pipelines use this + :meth:`_materialize`
        so packing applies to their fused programs too."""
        return self._pack[0] if self._pack is not None else self.variables

    def _materialize(self, payload):
        """Inside a jitted program: payload argument → variable tree.

        Accepts either form (trace-time detection): the packed buffers
        (a dict keyed by DTYPE names — collection names like "params"
        can never collide) or a plain variable tree, so harnesses that
        pass ``engine.variables`` directly keep working while packing
        is on.
        """
        if (self._pack is not None and isinstance(payload, dict)
                and set(payload) == set(self._pack[0])):
            return packing.unpack_tree(payload, self._pack[1])
        return payload


def build_engine(name: str = "enet",
                 cfg: Optional[ModelConfig] = None,
                 variables: Optional[dict] = None) -> Engine:
    """Factory covering the reference's model zoo by name.

    ``enet`` (models.py:14), ``deeplab`` (models.py:98), ``unet``
    (the Keras model.h5 configuration), ``segformer`` (BASELINE config 5).

    The measured engine recommendation per deployment configuration
    (which variant suffixes to use, with the numbers and budgets that
    earned them) lives in **docs/SERVING.md** — the authoritative
    config→engine table.
    """
    name = name.lower()
    # "_w16" (any model): serve from bfloat16-cached weights — numerics
    # identical to the float-param engine (see Engine.cache_weights),
    # half the weight HBM traffic.  Orthogonal to the per-model grammar.
    cache_bf16 = name.endswith("_w16")
    if cache_bf16:
        name = name[:-len("_w16")]
    apply_fn = None
    if name == "enet":
        from .enet import ENet
        cfg = cfg or ModelConfig()
        module = ENet(num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype))
    elif name == "enet_fused":
        # Same module/variable tree as "enet"; forward runs the Pallas
        # fused-bottleneck trunk (models/enet_fused.py).  FROZEN, not a
        # serving variant: measured x0.85 vs "enet" on the round-4 A/B
        # (scripts/bench_enet_fused.py; PERF.md round 4c) — buildable
        # for the on-chip Mosaic test and future-hardware re-runs only.
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
    elif name in ("unet", "unet_ph"):
        # "_ph": encoder/decoder stages up to the measured-best width
        # gate run in 2x2 phase space (UNet.phase_max_width — 4x
        # channels at quarter pixels fill the MXU lanes narrow NHWC
        # convs leave idle; whole-model A/B in PERF.md round 5e).
        # Same variable tree.
        from .unet import UNet
        cfg = cfg or ModelConfig(name="unet", input_width=512,
                                 input_height=256, num_classes=15)
        # Gate 32 = the full-res pair only: measured best (1.42 ms vs
        # 1.83 stock; gate 64 1.49 — the half-res pair's s2d/d2s
        # relayouts eat its smaller lane win; gates >=128 pure 16/9 MAC
        # overhead, PERF.md round 5e).
        module = UNet(num_classes=cfg.num_classes,
                      dtype=jnp.dtype(cfg.dtype),
                      phase_max_width=32 if name.endswith("_ph") else 0)
    elif (name in ("deeplab_xception", "xception")
          or name.startswith(("deeplab_xception_", "xception_"))):
        # Architecture-faithful twin of the actual deeplab.pb export
        # (Xception-65 backbone) — the variant the real blob pours into.
        # Grammar: "[deeplab_]xception[_q][_int8][_fs]" — "_q" quarter
        # head, "_int8" int8-MXU pointwise 1x1s (the 728x728+ matmuls
        # clear ops/quant.py's K,N>=512 gate; same float param tree),
        # "_fs" banded Pallas fused sepconvs for the dilation-1
        # entry/middle flows (ops/pallas/sepconv.py) — FROZEN
        # documented negative, kept compiling for re-measurement on new
        # toolchains, NOT a serving variant (x0.76 whole-model; PERF.md
        # round 5c).
        from .xception import Xception65DeepLab
        tokens = name.replace("deeplab_xception", "xception").split("_")[1:]
        if any(t not in ("q", "int8", "fs") for t in tokens):
            raise ValueError(
                f"unknown Xception variant {name!r}; grammar is "
                f"[deeplab_]xception[_q][_int8][_fs]")
        cfg = cfg or ModelConfig(name="deeplab_xception", input_width=1024,
                                 input_height=512, num_classes=15)
        module = Xception65DeepLab(
            num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            head_upsample="quarter" if "q" in tokens else "full",
            pw_int8="int8" in tokens,
            fused_sepconv="fs" in tokens)
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
        # "_hc": cascaded head part-sum (bandwidth win at dd=768, the
        # budgeted up2-chain numerics — SegFormer.head_cascade).
        cascade = "hc" in tokens
        rest = [t for t in tokens if t not in ("int8", "q", "hc")]
        if len(rest) > 1 or (rest and rest[0] not in SEGFORMER_PRESETS):
            raise ValueError(
                f"unknown SegFormer variant {name!r}; grammar is "
                f"segformer[_size][_q][_int8][_hc] with size in "
                f"{sorted(SEGFORMER_PRESETS)}")
        size = rest[0] if rest else "b0"
        cfg = cfg or ModelConfig(name=name, input_width=1024,
                                 input_height=1024, num_classes=15)
        module = SegFormer.preset(
            size, num_classes=cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            quant=quant, head_cascade=cascade,
            head_upsample="quarter" if quarter else "full")
    else:
        raise ValueError(f"unknown model {name!r}")
    engine = Engine(module, cfg, variables=variables, apply_fn=apply_fn)
    if cache_bf16:
        engine.cache_weights(jnp.bfloat16)
    return engine


__all__ = ["Engine", "build_engine"]
