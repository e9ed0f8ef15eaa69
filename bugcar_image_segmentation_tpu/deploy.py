"""AOT deployment artifacts: the TPU-native frozen graph.

Rebuilds the deployment role of the reference's frozen-graph machinery
(/root/reference/utils.py:49-83 ``freeze_session`` + the shipped
``pretrained_models/*.pb`` it produced, loaded at models.py:16,100-103):
bake the trained weights into the serving program as constants and
serialize a self-contained artifact that loads and runs WITHOUT the
model-building Python code.  Where the reference's format is a TF1
GraphDef, the TPU-native format is :mod:`jax.export`'s serialized
StableHLO — the unit XLA actually compiles — so a deployment box needs
only ``jax`` and the artifact file, not flax, not this package's model
zoo, not the converters.

Two deliberate departures from the live :class:`~.models.api.Engine`
contract, both the point of a frozen artifact:

- **Weights are compile-time constants here.**  Engines pass weights as
  runtime arguments so ``load_variables`` takes effect without a
  recompile (models/api.py); an exported artifact inverts that on
  purpose — it is a snapshot, and later ``load_variables`` calls on the
  source engine do not (and must not) reach into already-serialized
  blobs.  Tested in tests/test_deploy.py.  Numerics vs the live engine:
  constants let XLA constant-fold slices of the weight arithmetic (the
  BN ``scale*rsqrt`` folds etc.), which can move a logit by one ULP —
  measured one argmax tie flip in 131k pixels on a trained ENet.  The
  same tie-pixel deviation class as ``cache_weights`` (models/api.py)
  and the warp's float32 ties; tests budget it accordingly.
- **The batch dimension is symbolic by default** (``jax.export``
  shape polymorphism), like the ``None`` batch dim of a TF frozen
  graph: one artifact serves any batch size.  Pass ``batch=<int>`` to
  pin it — required only if a backbone's lowering rejects symbolic
  shapes (none of the shipped zoo does; the suite exports ENet and the
  fused pipeline symbolically).

Artifacts are written in a small container format (magic + JSON header
+ the ``jax.export`` blob) so the model name, endpoint, geometry, and
class semantics survive next to the program; ``load_artifact`` returns
a callable wrapper exposing them.

**Multi-chip artifacts**: exporting a spatially partitioned engine
(parallel/spatial.py) bakes its sharding constraints into the StableHLO
— the artifact records ``nr_devices`` in the header, refuses to run in
a wrong-sized device context, and executes with the same XLA-inserted
halo exchanges as live serving via :meth:`Deployed.call_sharded` on an
equal-sized mesh (bit-parity with the unsharded program,
tests/test_deploy.py).  Tensor-parallel engines are the opposite case
by design: TP lives in runtime weight PLACEMENTS (parallel/tp.py), and
an export snapshots weights as host constants — so a TP engine exports
as an ordinary single-device artifact; re-shard at load time if TP
serving of a frozen program is wanted.

Packed serving weights (models/packing.py) are irrelevant inside an
artifact — packing exists to cut per-dispatch *argument* marshaling,
and a frozen program has no weight arguments — so export always bakes
the plain variable tree.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"BCSG1\x00"

# Engine endpoints exportable by name → the pure impl each wraps.
_ENGINE_ENDPOINTS = ("predict", "predict_binary", "logits")


def _batch_dim(batch: Optional[int]):
    """None → a symbolic batch dim ("b"); int → that static size."""
    if batch is None:
        (dim,) = jax_export.symbolic_shape("b")
        return dim
    if int(batch) < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    return int(batch)


def export_engine(engine: Any,
                  fn: str = "predict",
                  batch: Optional[int] = None,
                  platforms: Optional[Sequence[str]] = None
                  ) -> jax_export.Exported:
    """Freeze one engine endpoint into a :class:`jax.export.Exported`.

    Args:
      engine: a :class:`~.models.api.Engine` (weights are snapshotted
        from ``engine.variables`` as program constants).
      fn: "predict" (uint8 BGR → uint8 3-class map, reference
        models.py:42-69), "predict_binary" (models.py:70-82) or
        "logits".
      batch: None for a symbolic batch dimension, or a static size.
      platforms: lowering platforms (default: this process's backend).
        Pass ``("tpu",)`` on the TPU host for the deployment artifact;
        ``("cpu",)`` artifacts are used by the test suite.
    """
    if fn not in _ENGINE_ENDPOINTS:
        raise ValueError(f"fn must be one of {_ENGINE_ENDPOINTS}, got {fn!r}")
    impl = getattr(engine, f"_{fn}_impl")
    # Plain tree (never packed), pulled to HOST in one batched transfer:
    # lowering materializes each baked constant individually, which on a
    # remote accelerator is one ~0.65 s fetch PER LEAF (measured 329 s
    # for ENet's 508 leaves; 1 s after device_get).
    variables = jax.device_get(engine.variables)

    def frozen(frames_bgr):
        return impl(variables, frames_bgr)

    cfg = engine.cfg
    spec = jax.ShapeDtypeStruct(
        (_batch_dim(batch), cfg.input_height, cfg.input_width, 3),
        jnp.uint8)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    return jax_export.export(jax.jit(frozen), **kwargs)(spec)


def export_pipeline(pipeline: Any,
                    frame_shape: Optional[Tuple[int, ...]] = None,
                    platforms: Optional[Sequence[str]] = None
                    ) -> jax_export.Exported:
    """Freeze a :class:`~.pipeline.Pipeline`'s fused frame→grid program.

    The exported callable maps ONE frame to ``(grid, segmentation)`` —
    the full reference serving unit (camera frame in, occupancy grid
    out: bev.py:166-246 stacked on models.py:42) as a single program.

    Args:
      frame_shape: the input array shape.  Default: the model
        resolution ``(H, W, 3)`` — the shape the streaming path ships
        when ``host_resize=True``.  For ``transport="i420"`` pipelines
        pass the packed plane shape ``(3H/2, W)`` (ops/yuv.py); for
        device-side resize pass the capture shape.
    """
    if frame_shape is None:
        if pipeline.transport != "bgr":
            raise ValueError(
                "frame_shape is required for non-BGR transports (pass the "
                "packed I420 plane shape, ops/yuv.py i420_shape)")
        h, w = pipeline._model_hw
        frame_shape = (h, w, 3)
    # One batched host pull — see export_engine.
    variables = jax.device_get(pipeline.engine.variables)

    def frozen(frame):
        return pipeline._run_impl(variables, frame)

    spec = jax.ShapeDtypeStruct(tuple(frame_shape), jnp.uint8)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    return jax_export.export(jax.jit(frozen), **kwargs)(spec)


def export_multicam(pipeline: Any,
                    platforms: Optional[Sequence[str]] = None
                    ) -> jax_export.Exported:
    """Freeze a :class:`~.pipeline.MultiCameraPipeline`'s rig program.

    The exported callable maps an (N_cam, H, W, 3) uint8 batch to the
    stitched int8 vehicle grid (BASELINE config 4's serving unit:
    per-camera grids max-merged, pipeline.py MultiCameraPipeline).
    """
    n_cam = len(pipeline.builders)
    cfg = pipeline.engine.cfg
    variables = jax.device_get(pipeline.engine.variables)

    def frozen(frames):
        return pipeline._run_impl(variables, frames)

    spec = jax.ShapeDtypeStruct(
        (n_cam, cfg.input_height, cfg.input_width, 3), jnp.uint8)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    return jax_export.export(jax.jit(frozen), **kwargs)(spec)


def save_artifact(path: str,
                  exported: jax_export.Exported,
                  meta: Optional[dict] = None) -> None:
    """Write ``magic | u32 header length | JSON header | blob``.

    The header carries whatever ``meta`` the caller wants alongside the
    avals (recorded for inspection without deserializing the program).
    """
    header = dict(meta or {})
    header["in_avals"] = [str(a) for a in exported.in_avals]
    header["out_avals"] = [str(a) for a in exported.out_avals]
    header["platforms"] = list(exported.platforms)
    # Multi-chip programs (e.g. a spatially partitioned engine,
    # parallel/spatial.py) record their device count so a loader can
    # check slice size before deserializing anything.
    header["nr_devices"] = int(exported.nr_devices)
    blob = exported.serialize()
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)


class Deployed:
    """A loaded artifact: callable, with its header as ``.meta``."""

    def __init__(self, exported: jax_export.Exported, meta: dict):
        self.exported = exported
        self.meta = meta

    def __call__(self, *args):
        return self.exported.call(*args)

    def predict(self, frames_bgr) -> jax.Array:
        """Engine.predict-shaped convenience: accepts (H, W, 3) or
        (B, H, W, 3) for rank-4 single-input artifacts."""
        frames = jnp.asarray(frames_bgr)
        if frames.ndim == 3 and len(self.exported.in_avals) == 1 \
                and len(self.exported.in_avals[0].shape) == 4:
            return self.exported.call(frames[None])[0]
        return self.exported.call(frames)

    @property
    def nr_devices(self) -> int:
        """Device count the program was exported for (1 = single chip)."""
        return int(self.exported.nr_devices)

    def call_sharded(self, mesh, *args):
        """Run a multi-device artifact on ``mesh``.

        An artifact exported from a spatially partitioned engine
        (parallel/spatial.py) embeds its sharding constraints and
        refuses to run in a single-device context; this replicates the
        host args over the mesh (the program's internal constraints
        re-shard from there — same as live serving) and jits the call.
        The mesh must have exactly :attr:`nr_devices` devices; its axis
        names don't matter, only the device set.
        """
        from jax.sharding import NamedSharding, PartitionSpec
        if mesh.devices.size != self.nr_devices:
            raise ValueError(
                f"artifact was exported for {self.nr_devices} devices, "
                f"mesh has {mesh.devices.size}")
        rep = NamedSharding(mesh, PartitionSpec())
        placed = [jax.device_put(jnp.asarray(a), rep) for a in args]
        return jax.jit(self.exported.call)(*placed)


def load_artifact(path: str) -> Deployed:
    """Read a :func:`save_artifact` file back into a callable.

    Needs only jax — deserialization rebuilds the program from the
    embedded StableHLO; none of this package's model code runs.
    """
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path!r} is not a bugcar deploy artifact "
                         f"(bad magic {data[:6]!r})")
    if len(data) < len(_MAGIC) + 4:
        raise ValueError(f"{path!r} is truncated (no header length)")
    (hlen,) = struct.unpack_from("<I", data, len(_MAGIC))
    off = len(_MAGIC) + 4
    if off + hlen > len(data):
        raise ValueError(
            f"{path!r} is truncated or corrupt: header claims {hlen} "
            f"bytes but only {len(data) - off} remain")
    meta = json.loads(data[off:off + hlen].decode("utf-8"))
    exported = jax_export.deserialize(data[off + hlen:])
    return Deployed(exported, meta)


def export_engine_to(path: str,
                     engine: Any,
                     fn: str = "predict",
                     batch: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None,
                     meta: Optional[dict] = None) -> None:
    """:func:`export_engine` + :func:`save_artifact` with standard meta."""
    exported = export_engine(engine, fn=fn, batch=batch, platforms=platforms)
    header = {"kind": "engine", "fn": fn,
              "model": getattr(engine.cfg, "name", "?"),
              "input_hw": [engine.cfg.input_height, engine.cfg.input_width],
              "num_classes": engine.cfg.num_classes}
    header.update(meta or {})
    save_artifact(path, exported, header)


def export_pipeline_to(path: str,
                       pipeline: Any,
                       frame_shape: Optional[Tuple[int, ...]] = None,
                       platforms: Optional[Sequence[str]] = None,
                       meta: Optional[dict] = None) -> None:
    """:func:`export_pipeline` + :func:`save_artifact` with standard meta."""
    exported = export_pipeline(pipeline, frame_shape=frame_shape,
                               platforms=platforms)
    header = {"kind": "pipeline", "mode": pipeline.mode,
              "transport": pipeline.transport,
              "model": getattr(pipeline.engine.cfg, "name", "?"),
              "input_hw": list(pipeline._model_hw)}
    header.update(meta or {})
    save_artifact(path, exported, header)


def export_multicam_to(path: str,
                       pipeline: Any,
                       platforms: Optional[Sequence[str]] = None,
                       meta: Optional[dict] = None) -> None:
    """:func:`export_multicam` + :func:`save_artifact` with standard meta."""
    exported = export_multicam(pipeline, platforms=platforms)
    header = {"kind": "multicam", "n_cameras": len(pipeline.builders),
              "model": getattr(pipeline.engine.cfg, "name", "?")}
    header.update(meta or {})
    save_artifact(path, exported, header)


__all__ = ["export_engine", "export_pipeline", "export_multicam",
           "save_artifact", "load_artifact", "Deployed",
           "export_engine_to", "export_pipeline_to", "export_multicam_to"]
