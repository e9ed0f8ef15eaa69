"""Fused-Pallas ENet trunk (models/enet_fused.py, ops/pallas/bottleneck.py)
vs the Flax module — numerical parity on the CPU interpret path.

The fused executor consumes the exact ENet variable tree; these tests pin
that (a) a single fused bottleneck matches the Flax Bottleneck to float
tolerance for every kind/dilation in the stage-2/3 trunk, and (b) the
whole-network fused forward tracks the module and agrees on argmax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bugcar_image_segmentation_tpu.models.api import build_engine
from bugcar_image_segmentation_tpu.models.enet import Bottleneck, ENet
from bugcar_image_segmentation_tpu.models.enet_fused import (
    _fused, enet_fused_apply)
from bugcar_image_segmentation_tpu.configs import ModelConfig


def _one_bottleneck(kind, dilation, dtype, h=16, w=8, c=128):
    key = jax.random.PRNGKey(hash((kind, dilation)) % (2 ** 31))
    x = jax.random.normal(key, (2, h, w, c), jnp.float32).astype(dtype)
    mod = Bottleneck(c, kind, dilation=dilation, dtype=dtype)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    # perturb BN stats so folding is non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jax.random.uniform(jax.random.PRNGKey(1),
                                               a.shape),
        v["batch_stats"])
    v = {"params": v["params"], "batch_stats": stats}
    ref, _ = mod.apply(v, x, train=False)
    wrapped = {"params": {"blk": v["params"]},
               "batch_stats": {"blk": v["batch_stats"]}}
    got = _fused(wrapped, "blk", x, kind, dilation, interpret=True)
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


KINDS = [("regular", 1), ("dilated", 2), ("dilated", 4), ("dilated", 8),
         ("dilated", 16), ("asymmetric", 1)]


class TestFusedBottleneckParity:
    @pytest.mark.parametrize("kind,dil", KINDS)
    def test_f32_parity(self, kind, dil):
        ref, got = _one_bottleneck(kind, dil, jnp.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_bf16_tracks_float_path(self):
        ref, got = _one_bottleneck("regular", 1, jnp.bfloat16)
        # bf16 rounding points differ (kernel holds f32 between stages);
        # relative agreement only
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel


class TestFusedENet:
    def test_full_network_parity_f32(self):
        mod = ENet(num_classes=15, dtype=jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 32, 3))
        v = mod.init(jax.random.PRNGKey(3), x, train=False)
        ref = mod.apply(v, x, train=False)
        got = enet_fused_apply(v, x, num_classes=15, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_engine_bf16_argmax_agreement(self):
        cfg = ModelConfig(name="enet", input_width=64, input_height=32)
        ref_eng = build_engine("enet", cfg)
        fus_eng = build_engine("enet_fused",
                               ModelConfig(name="enet_fused",
                                           input_width=64, input_height=32),
                               variables=ref_eng.variables)
        frame = np.random.default_rng(0).integers(
            0, 255, (32, 64, 3), np.uint8)
        a = np.asarray(ref_eng.predict(frame))
        b = np.asarray(fus_eng.predict(frame))
        assert a.shape == b.shape
        assert (a == b).mean() > 0.995, (a == b).mean()

    def test_train_rejected(self):
        mod = ENet(num_classes=15, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 3))
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        with pytest.raises(ValueError, match="inference-only"):
            enet_fused_apply(v, x, train=True)
