"""Fused-sepconv Pallas kernel (ops/pallas/sepconv.py) — parity + tree.

The VERDICT-r4 #1 honest attempt: one banded Pallas kernel for the
Xception sepconv (dw3x3 → BN → ReLU → pw1x1 → BN [→ ReLU]).  On chip it
wins every ISOLATED A/B (x1.2-x3.8 per shape) and loses or ties every
in-model one — the fourth sighting of the isolation-harness artifact —
so ``_fs`` is FROZEN as a documented negative (PERF.md round 5c), kept
compiling and bit-compatible by these CPU interpret-mode tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _xla_sepconv(x, wdw, s1, b1, wpw, s2, b2, strides, act_out):
    dw = jax.lax.conv_general_dilated(
        x, wdw, window_strides=(strides, strides), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    y1 = jnp.maximum(dw * s1 + b1, 0.0)
    y2 = jnp.einsum("nhwc,cf->nhwf", y1, wpw) * s2 + b2
    return jnp.maximum(y2, 0.0) if act_out else y2


class TestFusedSepconvOp:
    @pytest.mark.parametrize("h,w,c,f,strides,act",
                             [(16, 32, 8, 16, 1, True),
                              (16, 32, 8, 16, 2, False),
                              (32, 64, 128, 128, 2, True),
                              (8, 16, 24, 40, 1, False)])
    def test_matches_xla_composition(self, rng, h, w, c, f, strides, act):
        from bugcar_image_segmentation_tpu.ops.pallas.sepconv import (
            fused_sepconv)

        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        wdw = jnp.asarray(rng.normal(size=(3, 3, 1, c)) * 0.1, jnp.float32)
        wpw = jnp.asarray(rng.normal(size=(c, f)) * 0.1, jnp.float32)
        s1 = jnp.asarray(rng.normal(size=(c,)) * 0.2 + 1.0, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        s2 = jnp.asarray(rng.normal(size=(f,)) * 0.2 + 1.0, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)

        want = _xla_sepconv(x, wdw, s1, b1, wpw, s2, b2, strides, act)
        got = fused_sepconv(x, wdw, s1, b1, wpw, s2, b2,
                            strides=strides, act_out=act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        # N=1 takes the direct (vmap-free) path
        got1 = fused_sepconv(x[:1], wdw, s1, b1, wpw, s2, b2,
                             strides=strides, act_out=act)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want[:1]),
                                   atol=1e-4)

    def test_rejects_bad_strides(self, rng):
        from bugcar_image_segmentation_tpu.ops.pallas.sepconv import (
            fused_sepconv)

        x = jnp.zeros((1, 8, 8, 8), jnp.float32)
        z = jnp.zeros((8,), jnp.float32)
        with pytest.raises(ValueError, match="strides"):
            fused_sepconv(x, jnp.zeros((3, 3, 1, 8)), z, z,
                          jnp.zeros((8, 8)), z, z, strides=3)


class TestXceptionFS:
    def test_tree_identical_and_logits_match(self, rng):
        """The _Kernel/_FoldedBN twins must reproduce nn.Conv/
        nn.BatchNorm's exact variable tree, and the fused model's logits
        must match the stock model on shared weights."""
        from bugcar_image_segmentation_tpu.models.xception import (
            Xception65DeepLab)

        x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)), jnp.float32)
        plain = Xception65DeepLab(num_classes=15, middle_blocks=2,
                                  dtype=jnp.float32)
        fused = Xception65DeepLab(num_classes=15, middle_blocks=2,
                                  dtype=jnp.float32, fused_sepconv=True)
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        vf = fused.init(jax.random.PRNGKey(0), x, train=False)
        tu = jax.tree_util
        paths_p = {tu.keystr(p): l.shape
                   for p, l in tu.tree_leaves_with_path(v)}
        paths_f = {tu.keystr(p): l.shape
                   for p, l in tu.tree_leaves_with_path(vf)}
        assert paths_p == paths_f

        y_plain = plain.apply(v, x, train=False)
        y_fused = fused.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y_fused),
                                   np.asarray(y_plain), atol=1e-4)

    def test_engine_grammar(self):
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import build_engine

        cfg = ModelConfig(name="deeplab_xception", input_width=128,
                          input_height=64, num_classes=15,
                          dtype="float32")
        eng = build_engine("xception_fs", cfg)
        assert eng.module.fused_sepconv is True
        with pytest.raises(ValueError, match="grammar"):
            build_engine("xception_fz", cfg)

    def test_spatial_rejects_fs(self):
        """Like enet_fused: a pallas_call with no SPMD rule — spatial
        partitioning must refuse it, not silently serve unsharded."""
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import build_engine
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(name="deeplab_xception", input_width=128,
                          input_height=64, num_classes=15,
                          dtype="float32")
        eng = build_engine("xception_fs", cfg)
        with pytest.raises(ValueError, match="fused"):
            shard_engine_spatial(eng, make_mesh(4, axes=("space",)))
