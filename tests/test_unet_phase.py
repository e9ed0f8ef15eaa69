"""UNet 2x2 phase-space inference path (``unet_ph`` — round 5e).

The full-resolution encoder/decoder pair is half the UNet forward and
runs at quarter-lane MFU in stock NHWC (width 32 vs the 128-lane MXU).
``phase_max_width`` runs those stages in space-to-depth phase space
(fastconv.phase_conv3x3): measured x1.29 whole-model on the v5e
(1.83 → 1.42 ms; frame→grid 2.39 → 2.01), ZERO label/grid delta on the
trained checkpoint (PERF.md round 5e).  Identical variable tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.models.unet import UNet


class TestPhaseOps:
    def test_phase_conv3x3_matches_conv(self, rng):
        from jax import lax
        from bugcar_image_segmentation_tpu.models.fastconv import (
            depth_to_space, phase_conv3x3, space_to_depth)

        x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)) * 0.2, jnp.float32)
        want = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO",
                                                     "NHWC"))
        got = depth_to_space(phase_conv3x3(space_to_depth(x), w,
                                           jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_phase_max_pool_is_exact(self, rng):
        from bugcar_image_segmentation_tpu.models.fastconv import (
            phase_max_pool, space_to_depth)
        from bugcar_image_segmentation_tpu.ops import pooling

        x = jnp.asarray(rng.normal(size=(1, 16, 32, 8)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(phase_max_pool(space_to_depth(x))),
            np.asarray(pooling.max_pool_2x2(x)))


class TestUNetPhase:
    @pytest.mark.parametrize("gate", [32, 64])
    def test_tree_identical_and_logits_match(self, rng, gate):
        x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
        plain = UNet(num_classes=15, dtype=jnp.float32)
        ph = UNet(num_classes=15, dtype=jnp.float32,
                  phase_max_width=gate)
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        vp = ph.init(jax.random.PRNGKey(0), x, train=False)
        tu = jax.tree_util
        sp = {tu.keystr(p): l.shape
              for p, l in tu.tree_leaves_with_path(v)}
        sq = {tu.keystr(p): l.shape
              for p, l in tu.tree_leaves_with_path(vp)}
        assert sp == sq

        y0 = plain.apply(v, x, train=False)
        y1 = ph.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-3)

    def test_train_path_unaffected(self, rng):
        """The gate is inference-only: train=True must take the stock
        path (and produce identical outputs) even with the flag set."""
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        plain = UNet(num_classes=15, dtype=jnp.float32)
        ph = UNet(num_classes=15, dtype=jnp.float32, phase_max_width=256)
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        y0, m0 = plain.apply(v, x, train=True, mutable=["batch_stats"])
        y1, m1 = ph.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_engine_grammar(self):
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import build_engine

        cfg = ModelConfig(name="unet", input_width=96, input_height=64,
                          num_classes=15, dtype="float32")
        eng = build_engine("unet_ph", cfg)
        assert eng.module.phase_max_width == 32
        assert build_engine("unet", cfg).module.phase_max_width == 0

    def test_trained_checkpoint_budget(self):
        """Round-5e measured ZERO trained-weights label/grid delta on
        chip over the 8-frame sequence; pin a 0.1% ceiling on labels
        here (CPU, 2 frames) so a numerics regression can't hide."""
        import os
        ckpt = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "checkpoints",
            "unet_synthetic.msgpack")
        if not os.path.exists(ckpt):
            pytest.skip("committed unet checkpoint missing")
        from bugcar_image_segmentation_tpu import synthetic
        from bugcar_image_segmentation_tpu.models.api import build_engine
        from bugcar_image_segmentation_tpu.utils.checkpoint import (
            load_variables)

        variables, cfg = load_variables(ckpt)
        full = build_engine("unet", cfg, variables=variables)
        ph = build_engine("unet_ph", cfg, variables=variables)
        for k, (frame, _, _m) in enumerate(synthetic.video(
                seed=11, num_frames=2,
                shape=(cfg.input_height, cfg.input_width))):
            s0 = np.asarray(full.predict(frame))
            s1 = np.asarray(ph.predict(frame))
            assert (s0 != s1).mean() <= 1e-3, (
                f"frame {k}: {(s0 != s1).mean():.3%} label flips")

    def test_spatial_partitioning_parity(self, rng):
        """The phase path is pure XLA (reshapes + dense convs), so
        GSPMD row-sharding must still reproduce the unsharded labels
        exactly — if this ever breaks, shard_engine_spatial needs a
        unet_ph guard like the Pallas engines'."""
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import build_engine
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(name="unet", input_width=96, input_height=64,
                          num_classes=15, dtype="float32")
        eng = build_engine("unet_ph", cfg)
        frame = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        want = np.asarray(eng.predict(frame))
        shard_engine_spatial(eng, make_mesh(4, axes=("space",)))
        got = np.asarray(eng.predict(frame))
        np.testing.assert_array_equal(got, want)
