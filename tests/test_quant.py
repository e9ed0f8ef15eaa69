"""W8A8 int8 path (ops/quant.py): numerics, tree compatibility, engine.

The reference has no quantization capability (frozen f32 graphs,
reference models.py:42-69); this pins the TPU-native int8 addition:
quantize→dequantize round-trips, Int8Dense vs nn.Dense error bounds, the
identical-param-tree guarantee that lets float checkpoints pour into the
int8 model, and the ``segformer_bN_int8`` engine names.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bugcar_image_segmentation_tpu.models.api import build_engine
from bugcar_image_segmentation_tpu.models.segformer import SegFormer
from bugcar_image_segmentation_tpu.ops.quant import (
    Int8Dense, int8_matmul, quantize_activation_int8, quantize_weight_int8)


class TestQuantPrimitives:
    def test_weight_roundtrip_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (96, 64), jnp.float32)
        w_q, s = quantize_weight_int8(w)
        assert w_q.dtype == jnp.int8 and s.shape == (64,)
        # symmetric 8-bit: |err| <= scale/2 per element
        err = np.abs(np.asarray(w_q, np.float32) * np.asarray(s) -
                     np.asarray(w))
        assert (err <= np.asarray(s) / 2 + 1e-7).all()

    def test_activation_roundtrip_error_bounded(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 33), jnp.float32) * 5
        x_q, s = quantize_activation_int8(x)
        assert x_q.dtype == jnp.int8 and s.shape == (7, 1)
        err = np.abs(np.asarray(x_q, np.float32) * np.asarray(s) -
                     np.asarray(x))
        assert (err <= np.asarray(s) / 2 + 1e-7).all()

    def test_zero_row_and_zero_column_are_safe(self):
        # max|x| = 0 must not divide by zero (scale floor in quant.py)
        x = jnp.zeros((4, 16), jnp.float32)
        w = jnp.zeros((16, 8), jnp.float32)
        y = int8_matmul(x, w)
        assert np.isfinite(np.asarray(y)).all()
        np.testing.assert_array_equal(np.asarray(y), 0.0)

    def test_int8_matmul_close_to_float(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(k1, (128, 256), jnp.float32)
        w = jax.random.normal(k2, (256, 192), jnp.float32)
        ref = x @ w
        got = int8_matmul(x, w)
        rel = (np.linalg.norm(np.asarray(got - ref)) /
               np.linalg.norm(np.asarray(ref)))
        assert rel < 0.01, rel

    def test_batched_inputs(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (32, 16), jnp.float32)
        got = int8_matmul(x, w)
        assert got.shape == (2, 5, 16)
        rel = (np.linalg.norm(np.asarray(got - x @ w)) /
               np.linalg.norm(np.asarray(x @ w)))
        assert rel < 0.02, rel


class TestInt8Dense:
    def test_param_tree_matches_nn_dense(self):
        x = jnp.ones((2, 24))
        v_q = Int8Dense(10).init(jax.random.PRNGKey(0), x)
        v_f = nn.Dense(10, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(0), x)
        tq = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_q)
        tf_ = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_f)
        assert tq == tf_

    def test_shape_gate_small_layers_stay_float(self):
        # Below min_k/min_n the module computes in float (measured on the
        # bench chip: dynamic quant LOSES on small-K matmuls — PERF.md) —
        # output matches nn.Dense's bf16 path to float tolerance.
        x = jax.random.normal(jax.random.PRNGKey(9), (16, 64), jnp.float32)
        v = nn.Dense(32, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(10), x)
        ref = nn.Dense(32, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32).apply(v, x)
        got = Int8Dense(32).apply(v, x)  # 64 < min_k: float fallback
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.02, atol=0.02)

    def test_shape_gate_large_layers_quantize(self):
        # At/above the gate the int8 path runs: exact match to the float
        # matmul is impossible, but the error is the quantization error.
        x = jax.random.normal(jax.random.PRNGKey(11), (64, 512), jnp.float32)
        v = nn.Dense(512, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(12), x)
        ref = nn.Dense(512, param_dtype=jnp.float32).apply(v, x)
        got = Int8Dense(512, dtype=jnp.float32).apply(v, x)
        diff = np.abs(np.asarray(got) - np.asarray(ref))
        assert diff.max() > 1e-6        # int8 branch actually taken
        rel = (np.linalg.norm(np.asarray(got - ref)) /
               np.linalg.norm(np.asarray(ref)))
        assert rel < 0.02, rel

    def test_float_params_pour_in_and_match(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (64, 48), jnp.float32)
        v = nn.Dense(32, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(6), x)
        ref = nn.Dense(32, param_dtype=jnp.float32).apply(v, x)
        got = Int8Dense(32, dtype=jnp.float32).apply(v, x)
        rel = (np.linalg.norm(np.asarray(got - ref)) /
               np.linalg.norm(np.asarray(ref)))
        assert rel < 0.02, rel


class TestSegFormerInt8:
    def test_quant_model_shares_param_tree_and_tracks_float(self):
        # Small config so CPU tests stay fast; same code path as b0-b3.
        kw = dict(num_classes=15, widths=(8, 16, 16, 16),
                  depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                  decoder_dim=16, dtype=jnp.float32)
        mf = SegFormer(**kw)
        mq = SegFormer(quant=True, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
        v = mf.init(jax.random.PRNGKey(8), x, train=False)
        # identical tree: the float init loads straight into the int8 model
        yf = mf.apply(v, x, train=False)
        yq = mq.apply(v, x, train=False)
        assert yq.shape == yf.shape
        # logits track the float model; argmax agrees almost everywhere
        agree = (np.asarray(yq.argmax(-1)) == np.asarray(yf.argmax(-1)))
        assert agree.mean() > 0.97, agree.mean()

    def test_engine_name_suffix(self):
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        cfg = ModelConfig(name="segformer_b0_int8", input_width=64,
                          input_height=64, num_classes=15)
        eng = build_engine("segformer_b0_int8", cfg=cfg)
        assert eng.module.quant is True
        frame = np.zeros((64, 64, 3), np.uint8)
        out = eng.predict(frame)
        assert out.shape == (64, 64)

    def test_engine_name_rejects_bad_size(self):
        with pytest.raises(ValueError):
            build_engine("segformer_b9_int8")


class TestChwDenseInt8:
    """The transposed Dense (models/chw.py) carries the same W8A8 path
    and shape gate as Int8Dense over (C, M)-oriented activations."""

    def test_transposed_int8_matches_int8_dense(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwDense

        x = jax.random.normal(jax.random.PRNGKey(3), (64, 512), jnp.float32)
        v = nn.Dense(512, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(4), x)
        want = Int8Dense(512, dtype=jnp.float32).apply(v, x)
        got_t = ChwDense(512, dtype=jnp.float32, quant=True).apply(v, x.T)
        np.testing.assert_allclose(np.asarray(got_t.T), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_transposed_gate_small_stays_float(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwDense

        x = jax.random.normal(jax.random.PRNGKey(5), (16, 64), jnp.float32)
        v = nn.Dense(32, param_dtype=jnp.float32).init(
            jax.random.PRNGKey(6), x)
        ref = np.asarray(nn.Dense(32, param_dtype=jnp.float32).apply(v, x))
        got = ChwDense(32, dtype=jnp.float32, quant=True).apply(v, x.T)
        np.testing.assert_allclose(np.asarray(got.T), ref,
                                   rtol=0.02, atol=0.02)


class TestXceptionInt8:
    """`xception_int8`: int8-MXU pointwise 1x1s (models/xception.py
    Int8Conv1x1).  Measured a NO at 1024x512 on the v5e (PERF.md round
    4b: dynamic-quantize passes outweigh the MXU saving at 2048
    tokens) — kept as the documented negative; these tests pin the
    tree compatibility and numerics claims either way."""

    def test_same_tree_and_close_labels(self):
        from bugcar_image_segmentation_tpu.configs import ModelConfig

        cfg = ModelConfig(name="xception", input_width=64, input_height=32,
                          num_classes=15, dtype="float32")
        e = build_engine("xception", cfg)
        ei = build_engine("xception_int8", cfg, variables=e.variables)
        assert (jax.tree_util.tree_structure(e.variables)
                == jax.tree_util.tree_structure(ei.variables))
        x = np.random.default_rng(0).integers(0, 255, (1, 32, 64, 3),
                                              dtype=np.uint8)
        lf = np.asarray(e.logits(x))
        li = np.asarray(ei.logits(x))
        rel = np.abs(lf - li).max() / (np.abs(lf).max() + 1e-9)
        assert rel < 0.02, f"int8 pointwise drifted {rel:.3%} relative"
        flips = (np.asarray(e.predict(x)) != np.asarray(ei.predict(x))).mean()
        assert flips <= 0.01

    def test_grammar(self):
        with pytest.raises(ValueError, match="grammar"):
            build_engine("xception_int4")
