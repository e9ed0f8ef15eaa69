"""Model-zoo tests: remap semantics, preprocessing, pooling, engines,
and the Pallas attention kernel.

The class-remap constants are load-bearing (SURVEY.md §7: a permuted
converter silently breaks drivability semantics) — they are pinned here
against the reference's literal sets (reference models.py:57-58,
note_label:1-15).
"""

import cv2
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bugcar_image_segmentation_tpu.models import remap
from bugcar_image_segmentation_tpu.models import preprocess as pre
from bugcar_image_segmentation_tpu.models.api import Engine, build_engine
from bugcar_image_segmentation_tpu.models.enet import (
    ENet, max_pool_with_indices, max_unpool)
from bugcar_image_segmentation_tpu.configs import ModelConfig
from bugcar_image_segmentation_tpu.ops.pallas.attention import (
    flash_attention, attention_reference)


# ---------------------------------------------------------------------------
# Class remap (reference models.py:55-58, 70-82)
# ---------------------------------------------------------------------------


class TestRemap:
    def test_table_pins_reference_semantics(self):
        t = remap.remap_table()
        # road(0), lane_marking(1) → ROAD=1  (reference models.py:58)
        assert t[0] == 1 and t[1] == 1
        # pavement(2), vegetation(9) → FLAT=0  (reference models.py:57)
        assert t[2] == 0 and t[9] == 0
        # everything else → OBSTACLE=2  (reference models.py:56)
        for c in (3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14):
            assert t[c] == 2

    def test_logits_to_drivability(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 15)).astype(np.float32))
        out = np.asarray(remap.logits_to_drivability(logits))
        classes = np.argmax(np.asarray(logits), axis=-1)
        expected = remap.remap_table()[classes]
        np.testing.assert_array_equal(out, expected)
        assert out.dtype == np.uint8

    def test_binary_road_mask(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 4, 15)).astype(np.float32))
        out = np.asarray(remap.logits_to_binary_road(logits[None])[0])
        classes = np.argmax(np.asarray(logits), axis=-1)
        np.testing.assert_array_equal(out, np.isin(classes, [0, 1])
                                      .astype(np.uint8))


# ---------------------------------------------------------------------------
# Preprocessing (reference models.py:84-95)
# ---------------------------------------------------------------------------


class TestPreprocess:
    def test_matches_reference_pipeline(self, rng):
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        out = np.asarray(pre.preprocess_frame(jnp.asarray(frame), (24, 48),
                                              dtype=jnp.float32))
        # Reference arithmetic with a float-precision resize oracle.
        resized = cv2.resize(frame.astype(np.float32), (48, 24),
                             interpolation=cv2.INTER_LINEAR)
        rgb = resized[..., ::-1] / 256.0
        expected = ((rgb - np.array(pre.IMAGE_MEAN))
                    / np.array(pre.IMAGE_STD)).astype(np.float32)
        np.testing.assert_allclose(out, expected, atol=2e-5)

    def test_batched(self, rng):
        frames = rng.integers(0, 256, size=(3, 32, 64, 3), dtype=np.uint8)
        out = pre.preprocess_frame(jnp.asarray(frames), (16, 32),
                                   dtype=jnp.float32)
        assert out.shape == (3, 16, 32, 3)
        single = pre.preprocess_frame(jnp.asarray(frames[1]), (16, 32),
                                      dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single),
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# Pool-with-indices / unpool (the ENet decoder's core op)
# ---------------------------------------------------------------------------


class TestPoolUnpool:
    def test_pool_matches_max_pool(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
        pooled, idx = max_pool_with_indices(x)
        import flax.linen as nn
        np.testing.assert_array_equal(
            np.asarray(pooled), np.asarray(nn.max_pool(x, (2, 2), (2, 2))))
        assert idx.dtype == jnp.uint8
        assert int(jnp.max(idx)) <= 3

    def test_unpool_places_values_at_argmax(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        pooled, idx = max_pool_with_indices(x)
        up = np.asarray(max_unpool(pooled, idx))
        xn = np.asarray(x)
        # Non-zero entries sit exactly at each window's (first) maximum.
        for wy in range(2):
            for wx in range(2):
                for c in range(2):
                    win = xn[0, wy * 2:wy * 2 + 2, wx * 2:wx * 2 + 2, c]
                    out = up[0, wy * 2:wy * 2 + 2, wx * 2:wx * 2 + 2, c]
                    flat = win.reshape(-1)
                    k = int(np.argmax(flat))
                    expected = np.zeros(4, np.float32)
                    expected[k] = flat[k]
                    np.testing.assert_array_equal(out.reshape(-1), expected)

    def test_roundtrip_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 16, 24, 3)).astype(np.float32))
        pooled, idx = max_pool_with_indices(x)
        assert pooled.shape == (1, 8, 12, 3)
        assert max_unpool(pooled, idx).shape == x.shape


# ---------------------------------------------------------------------------
# Engines
# ---------------------------------------------------------------------------


def tiny_cfg(**kw):
    base = dict(name="enet", input_width=64, input_height=32,
                num_classes=15, dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


class TestEngine:
    def test_enet_predict_contract(self, rng):
        cfg = tiny_cfg()
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        seg = np.asarray(eng.predict(frame))
        assert seg.shape == (32, 64)
        assert seg.dtype == np.uint8
        assert set(np.unique(seg)) <= {0, 1, 2}

    def test_batched_predict_matches_single(self, rng):
        cfg = tiny_cfg()
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        frames = rng.integers(0, 256, size=(2, 48, 96, 3), dtype=np.uint8)
        batch = np.asarray(eng.predict(frames))
        single = np.asarray(eng.predict(frames[0]))
        np.testing.assert_array_equal(batch[0], single)

    def test_binary_consistent_with_multiclass(self, rng):
        cfg = tiny_cfg()
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        seg = np.asarray(eng.predict(frame))
        binary = np.asarray(eng.predict_binary(frame))
        # binary road == multiclass ROAD (both derive from the same argmax)
        np.testing.assert_array_equal(binary, (seg == remap.ROAD)
                                      .astype(np.uint8))

    @pytest.mark.parametrize("name,w,h", [
        ("deeplab", 64, 32), ("deeplab_xception", 64, 32),
        ("unet", 64, 32), ("segformer", 64, 64),
        ("segformer_b2", 64, 64)])
    def test_other_backbones_forward(self, rng, name, w, h):
        cfg = ModelConfig(name=name, input_width=w, input_height=h,
                          num_classes=15, dtype="float32")
        eng = build_engine(name, cfg)
        frame = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        seg = np.asarray(eng.predict(frame))
        assert seg.shape == (h, w)
        assert set(np.unique(seg)) <= {0, 1, 2}

    def test_w16_weight_cache_parity(self, rng):
        # "_w16": weights cached in bfloat16 serve BIT-identically to
        # float32 masters under the bf16 compute dtype — flax casts every
        # f32 param to the module dtype at use anyway; cache_weights just
        # does the cast once at load (Engine.cache_weights, PERF.md
        # round 3f).  Halves weight HBM traffic for weight-bound nets.
        cfg = ModelConfig(name="deeplab_xception", input_width=64,
                          input_height=32, num_classes=15,
                          dtype="bfloat16")
        eng = build_engine("deeplab_xception", cfg)
        eng16 = build_engine("deeplab_xception_w16", cfg,
                             variables=eng.variables)
        floats = [l for l in jax.tree_util.tree_leaves(eng16.variables)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        assert floats and all(l.dtype == jnp.bfloat16 for l in floats)
        # the source engine's tree is untouched (cast copies)
        assert any(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(eng.variables))
        frame = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        np.testing.assert_array_equal(np.asarray(eng.predict(frame)),
                                      np.asarray(eng16.predict(frame)))
        # load_variables re-applies the cache: float32 masters in,
        # bfloat16 serving copies stored
        eng16.load_variables(eng.variables)
        floats = [l for l in jax.tree_util.tree_leaves(eng16.variables)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        assert all(l.dtype == jnp.bfloat16 for l in floats)

    def test_packed_weights_parity(self, rng):
        # pack_weights(): serving dispatches pass ONE flat buffer per
        # dtype instead of one argument per leaf (models/packing.py —
        # per-argument marshaling is ~3 µs/dispatch on remote TPUs,
        # 1.6 ms for ENet's 508 leaves; PERF.md round 3f).  Same values,
        # static slices inside the program: outputs are BIT-identical,
        # and load_variables keeps working (re-packs).
        cfg = ModelConfig(name="enet", input_width=64, input_height=32,
                          num_classes=15)
        eng = build_engine("enet", cfg)
        frame = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        a = np.asarray(eng.predict(frame))
        eng.pack_weights()
        packed = eng.serving_variables
        assert set(packed) <= {"float32", "bfloat16"}
        assert all(v.ndim == 1 for v in packed.values())
        np.testing.assert_array_equal(a, np.asarray(eng.predict(frame)))
        # weight swap still takes effect while packed (the CLAUDE.md
        # weights-are-arguments invariant)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, eng.variables)
        eng.load_variables(zeroed)
        b = np.asarray(eng.predict(frame))
        eng.pack_weights(False)
        np.testing.assert_array_equal(b, np.asarray(eng.predict(frame)))

    def test_packed_weights_pipeline_parity(self, rng):
        from __graft_entry__ import _toy_calibration
        from bugcar_image_segmentation_tpu.configs import GridConfig
        from bugcar_image_segmentation_tpu.pipeline import Pipeline
        cfg = ModelConfig(name="enet", input_width=64, input_height=32,
                          num_classes=15)
        eng = build_engine("enet", cfg)
        cal = _toy_calibration((32, 64), output_wh=(64, 64))
        pipe = Pipeline(eng, cal, GridConfig(4.0, 4.0, 0.25))
        frame = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        a = np.asarray(pipe(frame))
        eng.pack_weights()
        np.testing.assert_array_equal(a, np.asarray(pipe(frame)))

    @pytest.mark.parametrize("name", ["deeplab", "deeplab_xception"])
    def test_deeplab_quarter_head(self, rng, name):
        # _q variants return 1/4-res logits at inference (the decoder's
        # native resolution; the full path is exactly their bilinear
        # resize) and Engine nearest-lifts the labels — the same contract
        # as segformer_*_q (PERF.md round 3c).  Training emits full res.
        from bugcar_image_segmentation_tpu.models import remap
        from bugcar_image_segmentation_tpu.ops.resize import (
            upsample_nearest_int)

        cfg = ModelConfig(name=name, input_width=64, input_height=32,
                          num_classes=15, dtype="float32")
        eng = build_engine(name, cfg)
        cfg_q = ModelConfig(name=name + "_q", input_width=64,
                            input_height=32, num_classes=15,
                            dtype="float32")
        eng_q = build_engine(name + "_q", cfg_q,
                             variables=eng.variables)
        frame = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        logits_q = eng_q.logits(frame)
        assert logits_q.shape == (8, 16, 15)
        logits_f = eng.logits(frame)
        np.testing.assert_allclose(
            np.asarray(jax.image.resize(logits_q, logits_f.shape,
                                        method="bilinear")),
            np.asarray(logits_f), atol=1e-4)
        seg = np.asarray(eng_q.predict(frame))
        assert seg.shape == (32, 64)
        want = upsample_nearest_int(
            remap.logits_to_drivability(logits_q, eng_q.remap_table), 4)
        np.testing.assert_array_equal(seg, np.asarray(want))
        # Training path still emits full resolution.
        x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
        yt, _ = eng_q.module.apply(eng.variables, x, train=True,
                                   mutable=["batch_stats"])
        assert yt.shape == (1, 32, 64, 15)

    @pytest.mark.parametrize("stages,head", [(1, False), (2, False),
                                             (4, False), (4, True)])
    def test_segformer_chw_stages_parity(self, rng, stages, head):
        # The transposed (C, pixels) stage path (PERF.md round-3 item):
        # identical variable tree, same numbers as the NHWC path.
        # (4, True) is the fully-transposed chain incl. the concat-free
        # decode head (PERF.md round 3b) — the shipping default.
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer

        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        m0 = SegFormer(num_classes=5, dtype=jnp.float32, chw_stages=0)
        mk = SegFormer(num_classes=5, dtype=jnp.float32, chw_stages=stages,
                       chw_head=head)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        vk = mk.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(vk))
        assert (jax.tree_util.tree_map(lambda a: a.shape, v0)
                == jax.tree_util.tree_map(lambda a: a.shape, vk))
        y0 = np.asarray(m0.apply(v0, x, train=False))
        yk = np.asarray(mk.apply(v0, x, train=False))
        np.testing.assert_allclose(yk, y0, atol=2e-4 * np.abs(y0).max())

    def test_segformer_chw_train_path_unaffected(self, rng):
        # train=True must ignore chw_stages (the CHW path is
        # inference-only); params from a chw init must train fine.
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        m = SegFormer(num_classes=5, dtype=jnp.float32, chw_stages=2)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == (1, 64, 64, 5)
        assert np.isfinite(np.asarray(y)).all()

    def test_segformer_train_grads_flow(self, rng):
        # Training differentiates through attention_reference (the Pallas
        # kernel has no JVP rule — segformer.py EfficientAttention): the
        # q/k/v/proj params of every block must receive non-zero grads.
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        m = SegFormer(num_classes=5, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=True)

        def loss(params):
            y, _ = m.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(v["params"])
        flat = flax.traverse_util.flatten_dict(g, sep="/")
        attn = {k: gv for k, gv in flat.items() if "/attn/" in k}
        assert attn, "no attention params found in the grad tree"
        for k, gv in attn.items():
            assert np.isfinite(np.asarray(gv)).all(), k
            assert float(jnp.sum(jnp.abs(gv))) > 0, f"zero grad at {k}"

    def test_unet_chw_gate_parity(self, rng):
        # UNet's narrow-stage transposed path (models/unet.py
        # chw_max_width): identical tree, same numbers, train unaffected.
        from bugcar_image_segmentation_tpu.models.unet import UNet

        x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
        m0 = UNet(num_classes=5, dtype=jnp.float32, chw_max_width=0)
        m1 = UNet(num_classes=5, dtype=jnp.float32, chw_max_width=64)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))
        assert (jax.tree_util.tree_map(lambda a: a.shape, v0)
                == jax.tree_util.tree_map(lambda a: a.shape, v1))
        y0 = np.asarray(m0.apply(v0, x, train=False))
        y1 = np.asarray(m1.apply(v0, x, train=False))
        np.testing.assert_allclose(y1, y0, atol=1e-4 * np.abs(y0).max())
        yt, _ = m1.apply(v1, x, train=True, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(yt)).all()

    def test_segformer_presets(self):
        from bugcar_image_segmentation_tpu.models.segformer import (
            SEGFORMER_PRESETS, SegFormer)

        b2 = SegFormer.preset("b2", num_classes=7)
        assert b2.widths == (64, 128, 320, 512)
        assert b2.depths == (3, 4, 6, 3)
        assert b2.decoder_dim == 768
        assert b2.num_classes == 7
        assert set(SEGFORMER_PRESETS) == {"b0", "b1", "b2", "b3"}
        with pytest.raises(ValueError, match="unknown SegFormer"):
            build_engine("segformer_b9")
        with pytest.raises(ValueError, match="unknown SegFormer"):
            build_engine("segformer_b0_b1")

    def test_segformer_head_cascade_trained_budget(self):
        # "_hc" (head_cascade): the part-sum runs as a 2x-upsample
        # cascade — NOT bit-equal to the direct x2/x4/x8 upsamples
        # (up2∘up2 re-lerps across original knots), so it is budgeted
        # on TRAINED weights like _q is: random-weight probes measured
        # 3.9% flips (noise features = kinks everywhere) but the
        # committed checkpoint measures 0.005-0.01% (PERF.md round 4e).
        import os
        ckpt = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "checkpoints",
            "segformer_b0_synthetic.msgpack")
        if not os.path.exists(ckpt):
            pytest.skip("segformer_b0 checkpoint missing")
        from bugcar_image_segmentation_tpu import synthetic
        from bugcar_image_segmentation_tpu.utils.checkpoint import (
            load_variables)

        variables, cfg = load_variables(ckpt)
        e = build_engine("segformer_b0", cfg, variables=variables)
        eh = build_engine("segformer_b0_hc", cfg, variables=variables)
        assert eh.module.head_cascade is True
        for frame, _, _ in synthetic.video(
                seed=11, num_frames=2,
                shape=(cfg.input_height, cfg.input_width)):
            flips = (np.asarray(e.predict(frame))
                     != np.asarray(eh.predict(frame))).mean()
            assert flips <= 0.005, f"{flips:.3%} trained-weight flips"

    def test_segformer_head_cascade_unreachable_raises(self, rng):
        # _hc must never be a silent no-op: the cascade lives only in
        # the fully-transposed head, so inference with a config that
        # can't reach it (xla_attention / partial chw) raises; training
        # ignores inference-layout flags by design.
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        m = SegFormer(num_classes=5, dtype=jnp.float32, head_cascade=True,
                      xla_attention=True)
        v = SegFormer(num_classes=5, dtype=jnp.float32).init(
            jax.random.PRNGKey(0), x, train=False)
        with pytest.raises(ValueError, match="head_cascade"):
            m.apply(v, x, train=False)
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == (1, 64, 64, 5)

    def test_segformer_quarter_head(self, rng):
        # head_upsample="quarter" returns the head's native 1/4-res
        # logits; the full path is EXACTLY bilinear-resize of those
        # (the final resize is the only difference).  Training always
        # emits full resolution.
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        mf = SegFormer(num_classes=5, dtype=jnp.float32)
        mq = SegFormer(num_classes=5, dtype=jnp.float32,
                       head_upsample="quarter")
        v = mf.init(jax.random.PRNGKey(0), x, train=False)
        yf = mf.apply(v, x, train=False)
        yq = mq.apply(v, x, train=False)
        assert yq.shape == (1, 16, 16, 5)
        np.testing.assert_allclose(
            np.asarray(jax.image.resize(yq, yf.shape, method="bilinear")),
            np.asarray(yf), atol=1e-5)
        yt, _ = mq.apply(v, x, train=True, mutable=["batch_stats"])
        assert yt.shape == (1, 64, 64, 5)
        with pytest.raises(ValueError, match="head_upsample"):
            SegFormer(head_upsample="half").apply(v, x, train=False)

    def test_segformer_q_engine_contract(self, rng):
        # The _q engine keeps predict()'s input-resolution contract by
        # nearest-replicating the quarter-res LABELS (models/api.py
        # _to_input_res); the labels must be exactly the replication of
        # the quarter-res argmax+remap.
        from bugcar_image_segmentation_tpu.models import remap
        from bugcar_image_segmentation_tpu.ops.resize import (
            upsample_nearest_int)

        cfg = ModelConfig(name="segformer_b0_q", input_width=64,
                          input_height=64, num_classes=15, dtype="float32")
        eng = build_engine("segformer_b0_q", cfg)
        frame = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        seg = np.asarray(eng.predict(frame))
        assert seg.shape == (64, 64)
        assert set(np.unique(seg)) <= {0, 1, 2}
        logits = eng.logits(frame)
        assert logits.shape == (16, 16, 15)
        want = upsample_nearest_int(
            remap.logits_to_drivability(logits, eng.remap_table), 4)
        np.testing.assert_array_equal(seg, np.asarray(want))
        # binary path honors the same contract
        binary = np.asarray(eng.predict_binary(frame))
        assert binary.shape == (64, 64)
        assert set(np.unique(binary)) <= {0, 1}


# ---------------------------------------------------------------------------
# Pallas blockwise attention
# ---------------------------------------------------------------------------


class TestFlashAttention:
    @pytest.mark.parametrize("nq,nkv,bq,bkv", [
        (128, 128, 64, 64),    # even blocks
        (128, 96, 64, 32),     # cross-attention shape
        (100, 80, 64, 32),     # ragged → divisor fallback
    ])
    def test_matches_naive(self, rng, nq, nkv, bq, bkv):
        q = jnp.asarray(rng.normal(size=(2, 2, nq, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 2, nkv, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 2, nkv, 32)).astype(np.float32))
        out = flash_attention(q, k, v, block_q=bq, block_kv=bkv)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    @pytest.mark.parametrize("nq,nkv,bq,bkv", [
        (128, 128, 64, 64),
        (128, 96, 64, 32),
        (100, 80, 64, 32),
        # bkv == nkv: the single-pass no-recurrence kernel
        # (_attn_kernel_t_single, PERF.md round 3b).
        (128, 96, 64, 96),
        (256, 128, 256, 128),
    ])
    def test_transposed_matches_naive(self, rng, nq, nkv, bq, bkv):
        # flash_attention_t takes/returns (B, H, d, N) — the (C, pixels)
        # orientation of the CHW SegFormer stage.
        from bugcar_image_segmentation_tpu.ops.pallas.attention import (
            flash_attention_t)
        q = jnp.asarray(rng.normal(size=(2, 2, nq, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 2, nkv, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 2, nkv, 32)).astype(np.float32))
        out_t = flash_attention_t(q.transpose(0, 1, 3, 2),
                                  k.transpose(0, 1, 3, 2),
                                  v.transpose(0, 1, 3, 2),
                                  block_q=bq, block_kv=bkv)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out_t.transpose(0, 1, 3, 2)),
                                   np.asarray(ref), atol=2e-5)

    def test_extreme_logits_stable(self):
        # Online softmax must survive large score magnitudes.
        q = jnp.full((1, 1, 64, 16), 30.0, jnp.float32)
        k = jnp.concatenate([jnp.full((1, 1, 32, 16), 30.0),
                             jnp.full((1, 1, 32, 16), -30.0)],
                            axis=2).astype(jnp.float32)
        v = jnp.ones((1, 1, 64, 16), jnp.float32)
        out = flash_attention(q, k, v, block_q=64, block_kv=32)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
