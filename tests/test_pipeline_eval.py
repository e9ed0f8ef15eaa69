"""Fused pipeline and evaluation tests.

The fused frame→grid program must agree exactly with running the same
stages separately (engine.predict → OccupancyGridBuilder), streaming must
preserve order, the multi-camera stitch must equal the per-camera max, and
the eval metrics must match hand-computed confusion algebra.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bugcar_image_segmentation_tpu import geometry
from bugcar_image_segmentation_tpu.configs import (CalibrationConfig,
                                                   GridConfig, ModelConfig)
from bugcar_image_segmentation_tpu.evaluation import (SegmentationMetrics,
                                                      bit_parity,
                                                      confusion_matrix,
                                                      evaluate_model)
from bugcar_image_segmentation_tpu.grid import OccupancyGridBuilder
from bugcar_image_segmentation_tpu.models.api import Engine
from bugcar_image_segmentation_tpu.models.enet import ENet
from bugcar_image_segmentation_tpu.pipeline import (MultiCameraPipeline,
                                                    Pipeline, stitch_grids)


def make_cal(yaw=0.12, inp=(64, 32)):
    cal = CalibrationConfig(
        input_shape=inp, output_shape=(128, 128),
        dist2target=(2.0, 30.0), tile_length=60.0, cm_per_px=4.0, yaw=yaw)
    tile = np.array([[26.0, 21.0], [38.0, 21.0], [41.0, 29.0], [23.0, 30.0]])
    m = geometry.calculate_transform_matrix(
        tile, output_shape=cal.output_shape, dist2target=cal.dist2target,
        tile_length=cal.tile_length, cm_per_px=cal.cm_per_px, yaw=cal.yaw)
    return cal.with_matrix(m)


GRID = GridConfig(width_m=4.0, height_m=4.0, cell_m=0.2)


@pytest.fixture(scope="module")
def engine():
    cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
    return Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)


class TestPipeline:
    def test_fused_matches_staged(self, engine, rng):
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        fused = np.asarray(pipe(frame))
        staged = np.asarray(
            OccupancyGridBuilder(cal, GRID)(engine.predict(frame)))
        np.testing.assert_array_equal(fused, staged)

    def test_segment_and_grid_consistent(self, engine, rng):
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        grid, seg = pipe.segment_and_grid(frame)
        np.testing.assert_array_equal(np.asarray(seg),
                                      np.asarray(engine.predict(frame)))
        np.testing.assert_array_equal(np.asarray(grid), np.asarray(pipe(frame)))

    def test_shape_mismatch_raises(self, engine):
        bad_cal = make_cal(inp=(128, 64))
        with pytest.raises(ValueError, match="must match"):
            Pipeline(engine, bad_cal, GRID)

    def test_stream_order_and_values(self, engine, rng):
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frames = [rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
                  for _ in range(5)]
        streamed = list(pipe.stream(iter(frames), depth=2))
        assert len(streamed) == 5
        for frame, got in zip(frames, streamed):
            np.testing.assert_array_equal(got, np.asarray(pipe(frame)))

    def test_stream_transfer_batched(self, engine, rng):
        """Micro-batched transfers: same grids, same order, including a
        padded partial final batch (7 frames, batch 4)."""
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frames = [rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
                  for _ in range(7)]
        streamed = list(pipe.stream(iter(frames), depth=2,
                                    transfer_batch=4, sync_chunk=2))
        assert len(streamed) == 7
        for frame, got in zip(frames, streamed):
            np.testing.assert_array_equal(got, np.asarray(pipe(frame)))

    def test_ragged_batch_chunks_and_matches(self, engine, rng):
        """run_batch must chunk EVERY k > 4 — including non-multiples
        (k=6 used to fall back to one whole-batch vmap, the VMEM-spill
        regime) — padding up and dropping extras, grids unchanged."""
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        for k in (6, 9):
            frames = np.stack([rng.integers(0, 256, size=(48, 96, 3),
                                            dtype=np.uint8)
                               for _ in range(k)])
            grids = np.asarray(pipe._run_batch(
                pipe.engine.serving_variables, jnp.asarray(frames)))
            assert grids.shape[0] == k
            for frame, got in zip(frames, grids):
                np.testing.assert_array_equal(got, np.asarray(pipe(frame)))

    def test_batched_path_parity_under_flags(self, engine, rng):
        """run_chunk (the round-5b restructured batch path: batched
        backbone + unrolled grid builds/i420) must match the
        single-frame program under every flag combination it
        special-cases: i420 transport, clahe, contour filter, binary
        mode."""
        cal = make_cal()
        for kwargs in (dict(host_resize=True, transport="i420"),
                       dict(use_clahe=True),
                       dict(contour_filter=True),
                       dict(mode="binary"),
                       dict(mode="binary", contour_filter=True)):
            pipe = Pipeline(engine, cal, GRID, **kwargs)
            frames = [rng.integers(0, 256, size=(48, 96, 3),
                                   dtype=np.uint8) for _ in range(4)]
            prepped = jnp.asarray(
                np.stack([pipe._prep_host(f) for f in frames]))
            grids = np.asarray(pipe._run_batch(
                pipe.engine.serving_variables, prepped))
            for frame, got in zip(frames, grids):
                np.testing.assert_array_equal(
                    got, np.asarray(pipe(frame)),
                    err_msg=f"batched path diverged under {kwargs}")

    def test_stream_batched_does_not_retrace(self, engine, rng):
        """A second stream(transfer_batch=K) call must reuse the compiled
        batched program (VERDICT r1: a per-call lambda was re-jitted and
        paid a full trace+compile on every streaming session)."""
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frames = [rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
                  for _ in range(4)]
        list(pipe.stream(iter(frames), depth=2, transfer_batch=4))
        n_compiled = pipe._run_batch._cache_size()
        assert n_compiled >= 1
        list(pipe.stream(iter(frames), depth=2, transfer_batch=4))
        assert pipe._run_batch._cache_size() == n_compiled

    def test_fused_clahe_and_contour_filter(self, engine, rng):
        """The optional stages fuse into the same program and keep the
        output contract; contour filtering may only remove road."""
        cal = make_cal()
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        pipe = Pipeline(engine, cal, GRID, use_clahe=True,
                        contour_filter=True)
        grid, seg = pipe.segment_and_grid(frame)
        assert set(np.unique(np.asarray(grid))) <= {-1, 0, 100}
        plain_seg = np.asarray(
            Pipeline(engine, cal, GRID, use_clahe=True)
            .segment_and_grid(frame)[1])
        seg = np.asarray(seg)
        # filter only demotes road(1) to flat(0); never adds road
        changed = seg != plain_seg
        assert (plain_seg[changed] == 1).all()
        assert (seg[changed] == 0).all()

    def test_host_resize_mode(self, engine, rng):
        """host_resize moves the downscale before the transfer.  The model
        input tensors must agree to u8 quantization (cv2 rounds the
        resized frame to uint8; the device path stays float); with an
        already-model-sized frame the two paths are bit-identical."""
        from bugcar_image_segmentation_tpu.models import preprocess as pre
        import jax.numpy as jnp_
        cal = make_cal()
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        pipe_host = Pipeline(engine, cal, GRID, host_resize=True)
        resized = np.asarray(pipe_host._prep(frame))
        assert resized.shape == (32, 64, 3)
        x_host = np.asarray(pre.preprocess_frame(
            jnp_.asarray(resized), (32, 64), dtype=jnp_.float32))
        x_dev = np.asarray(pre.preprocess_frame(
            jnp_.asarray(frame), (32, 64), dtype=jnp_.float32))
        # u8 rounding: ±0.5/256/std ≈ 0.009 per channel
        assert np.abs(x_host - x_dev).max() < 0.012
        # model-sized frame: identical programs, identical grids
        small = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(Pipeline(engine, cal, GRID)(small)),
            np.asarray(pipe_host(small)))

    def test_i420_transport_close_to_bgr(self, engine, rng):
        # i420 ships 1.5 B/px and converts on device (ops/yuv.py); the
        # chroma subsample shifts a few boundary pixels of the class map
        # at most — grids must agree on nearly all cells.
        import cv2

        cal = make_cal()
        from bugcar_image_segmentation_tpu import synthetic
        from bugcar_image_segmentation_tpu.ops import yuv
        frame, _ = synthetic.road_scene(rng, (48, 96))
        pipe_bgr = Pipeline(engine, cal, GRID, host_resize=True)
        pipe_yuv = Pipeline(engine, cal, GRID, host_resize=True,
                            transport="i420")
        g_yuv = np.asarray(pipe_yuv(frame))
        assert g_yuv.dtype == np.int8
        assert set(np.unique(g_yuv)) <= {-1, 0, 100}
        # Isolate the device-side conversion: feed the bgr pipeline the
        # cv2 round trip of the same packed frame.  (The random-weight
        # test engine sits near argmax ties everywhere, so comparing
        # against the ORIGINAL frame would measure chroma subsampling
        # through an untrained net, not the transport machinery.)
        h, w = 32, 64
        small = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
        packed = yuv.bgr_to_i420_host(small)
        roundtrip = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420)
        g_rt = np.asarray(pipe_bgr(roundtrip))
        frac = (g_rt != g_yuv).mean()
        assert frac <= 0.05, f"{frac:.3%} of cells flipped by transport"
        # streaming path round-trips the packed layout too
        outs = list(pipe_yuv.stream(iter([frame] * 3), depth=2))
        assert len(outs) == 3
        np.testing.assert_array_equal(outs[0], outs[2])

    def test_batched_chunking_matches_single(self, engine, rng):
        # _run_batch chunks batches >4 through lax.map (VMEM defense,
        # PERF.md round 3); results must equal the per-frame program.
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID)
        frames = rng.integers(0, 256, size=(8, 48, 96, 3), dtype=np.uint8)
        batched = np.asarray(pipe._run_batch(engine.serving_variables,
                                             jnp.asarray(frames)))
        assert batched.shape[0] == 8
        for i in range(8):
            single, _ = pipe._run(engine.serving_variables,
                                  jnp.asarray(frames[i]))
            np.testing.assert_array_equal(batched[i], np.asarray(single))

    def test_quarter_head_native_grid_direct(self, rng):
        """A quarter-res head + interpolation='native' taps the small
        label map directly (grid.py label_scale); the grid must equal
        the staged path (input-res predict → scale-1 native builder) and
        the pipeline's returned segmap keeps the input-res contract."""
        from bugcar_image_segmentation_tpu.models.api import build_engine
        cfg = ModelConfig(name="deeplab_q", input_width=64, input_height=32,
                          num_classes=15, dtype="float32")
        eng = build_engine("deeplab_q", cfg)
        assert eng.label_scale == 4
        cal = make_cal()
        pipe = Pipeline(eng, cal, GRID, interpolation="native")
        assert pipe.builder.segmap_shape == (8, 16)
        staged = OccupancyGridBuilder(cal, GRID, interpolation="native")
        frame = rng.integers(0, 256, (32, 64, 3), np.uint8)
        grid, seg = pipe.segment_and_grid(frame)
        assert np.asarray(seg).shape == (32, 64)
        np.testing.assert_array_equal(
            np.asarray(grid), np.asarray(staged(eng.predict(frame))))
        # The contour filter runs at input res → falls back to the
        # lifted path, same answer.
        pipe_cf = Pipeline(eng, cal, GRID, interpolation="native",
                           contour_filter=False)
        assert pipe_cf._grid_label_scale == 4
        pipe_cf2 = Pipeline(eng, cal, GRID, interpolation="native",
                            contour_filter=True)
        assert pipe_cf2._grid_label_scale == 1

    def test_i420_requires_host_resize(self, engine):
        with pytest.raises(ValueError, match="host_resize"):
            Pipeline(engine, make_cal(), GRID, transport="i420")

    def test_from_configs_runtime(self, engine, rng):
        from bugcar_image_segmentation_tpu.configs import RuntimeConfig
        cal = make_cal()
        rt = RuntimeConfig(pipeline_depth=4, warp_interpolation="nearest")
        pipe = Pipeline.from_configs(engine, cal, GRID, rt)
        assert pipe.default_depth == 4
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        grids = list(pipe.stream(iter([frame, frame, frame])))
        assert len(grids) == 3
        np.testing.assert_array_equal(grids[0], grids[1])

    def test_binary_mode(self, engine, rng):
        cal = make_cal()
        pipe = Pipeline(engine, cal, GRID, mode="binary")
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        out = np.asarray(pipe(frame))
        staged = np.asarray(OccupancyGridBuilder(cal, GRID, mode="binary")(
            engine.predict_binary(frame)))
        np.testing.assert_array_equal(out, staged)

    def test_binary_laserscan_stacks_pair_and_streams(self, engine, rng):
        """binary+laserscan (the reference's tuple-return quirk,
        bev.py:164) stacks into (2, H, W) so streaming still works."""
        import dataclasses
        cal = dataclasses.replace(make_cal(), laserscan=True)
        pipe = Pipeline(engine, cal, GRID, mode="binary")
        frame = rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
        out = np.asarray(pipe(frame))
        assert out.shape == (2, 20, 20)
        plain, ray = OccupancyGridBuilder(cal, GRID, mode="binary")(
            engine.predict_binary(frame))
        np.testing.assert_array_equal(out[0], np.asarray(plain))
        np.testing.assert_array_equal(out[1], np.asarray(ray))
        grids = list(pipe.stream(iter([frame, frame, frame]), depth=2))
        assert len(grids) == 3 and grids[0].shape == (2, 20, 20)


class TestMultiCamera:
    def test_stitch_is_per_camera_max(self, engine, rng):
        cals = [make_cal(yaw=y) for y in (-0.3, 0.0, 0.3)]
        multi = MultiCameraPipeline(engine, cals, GRID)
        frames = rng.integers(0, 256, size=(3, 48, 96, 3), dtype=np.uint8)
        got = np.asarray(multi(frames))
        per_cam = [np.asarray(OccupancyGridBuilder(c, GRID)(
            engine.predict(frames[i]))) for i, c in enumerate(cals)]
        np.testing.assert_array_equal(got, np.max(np.stack(per_cam), axis=0))

    def test_quarter_head_native_rig(self, rng):
        """Rig of quarter-head cameras + native grids: direct small-map
        taps must equal per-camera staged grids (predict → lifted
        native builder) max-merged."""
        from bugcar_image_segmentation_tpu.models.api import build_engine
        cfg = ModelConfig(name="deeplab_q", input_width=64, input_height=32,
                          num_classes=15, dtype="float32")
        eng = build_engine("deeplab_q", cfg)
        cals = [make_cal(yaw=y) for y in (-0.2, 0.2)]
        multi = MultiCameraPipeline(eng, cals, GRID, interpolation="native")
        frames = rng.integers(0, 256, size=(2, 32, 64, 3), dtype=np.uint8)
        got = np.asarray(multi(frames))
        per_cam = [np.asarray(
            OccupancyGridBuilder(c, GRID, interpolation="native")(
                eng.predict(frames[i]))) for i, c in enumerate(cals)]
        np.testing.assert_array_equal(got, np.max(np.stack(per_cam), axis=0))

    def test_stitch_semantics(self):
        a = np.full((4, 4), -1, np.int8)
        b = np.zeros((4, 4), np.int8)
        c = np.full((4, 4), 100, np.int8)
        c[0, 0] = -1
        merged = np.asarray(stitch_grids(jnp.stack(
            [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)])))
        assert merged[0, 0] == 0      # free beats unknown
        assert merged[1, 1] == 100    # occupied beats free


class TestEvaluation:
    def test_confusion_matrix_manual(self):
        pred = jnp.asarray([0, 1, 2, 2, 1, 0])
        label = jnp.asarray([0, 1, 1, 2, 1, 2])
        cm = np.asarray(confusion_matrix(pred, label, 3))
        want = np.zeros((3, 3), np.int32)
        for p, l in zip([0, 1, 2, 2, 1, 0], [0, 1, 1, 2, 1, 2]):
            want[l, p] += 1
        np.testing.assert_array_equal(cm, want)

    def test_ignore_label_dropped(self):
        pred = jnp.asarray([0, 1])
        label = jnp.asarray([0, 255])
        cm = np.asarray(confusion_matrix(pred, label, 3))
        assert cm.sum() == 1

    def test_metrics_algebra(self):
        cm = np.array([[8, 2], [1, 9]])
        m = SegmentationMetrics(confusion=cm)
        assert m.pixel_accuracy == pytest.approx(17 / 20)
        np.testing.assert_allclose(m.per_class_iou,
                                   [8 / 11, 9 / 12])
        assert m.mean_iou == pytest.approx((8 / 11 + 9 / 12) / 2)

    def test_evaluate_model_perfect_labels(self, engine, rng):
        frames = [rng.integers(0, 256, size=(48, 96, 3), dtype=np.uint8)
                  for _ in range(2)]
        dataset = [(f, np.asarray(engine.predict(f))) for f in frames]
        # Labels already 3-class: disable remap.
        metrics = evaluate_model(engine, dataset, remap_labels=False,
                                 num_classes=3)
        assert metrics.pixel_accuracy == 1.0
        assert metrics.mean_iou == 1.0

    def test_bit_parity_report(self):
        a = np.zeros((10, 10), np.int8)
        b = a.copy()
        b[0, 0] = 1
        rep = bit_parity(a, b)
        assert rep["mismatched_cells"] == 1
        assert rep["parity"] == pytest.approx(0.99)
