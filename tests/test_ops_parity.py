"""Bit-parity tests: JAX ops vs the OpenCV C++ kernels they replace."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.ops import morphology, polar, resize, warp


def bev_like_matrix():
    tile = np.array([[200.0, 180.0], [300.0, 175.0],
                     [320.0, 240.0], [190.0, 250.0]], dtype=np.float32)
    bev = np.array([[243.9, 464.6], [273.6, 469.1],
                    [248.4, 434.9], [278.1, 439.4]], dtype=np.float32)
    return cv2.getPerspectiveTransform(tile, bev).astype(np.float64)


def blobby_labels(rng, shape, num_classes=4, cells=(16, 32)):
    base = rng.integers(0, num_classes, size=cells).astype(np.uint8)
    return cv2.resize(base, (shape[1], shape[0]),
                      interpolation=cv2.INTER_NEAREST)


class TestWarp:
    def test_linear_label_map_parity(self, rng):
        """cv2_linear mode: ≲2 tie-pixels per 512x512 frame vs cv2
        (float32 coordinate ULPs at exact rounding boundaries)."""
        m = bev_like_matrix()
        total = 0
        for _ in range(5):
            seg = blobby_labels(rng, (256, 512)) + 1
            ref = cv2.warpPerspective(seg, m, (512, 512))
            taps = warp.perspective_taps(m, (256, 512), (512, 512),
                                         "cv2_linear")
            ours = np.asarray(warp.apply_warp(jnp.asarray(seg), taps))
            total += int((ref != ours).sum())
        assert total <= 10, f"{total} mismatched pixels over 5 frames"

    def test_nearest_label_map_parity(self, rng):
        m = bev_like_matrix()
        total = 0
        for _ in range(5):
            seg = blobby_labels(rng, (256, 512)) + 1
            ref = cv2.warpPerspective(seg, m, (512, 512),
                                      flags=cv2.INTER_NEAREST)
            taps = warp.perspective_taps(m, (256, 512), (512, 512), "nearest")
            ours = np.asarray(warp.apply_warp(jnp.asarray(seg), taps))
            total += int((ref != ours).sum())
        assert total <= 10, f"{total} mismatched pixels over 5 frames"

    def test_window_offset_equals_crop(self, rng):
        """Warping directly into a window == warp-then-crop."""
        m = bev_like_matrix()
        seg = blobby_labels(rng, (256, 512)) + 1
        full = warp.perspective_taps(m, (256, 512), (512, 512), "cv2_linear")
        out_full = np.asarray(warp.apply_warp(jnp.asarray(seg), full))
        windowed = warp.perspective_taps(m, (256, 512), (100, 200),
                                         "cv2_linear", dst_offset=(56, 312))
        out_win = np.asarray(warp.apply_warp(jnp.asarray(seg), windowed))
        np.testing.assert_array_equal(out_win,
                                      out_full[312:412, 56:256])

    def test_valid_rect_zeroes_outside(self, rng):
        m = bev_like_matrix()
        seg = blobby_labels(rng, (256, 512)) + 1
        taps = warp.perspective_taps(m, (256, 512), (512, 512), "cv2_linear",
                                     valid_rect=(10, 100, 20, 200))
        out = np.asarray(warp.apply_warp(jnp.asarray(seg), taps))
        assert (out[:20, :] == 0).all() and (out[200:, :] == 0).all()
        assert (out[:, :10] == 0).all() and (out[:, 100:] == 0).all()

    def test_identity_matrix(self, rng):
        seg = blobby_labels(rng, (64, 64))
        taps = warp.perspective_taps(np.eye(3), (64, 64), (64, 64),
                                     "cv2_linear")
        np.testing.assert_array_equal(
            np.asarray(warp.apply_warp(jnp.asarray(seg), taps)), seg)


class TestYUVTransport:
    def test_device_inverse_matches_cv2_within_1(self, rng):
        from bugcar_image_segmentation_tpu.ops import yuv

        bgr = rng.integers(0, 256, (64, 96, 3), np.uint8)
        packed = yuv.bgr_to_i420_host(bgr)
        assert packed.shape == yuv.i420_shape((64, 96))
        ours = np.asarray(yuv.i420_to_bgr(jnp.asarray(packed), (64, 96)))
        want = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420)
        err = np.abs(ours.astype(int) - want.astype(int)).max()
        assert err <= 1, f"max channel deviation {err} vs cv2"

    def test_odd_shape_rejected(self):
        from bugcar_image_segmentation_tpu.ops import yuv
        with pytest.raises(ValueError, match="even"):
            yuv.i420_shape((63, 96))


class TestMorphology:
    @pytest.mark.parametrize("k", [(3, 3), (5, 5), (4, 4), (2, 6), (9, 9)])
    def test_open_close_parity(self, rng, k):
        kernel = np.ones(k, np.uint8)
        for _ in range(3):
            img = (rng.random((40, 56)) < 0.5).astype(np.uint8)
            ref_o = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel=kernel)
            ref_c = cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel=kernel)
            np.testing.assert_array_equal(
                np.asarray(morphology.morph_open(jnp.asarray(img), k)), ref_o)
            np.testing.assert_array_equal(
                np.asarray(morphology.morph_close(jnp.asarray(img), k)), ref_c)

    def test_grayscale_erode_dilate(self, rng):
        img = rng.integers(0, 256, size=(33, 47)).astype(np.uint8)
        kernel = np.ones((3, 3), np.uint8)
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(jnp.asarray(img))),
            cv2.erode(img, kernel))
        np.testing.assert_array_equal(
            np.asarray(morphology.dilate(jnp.asarray(img))),
            cv2.dilate(img, kernel))

    def test_batched(self, rng):
        imgs = (rng.random((2, 3, 20, 24)) < 0.5).astype(np.uint8)
        out = np.asarray(morphology.morph_open(jnp.asarray(imgs)))
        for i in range(2):
            for j in range(3):
                ref = cv2.morphologyEx(imgs[i, j], cv2.MORPH_OPEN,
                                       kernel=np.ones((3, 3), np.uint8))
                np.testing.assert_array_equal(out[i, j], ref)


class TestResize:
    @pytest.mark.parametrize("shapes", [((400, 400), (80, 80)),
                                        ((500, 300), (60, 80)),
                                        ((53, 37), (7, 11)),
                                        ((11, 7), (37, 53))])
    def test_nearest_bit_parity(self, rng, shapes):
        (sh, sw), (dh, dw) = shapes
        img = rng.integers(0, 5, size=(sh, sw)).astype(np.uint8)
        ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_NEAREST)
        ours = np.asarray(resize.resize_nearest(jnp.asarray(img), (dh, dw)))
        np.testing.assert_array_equal(ours, ref)

    def test_bilinear_close_to_cv2(self, rng):
        img = rng.integers(0, 256, size=(480, 640)).astype(np.uint8)
        ref = cv2.resize(img, (512, 256), interpolation=cv2.INTER_LINEAR)
        ours = np.asarray(resize.resize_bilinear_u8(jnp.asarray(img),
                                                    (256, 512)))
        diff = np.abs(ref.astype(int) - ours.astype(int))
        assert diff.max() <= 1, f"max diff {diff.max()}"

    @pytest.mark.parametrize("factor", [2, 4, 5])
    def test_nearest_upsample_matches_cv2_and_jax(self, rng, factor):
        # Integer-factor nearest replication (quarter-res label lift)
        # must be bit-identical to BOTH cv2 INTER_NEAREST and
        # jax.image.resize nearest.
        x = rng.integers(0, 3, size=(13, 17), dtype=np.uint8)
        got = np.asarray(resize.upsample_nearest_int(jnp.asarray(x), factor))
        ref_cv = cv2.resize(x, (17 * factor, 13 * factor),
                            interpolation=cv2.INTER_NEAREST)
        ref_jax = np.asarray(jax.image.resize(
            jnp.asarray(x), (13 * factor, 17 * factor), method="nearest"))
        np.testing.assert_array_equal(got, ref_cv)
        np.testing.assert_array_equal(got, ref_jax)
        # batched form replicates per image
        xb = rng.integers(0, 3, size=(2, 5, 6), dtype=np.uint8)
        gotb = np.asarray(resize.upsample_nearest_int(jnp.asarray(xb), factor))
        for k in range(2):
            np.testing.assert_array_equal(
                gotb[k],
                np.asarray(resize.upsample_nearest_int(jnp.asarray(xb[k]),
                                                       factor)))

    @pytest.mark.parametrize("factor", [2, 3, 4, 8])
    @pytest.mark.parametrize("shape", [(2, 5, 16, 16), (15, 1, 7, 9)])
    def test_phase_upsample_matches_jax_image(self, rng, factor, shape):
        # The phase-decomposed upsample (SegFormer decode head) must be
        # numerically identical to jax.image.resize bilinear upsampling.
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        got = np.asarray(resize.upsample_bilinear_int(x, factor))
        want = np.asarray(jax.image.resize(
            x, shape[:2] + (shape[2] * factor, shape[3] * factor),
            method="bilinear"))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPolar:
    # NOTE: cv2.warpPolar WITHOUT WARP_FILL_OUTLIERS (as the reference calls
    # it, bev.py:148/160/219/235) leaves out-of-source destination pixels
    # UNINITIALISED — two consecutive cv2 calls return different bytes there
    # (verified empirically; the reference's laserscan path reads garbage
    # memory).  Our implementation uses the deterministic FILL_OUTLIERS
    # semantics (0-fill), so parity is asserted against cv2 with the flag.

    def test_forward_polar_parity(self, rng):
        """Forward warpPolar (nearest) is bit-exact vs cv2+FILL_OUTLIERS."""
        for dsize in [(80, 80), (-1, -1), (100, 80)]:
            img = blobby_labels(rng, (80, 80), num_classes=4, cells=(10, 10))
            center = (80 / 2 - 1, 80.0)
            ref = cv2.warpPolar(img, dsize, center, 80,
                                cv2.WARP_POLAR_LINEAR + cv2.WARP_FILL_OUTLIERS)
            plan = polar.polar_maps((80, 80), dsize, center, 80.0)
            ours = np.asarray(polar.apply_gather(jnp.asarray(img), plan))
            np.testing.assert_array_equal(ours, ref, err_msg=str(dsize))

    def test_inverse_polar_parity(self, rng):
        img = blobby_labels(rng, (251, 80), num_classes=3, cells=(25, 10))
        center = (39.0, 80.0)
        ref = cv2.warpPolar(img, (80, 80), center, 80,
                            cv2.WARP_INVERSE_MAP + cv2.WARP_FILL_OUTLIERS)
        plan = polar.inverse_polar_maps((80, 80), (251, 80), center, 80.0)
        ours = np.asarray(polar.apply_gather(jnp.asarray(img), plan))
        mismatch = int((ref != ours).sum())
        # fastAtan2 replication keeps this to a handful of boundary pixels.
        assert mismatch <= 5, (mismatch, ref.size)

    def test_first_hit_matches_groupby_min(self, rng):
        img = rng.integers(0, 4, size=(60, 90)).astype(np.uint8)
        has, col = polar.first_hit_per_row(jnp.asarray(img), 3)
        has, col = np.asarray(has), np.asarray(col)
        for r in range(60):
            hits = np.where(img[r] == 3)[0]
            assert has[r] == (len(hits) > 0)
            if len(hits):
                assert col[r] == hits.min()

    def test_splat_matches_cv2_circle(self, rng):
        h, w = 40, 50
        has = rng.random(h) < 0.3
        col = rng.integers(0, w, size=h)
        ref = np.zeros((h, w))
        for r in range(h):
            if has[r]:
                ref = cv2.circle(ref, (int(col[r]), r), 1, 1, -1)
        ours = np.asarray(polar.splat_first_hits(
            jnp.asarray(has), jnp.asarray(col, dtype=jnp.int32), (h, w),
            1, jnp.uint8))
        np.testing.assert_array_equal(ours, ref.astype(np.uint8))

    def test_fast_atan2_sane(self):
        ys = np.array([0.0, 1.0, 1.0, -1.0, -3.0])
        xs = np.array([1.0, 1.0, -1.0, -1.0, 0.5])
        got = polar.fast_atan2_deg(ys, xs)
        want = np.degrees(np.arctan2(ys, xs)) % 360.0
        np.testing.assert_allclose(got, want, atol=0.31)


class TestPooling:
    def test_max_pool_2x2_matches_flax(self, rng):
        import flax.linen as nn
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.ops import pooling
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(pooling.max_pool_2x2(x)),
            np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))

    def test_general_max_pool_matches_flax(self, rng):
        import flax.linen as nn
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.ops import pooling
        x = jnp.asarray(rng.normal(size=(1, 12, 15, 3)).astype(np.float32))
        for window, strides in (((3, 3), (3, 3)), ((2, 3), (2, 3)),
                                ((3, 3), (1, 1)), ((2, 2), (1, 1))):
            got = np.asarray(pooling.max_pool(x, window, strides))
            want = np.asarray(nn.max_pool(x, window, strides=strides))
            np.testing.assert_array_equal(got, want, err_msg=str((window,
                                                                  strides)))
