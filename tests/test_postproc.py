"""Post-processing parity: contour filtering and CLAHE vs cv2 oracles."""

import cv2
import numpy as np
import jax.numpy as jnp

from bugcar_image_segmentation_tpu import postproc


def cv2_contour_oracle(mask, strip_ratio=0.1, area_thresh=0.4):
    """The reference's algorithm (image_processing_utils.py:4-44) with real
    cv2 calls: morph-CLOSE, find contours, keep those overlapping the
    bottom strip by > area_thresh * strip area, re-rasterize."""
    h, w = mask.shape
    k = max(1, min(h, w) // 50)
    closed = cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_CLOSE,
                              np.ones((k, k), np.uint8))
    contours, _ = cv2.findContours(closed, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    strip_h = int(h * strip_ratio)
    strip = np.zeros_like(closed)
    strip[h - strip_h:, :] = 1
    keep = []
    for c in contours:
        canvas = np.zeros_like(closed)
        cv2.fillPoly(canvas, [c], 1)
        inter = int((canvas & strip).sum())
        if inter > area_thresh * strip_h * w:
            keep.append(c)
    out = np.zeros_like(closed)
    if keep:
        cv2.fillPoly(out, keep, 1)
    return out


def blobby_mask(rng, shape=(128, 256), cells=(6, 12)):
    base = rng.integers(0, 2, size=cells).astype(np.uint8)
    return cv2.resize(base, (shape[1], shape[0]),
                      interpolation=cv2.INTER_NEAREST)


class TestComponents:
    def test_labels_partition_matches_cv2(self, rng):
        mask = blobby_mask(rng)
        ours = np.asarray(postproc.label_components(jnp.asarray(mask)))
        n, cvlab = cv2.connectedComponents(mask, connectivity=8)
        assert len(np.unique(ours)) - 1 == n - 1
        for v in np.unique(ours[ours > 0]):
            # every one of our components maps into exactly one cv2 label
            assert len(np.unique(cvlab[ours == v])) == 1

    def test_background_is_zero(self, rng):
        mask = blobby_mask(rng)
        ours = np.asarray(postproc.label_components(jnp.asarray(mask)))
        assert (ours[mask == 0] == 0).all()
        assert (ours[mask > 0] > 0).all()


class TestContourNoiseRemoval:
    def test_matches_cv2_oracle(self, rng):
        """Solid (hole-free) blobs: decisions must match the reference's
        contour algorithm exactly."""
        for _ in range(3):
            mask = blobby_mask(rng)
            want = cv2_contour_oracle(mask)
            got = np.asarray(postproc.contour_noise_removal(
                jnp.asarray(mask)))
            # Compare decisions per pixel; fillPoly draws 1px-fattened
            # outlines, so tolerate a thin boundary band.
            disagree = (want != got).sum()
            assert disagree <= 0.02 * mask.size, (
                f"{disagree} px disagree of {mask.size}")

    def test_keeps_connected_drops_floating(self):
        h, w = 100, 100
        mask = np.zeros((h, w), np.uint8)
        mask[60:100, 10:90] = 1          # big region touching the bottom
        mask[5:15, 5:15] = 1             # floating speck far away
        out = np.asarray(postproc.contour_noise_removal(jnp.asarray(mask)))
        assert out[80, 50] == 1
        assert out[10, 10] == 0

    def test_strip_threshold_semantics(self):
        h, w = 100, 100
        strip_h = 10
        mask = np.zeros((h, w), np.uint8)
        # Region overlapping the strip by 30% of strip area: dropped.
        mask[h - strip_h:, :30] = 1
        out = np.asarray(postproc.keep_components_by_strip_overlap(
            jnp.asarray(mask)))
        assert out.sum() == 0
        # Widen to 50%: kept.
        mask[h - strip_h:, :50] = 1
        out = np.asarray(postproc.keep_components_by_strip_overlap(
            jnp.asarray(mask)))
        assert out.sum() == strip_h * 50


class TestClahe:
    def test_l_channel_close_to_cv2(self, rng):
        l = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
        ours = np.asarray(postproc.clahe_l_channel(jnp.asarray(l), 3.0,
                                                   (8, 8)))
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(l)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # cv2 redistributes clipped mass with integer arithmetic; ours is
        # float — a few levels of divergence, irrelevant upstream of a
        # conv net.
        assert diff.mean() < 3.0 and diff.max() <= 32

    def test_bgr_wrapper_contract(self, rng):
        bgr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        out = np.asarray(postproc.clahe(jnp.asarray(bgr)))
        assert out.shape == bgr.shape and out.dtype == np.uint8
        # Flat images are (nearly) untouched; noisy ones change.
        flat = np.full((64, 64, 3), 128, np.uint8)
        out_flat = np.asarray(postproc.clahe(jnp.asarray(flat)))
        assert np.abs(out_flat.astype(int) - 128).max() <= 24
