"""training/augment.py: jittable segmentation augmentation.

The reference has no training (SURVEY.md §5 checkpoint note); the
augmentation batch transform is new capability, so these tests pin its
contract: static shapes, image/label geometric consistency, nearest
labels (no invented classes), ignore-label fill outside the view, and
key determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bugcar_image_segmentation_tpu.training.augment import (AugmentConfig,
                                                            augment_batch)


def _batch(rng, n=4, h=32, w=48):
    images = jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 15, (n, h, w)), jnp.int32)
    return images, labels


class TestAugmentBatch:
    def test_shapes_and_dtypes_preserved(self):
        rng = np.random.default_rng(0)
        images, labels = _batch(rng)
        out_i, out_l = jax.jit(
            lambda k, i, l: augment_batch(k, i, l, AugmentConfig())
        )(jax.random.PRNGKey(0), images, labels)
        assert out_i.shape == images.shape and out_i.dtype == images.dtype
        assert out_l.shape == labels.shape and out_l.dtype == labels.dtype

    def test_deterministic_per_key(self):
        rng = np.random.default_rng(1)
        images, labels = _batch(rng)
        a = augment_batch(jax.random.PRNGKey(7), images, labels)
        b = augment_batch(jax.random.PRNGKey(7), images, labels)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        c = augment_batch(jax.random.PRNGKey(8), images, labels)
        assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))

    def test_flip_moves_image_and_label_together(self):
        rng = np.random.default_rng(2)
        images, labels = _batch(rng, n=8)
        cfg = AugmentConfig(flip=True, scale=(1.0, 1.0), brightness=0,
                            contrast=0, saturation=0, noise_std=0)
        out_i, out_l = augment_batch(jax.random.PRNGKey(3), images, labels,
                                     cfg)
        flips = 0
        for s in range(8):
            same = np.array_equal(np.asarray(out_l[s]), np.asarray(labels[s]))
            mirrored = np.array_equal(np.asarray(out_l[s]),
                                      np.asarray(labels[s, :, ::-1]))
            assert same or mirrored
            if mirrored and not same:
                flips += 1
                np.testing.assert_allclose(np.asarray(out_i[s]),
                                           np.asarray(images[s, :, ::-1]),
                                           rtol=0, atol=0)
        assert 0 < flips < 8          # p=0.5 over 8 samples

    def test_identity_config_is_identity(self):
        rng = np.random.default_rng(3)
        images, labels = _batch(rng)
        cfg = AugmentConfig(flip=False, scale=(1.0, 1.0), brightness=0,
                            contrast=0, saturation=0, noise_std=0)
        out_i, out_l = augment_batch(jax.random.PRNGKey(0), images, labels,
                                     cfg)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(images),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_l), np.asarray(labels))

    def test_zoom_in_stays_in_frame(self):
        rng = np.random.default_rng(4)
        images, labels = _batch(rng)
        cfg = AugmentConfig(flip=False, scale=(0.5, 0.9), brightness=0,
                            contrast=0, saturation=0, noise_std=0,
                            ignore_label=255)
        out_i, out_l = augment_batch(jax.random.PRNGKey(1), images, labels,
                                     cfg)
        assert not np.any(np.asarray(out_l) == 255)
        # nearest labels: no new class values invented
        assert set(np.unique(np.asarray(out_l))) <= \
            set(np.unique(np.asarray(labels)))

    def test_zoom_out_fills_ignore(self):
        rng = np.random.default_rng(5)
        images, labels = _batch(rng)
        cfg = AugmentConfig(flip=False, scale=(1.5, 1.5), brightness=0,
                            contrast=0, saturation=0, noise_std=0,
                            ignore_label=255)
        out_i, out_l = augment_batch(jax.random.PRNGKey(1), images, labels,
                                     cfg)
        out_l = np.asarray(out_l)
        # at 1.5x zoom-out the corners are outside the source frame
        assert np.all(out_l[:, 0, 0] == 255) and np.all(out_l[:, -1, -1]
                                                        == 255)
        # and the center row/col still carries real labels
        assert np.any(out_l != 255)
        np.testing.assert_allclose(np.asarray(out_i)[:, 0, 0], 0.0, atol=0)

    def test_photometric_leaves_labels_and_clips(self):
        rng = np.random.default_rng(6)
        images, labels = _batch(rng)
        cfg = AugmentConfig(flip=False, scale=(1.0, 1.0), brightness=0.5,
                            contrast=0.5, saturation=0.5, noise_std=0.05)
        out_i, out_l = augment_batch(jax.random.PRNGKey(2), images, labels,
                                     cfg)
        np.testing.assert_array_equal(np.asarray(out_l), np.asarray(labels))
        out_i = np.asarray(out_i)
        assert out_i.min() >= 0.0 and out_i.max() <= 1.0
        assert not np.array_equal(out_i, np.asarray(images))

    def test_bad_rank_raises(self):
        with pytest.raises(ValueError):
            augment_batch(jax.random.PRNGKey(0),
                          jnp.zeros((4, 4, 3)), jnp.zeros((1, 4, 4),
                                                          jnp.int32))
