"""Temporal grid fusion: evidence semantics and learning-loop sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.fusion import (FusionState,
                                                  TemporalGridFusion,
                                                  fuse_step)


def g(values):
    return jnp.asarray(np.asarray(values, np.int8))


class TestFuseStep:
    def test_unknown_everywhere_until_observed(self):
        state = FusionState.create((2, 2))
        state, fused = fuse_step(state, g([[-1, -1], [-1, 0]]))
        out = np.asarray(fused)
        assert out[0, 0] == -1 and out[0, 1] == -1 and out[1, 0] == -1
        assert out[1, 1] == 0

    def test_occupied_needs_evidence_and_decays(self):
        fusion = TemporalGridFusion((1, 1), decay=0.5, step=1.0,
                                    occupied_threshold=0.5)
        # one occupied observation → odds 1.0 > 0.5 → occupied
        assert int(fusion.update(g([[100]]))[0, 0]) == 100
        # consistent free observations flip it back
        fusion.update(g([[0]]))
        out = fusion.update(g([[0]]))
        assert int(out[0, 0]) == 0

    def test_flicker_suppression(self):
        """A single spurious occupied frame amid free frames must not
        flip a long-observed free cell."""
        fusion = TemporalGridFusion((1, 1), decay=0.9, step=1.0,
                                    occupied_threshold=1.5)
        for _ in range(10):
            fusion.update(g([[0]]))
        out = fusion.update(g([[100]]))   # one glitch frame
        assert int(out[0, 0]) == 0
        # but persistent evidence does flip it
        for _ in range(10):
            out = fusion.update(g([[100]]))
        assert int(out[0, 0]) == 100

    def test_memory_of_fov_exits(self):
        """Cells that leave the FOV keep their last belief (decayed), not
        reset to unknown."""
        fusion = TemporalGridFusion((1, 1), decay=0.9)
        for _ in range(5):
            fusion.update(g([[100]]))
        out = fusion.update(g([[-1]]))    # now outside FOV
        assert int(out[0, 0]) == 100

    def test_scan_composability(self):
        """fuse_step threads through lax.scan (online filtering shape)."""
        frames = jnp.stack([g([[100, 0]]), g([[100, -1]]), g([[0, 0]])])

        def body(state, frame):
            return fuse_step(state, frame)

        state, fused_seq = jax.lax.scan(body, FusionState.create((1, 2)),
                                        frames)
        assert fused_seq.shape == (3, 1, 2)
        assert int(fused_seq[1, 0, 0]) == 100
