"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The sharded programs must produce bit-identical results to their
single-device equivalents — the mesh only changes WHERE things run.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.configs import GridConfig, ModelConfig
from bugcar_image_segmentation_tpu.models.api import Engine
from bugcar_image_segmentation_tpu.models.enet import ENet
from bugcar_image_segmentation_tpu.parallel import (
    ShardedMultiCameraPipeline, data_sharding, make_mesh, replicated,
    shard_batch)
from bugcar_image_segmentation_tpu.pipeline import MultiCameraPipeline

from test_pipeline_eval import GRID, make_cal


class TestMesh:
    def test_make_mesh_axes(self):
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}
        mesh2 = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_shard_batch_places_leading_axis(self):
        mesh = make_mesh(8)
        x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
        (sx,) = shard_batch((x,), mesh)
        assert sx.sharding == data_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(x))

    def test_replicated_spec(self):
        mesh = make_mesh(8)
        assert replicated(mesh).spec == jax.sharding.PartitionSpec()


class TestShardedMultiCamera:
    def test_matches_single_device_pipeline(self, rng):
        mesh = make_mesh(8)
        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        engine = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        cals = [make_cal(yaw=0.1 * i - 0.4) for i in range(8)]
        frames = rng.integers(0, 256, size=(8, 48, 96, 3), dtype=np.uint8)

        local = MultiCameraPipeline(engine, cals, GRID)
        sharded = ShardedMultiCameraPipeline(engine, cals, GRID, mesh)

        np.testing.assert_array_equal(np.asarray(sharded(frames)),
                                      np.asarray(local(frames)))

    def test_rejects_indivisible_cameras(self):
        mesh = make_mesh(8)
        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        engine = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        cals = [make_cal() for _ in range(6)]
        try:
            ShardedMultiCameraPipeline(engine, cals, GRID, mesh)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "divide" in str(e)
