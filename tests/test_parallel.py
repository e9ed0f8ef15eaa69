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


class TestTensorParallel:
    """parallel/tp.py — spec unit tests + dp x tp parity with unsharded."""

    def test_tp_spec_for_known_shapes(self):
        from jax.sharding import PartitionSpec as P

        from bugcar_image_segmentation_tpu.parallel import tp_spec_for

        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        # Wide conv kernel: output channels shard over "model".
        k = np.zeros((3, 3, 64, 128), np.float32)
        assert tp_spec_for(("Conv_0", "kernel"), k, mesh) == \
            P(None, None, None, "model")
        # Wide dense kernel.
        d = np.zeros((256, 128), np.float32)
        assert tp_spec_for(("Dense_0", "kernel"), d, mesh) == P(None, "model")
        # Wide bias/scale shard their single axis.
        b = np.zeros((128,), np.float32)
        assert tp_spec_for(("Conv_0", "bias"), b, mesh) == P("model")
        assert tp_spec_for(("BatchNorm_0", "scale"), b, mesh) == P("model")
        # Narrow layers replicate (below min_channels).
        small = np.zeros((3, 3, 3, 16), np.float32)
        assert tp_spec_for(("Conv_0", "kernel"), small, mesh) == P()
        # Indivisible channel counts replicate (always-safe transform).
        odd = np.zeros((3, 3, 64, 129), np.float32)
        assert tp_spec_for(("Conv_0", "kernel"), odd, mesh) == P()
        # Non-parameter leaves (e.g. optimizer counters) replicate.
        assert tp_spec_for(("count",), np.zeros((), np.float32), mesh) == P()

    def test_shard_params_tp_places_expected_shardings(self):
        from jax.sharding import PartitionSpec as P

        from bugcar_image_segmentation_tpu.parallel import shard_params_tp

        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        tree = {
            "Conv_0": {"kernel": jnp.zeros((3, 3, 32, 128)),
                       "bias": jnp.zeros((128,))},
            "Conv_1": {"kernel": jnp.zeros((1, 1, 3, 16)),
                       "bias": jnp.zeros((16,))},
        }
        placed = shard_params_tp(tree, mesh)
        assert placed["Conv_0"]["kernel"].sharding.spec == \
            P(None, None, None, "model")
        assert placed["Conv_0"]["bias"].sharding.spec == P("model")
        assert placed["Conv_1"]["kernel"].sharding.spec == P()
        assert placed["Conv_1"]["bias"].sharding.spec == P()
        # Values are unchanged by placement.
        np.testing.assert_array_equal(
            np.asarray(placed["Conv_0"]["kernel"]),
            np.asarray(tree["Conv_0"]["kernel"]))

    def test_dp_tp_train_step_matches_unsharded(self, rng):
        """One dp x tp train step == the unsharded step (loss AND params).

        The mesh only changes WHERE tensors live; XLA's derived collectives
        must not change the math beyond float reassociation.
        """
        from bugcar_image_segmentation_tpu.models.unet import UNet
        from bugcar_image_segmentation_tpu.parallel import (replicate,
                                                            shard_params_tp)
        from bugcar_image_segmentation_tpu.training import (create_train_state,
                                                            make_train_step)

        import optax

        h, w, batch = 32, 64, 8
        images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)
        labels = rng.integers(0, 15, size=(batch, h, w)).astype(np.int32)
        model = UNet(num_classes=15, dtype=jnp.float32)
        step = jax.jit(make_train_step(model))
        key = jax.random.PRNGKey(7)
        # SGD, not Adam: Adam's update is sign-like (g/sqrt(g^2)), so for
        # near-zero gradients the reassociated cross-chip sums can flip an
        # element's direction — SGD keeps param drift linear in gradient
        # drift and the comparison tight.
        sgd = optax.sgd(1e-2)

        # Unsharded single-device step.
        state0 = create_train_state(model, (1, h, w, 3), seed=3,
                                    optimizer=sgd)
        ref_state, ref_loss = step(state0, jnp.asarray(images),
                                   jnp.asarray(labels), key)

        # dp x tp sharded step from the SAME initial state.
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        state1 = create_train_state(model, (1, h, w, 3), seed=3,
                                    optimizer=sgd)
        state1 = state1.replace(
            params=shard_params_tp(state1.params, mesh),
            batch_stats=shard_params_tp(state1.batch_stats, mesh),
            opt_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
                if np.ndim(x) == 0 else x,
                shard_params_tp(state1.opt_state, mesh),
                is_leaf=lambda x: not isinstance(x, (dict, list, tuple))))
        simages, slabels = shard_batch(
            (jnp.asarray(images), jnp.asarray(labels)), mesh)
        skey = jax.device_put(key, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        tp_state, tp_loss = step(state1, simages, slabels, skey)

        np.testing.assert_allclose(float(tp_loss), float(ref_loss),
                                   rtol=1e-5)
        ref_params = jax.tree_util.tree_leaves_with_path(ref_state.params)
        tp_params = dict(jax.tree_util.tree_leaves_with_path(tp_state.params))
        assert len(ref_params) == len(tp_params)
        for path, leaf in ref_params:
            np.testing.assert_allclose(
                np.asarray(tp_params[path]), np.asarray(leaf),
                rtol=1e-4, atol=5e-6,
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
        # The TP shardings must actually have taken: at least one updated
        # parameter stays channel-sharded after the step.
        specs = [leaf.sharding.spec
                 for leaf in jax.tree_util.tree_leaves(tp_state.params)
                 if hasattr(leaf, "sharding")]
        assert any("model" in spec for spec in specs), specs


class TestTensorParallelServing:
    def test_tp_engine_predict_matches_unsharded(self, rng):
        """shard_engine_tp: the SAME jitted predict runs column-parallel
        over the model axis (GSPMD from weight shardings alone) and must
        produce the unsharded engine's exact labels."""
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (make_mesh,
                                                            shard_engine_tp)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        x = rng.integers(0, 255, (2, 32, 64, 3), dtype=np.uint8)
        want = np.asarray(eng.predict(x))

        mesh = make_mesh(8, axes=("model",), shape=(8,))
        # min_channels=8 so the tiny test net actually shards layers
        shard_engine_tp(eng, mesh, min_channels=8)
        got = np.asarray(eng.predict(x))
        np.testing.assert_array_equal(got, want)

    def test_tp_engine_sharding_is_real(self, rng):
        """At least one kernel must actually be placed model-sharded."""
        import jax
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (make_mesh,
                                                            shard_engine_tp)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        mesh = make_mesh(8, axes=("model",), shape=(8,))
        shard_engine_tp(eng, mesh, min_channels=8)
        sharded = [
            leaf for leaf in jax.tree_util.tree_leaves(eng.variables)
            if hasattr(leaf, "sharding")
            and getattr(leaf.sharding, "spec", None) is not None
            and any(s is not None for s in leaf.sharding.spec)]
        assert sharded, "no leaf ended up model-sharded"

    def test_tp_sharding_survives_weight_apis(self, rng):
        """load_variables/cache_weights must re-place under the TP
        shardings; pack_weights(True) must refuse (the flat buffers
        would destroy the per-leaf placements)."""
        import jax
        import jax.numpy as jnp
        import pytest
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (make_mesh,
                                                            shard_engine_tp)

        def n_sharded(tree):
            return sum(
                1 for leaf in jax.tree_util.tree_leaves(tree)
                if hasattr(leaf, "sharding")
                and getattr(leaf.sharding, "spec", None) is not None
                and any(s is not None for s in leaf.sharding.spec))

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        plain = eng.variables
        mesh = make_mesh(8, axes=("model",), shape=(8,))
        shard_engine_tp(eng, mesh, min_channels=8)
        before = n_sharded(eng.variables)
        assert before > 0
        eng.load_variables(plain)            # hot-swap a PLAIN tree
        assert n_sharded(eng.variables) == before
        eng.cache_weights(jnp.bfloat16)
        assert n_sharded(eng.variables) == before
        with pytest.raises(ValueError, match="placer"):
            eng.pack_weights(True)


class TestSpatialServing:
    """parallel.spatial.shard_engine_spatial — rows of ONE frame across
    the mesh (GSPMD spatial partitioning; SURVEY.md §2c has no such axis
    in the reference)."""

    def test_spatial_enet_predict_matches_unsharded(self, rng):
        """Halo-local backbone: labels must be IDENTICAL — halo exchange
        reconstructs exactly the rows each conv window needs, so no
        floating-point order changes anywhere."""
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        x = rng.integers(0, 255, (2, 32, 64, 3), dtype=np.uint8)
        want = np.asarray(eng.predict(x))
        single = np.asarray(eng.predict(x[0]))

        mesh = make_mesh(4, axes=("space",))
        shard_engine_spatial(eng, mesh)
        got = np.asarray(eng.predict(x))
        np.testing.assert_array_equal(got, want)
        # unbatched path rebuilt too (stale traces would skip the mesh)
        np.testing.assert_array_equal(np.asarray(eng.predict(x[0])), single)

    def test_spatial_rejects_indivisible_rows(self):
        import jax.numpy as jnp
        import pytest
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        # ENet heights are multiples of 8, so use a 3-device mesh to
        # make the rows genuinely indivisible.
        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        with pytest.raises(ValueError, match="divide"):
            shard_engine_spatial(eng, make_mesh(3, axes=("space",)))

    def test_spatial_rejects_enet_fused(self):
        """The frozen fused-bottleneck executor is a pallas_call with no
        SPMD partitioning rule and no layout twin — refused outright
        (ADVICE r4) rather than silently served unsharded."""
        import pytest
        from bugcar_image_segmentation_tpu.models.api import build_engine
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = build_engine("enet_fused", cfg)
        with pytest.raises(ValueError, match="enet_fused"):
            shard_engine_spatial(eng, make_mesh(4, axes=("space",)))

    def test_spatial_weights_replicated_and_durable(self, rng):
        """Weights must be placed replicated over the mesh, and the
        placement must survive load_variables (the placer contract the
        TP path established)."""
        import jax
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        plain = eng.variables
        mesh = make_mesh(4, axes=("space",))
        shard_engine_spatial(eng, mesh)

        def all_mesh_replicated(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            return all(
                len(leaf.sharding.device_set) == 4
                and not any(s is not None for s in leaf.sharding.spec)
                for leaf in leaves if hasattr(leaf, "sharding"))

        assert all_mesh_replicated(eng.variables)
        eng.load_variables(plain)
        assert all_mesh_replicated(eng.variables)

    def test_spatial_segformer_predict_matches_unsharded(self, rng):
        """SegFormer under a spatial mesh (VERDICT r3 weak #3): the
        engine is rebuilt with xla_attention=True (stock NHWC layout +
        einsum attention — pallas_call has no SPMD partitioning rule),
        same parameter tree.  Two claims:
        (a) sharded == unsharded for the SAME xla_attention program
            (GSPMD only moves work; per-pixel math is order-identical),
        (b) vs the single-chip serving path (CHW stages + Pallas
            kernel) only float-tie argmax flips — budgeted like the
            layout-twin parity test (test_models.py)."""
        import pytest
        from bugcar_image_segmentation_tpu.models.api import build_engine
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)

        cfg = ModelConfig(name="segformer_b0", input_width=64,
                          input_height=64, num_classes=15, dtype="float32")
        eng = build_engine("segformer_b0", cfg)
        x = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        want_pallas = np.asarray(eng.predict(x))

        twin = Engine(eng.module.clone(xla_attention=True), cfg,
                      variables=eng.variables)
        want_xla = np.asarray(twin.predict(x))

        # 2-way: the deepest stage has 64/32 = 2 rows, and SegFormer
        # requires EVERY stage's rows to divide the mesh (uneven GSPMD
        # padding leaks through the attention all-gather in exported
        # replays — parallel/spatial.py guard, PERF.md round 4f).
        shard_engine_spatial(eng, make_mesh(2, axes=("space",)))
        got = np.asarray(eng.predict(x))

        np.testing.assert_array_equal(got, want_xla)
        flips = (got != want_pallas).mean()
        assert flips <= 0.02, (
            f"{flips:.2%} label flips vs the Pallas/CHW serving path "
            f"(budget 2%: layout twins differ only on float ties)")

        eng4 = build_engine("segformer_b0", cfg)
        with pytest.raises(ValueError, match="deepest stage"):
            shard_engine_spatial(eng4, make_mesh(4, axes=("space",)))

        # An _hc engine still spatial-serves: the clone drops the
        # cascade flag explicitly (transposed-head-only optimization;
        # the model RAISES on unreachable head_cascade, so this line
        # crashing would mean the drop regressed).  Labels match the
        # same xla_attention twin — spatial serving runs the exact
        # textbook head regardless of the single-chip variant.
        ehc = build_engine("segformer_b0_hc", cfg,
                          variables=eng4.variables)
        shard_engine_spatial(ehc, make_mesh(2, axes=("space",)))
        got_hc = np.asarray(ehc.predict(x))
        twin4 = Engine(eng4.module.clone(xla_attention=True), cfg,
                       variables=eng4.variables)
        np.testing.assert_array_equal(got_hc,
                                      np.asarray(twin4.predict(x)))

    def test_spatial_pipeline_grid_matches_unsharded(self, rng):
        """The fused frame→grid program built over a spatial engine must
        reproduce the single-device grid (the warp's packed gather
        all-gathers the sharded label map; everything upstream stays
        row-sharded)."""
        import jax.numpy as jnp
        from bugcar_image_segmentation_tpu.configs import ModelConfig
        from bugcar_image_segmentation_tpu.models.api import Engine
        from bugcar_image_segmentation_tpu.models.enet import ENet
        from bugcar_image_segmentation_tpu.parallel import (
            make_mesh, shard_engine_spatial)
        from bugcar_image_segmentation_tpu.pipeline import Pipeline

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        cal = make_cal()
        frame = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)

        eng = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        want = np.asarray(Pipeline(eng, cal, GRID)(frame))

        eng2 = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        shard_engine_spatial(eng2, make_mesh(4, axes=("space",)))
        got = np.asarray(Pipeline(eng2, cal, GRID)(frame))
        np.testing.assert_array_equal(got, want)


class TestSpatialTraining:
    def test_dp_sp_train_step_matches_unsharded(self, rng):
        """One dp x SPATIAL train step == the unsharded step (loss AND
        params): rows sharded over "space", batch over "data", params
        replicated — GSPMD derives the forward AND backward conv halo
        exchanges plus the space-axis gradient reduce.  ENet on purpose:
        its max-unpool scatter is the hardest op to partition."""
        import optax
        from bugcar_image_segmentation_tpu.parallel import replicate
        from bugcar_image_segmentation_tpu.parallel.spatial import (
            shard_batch_spatial)
        from bugcar_image_segmentation_tpu.training import (
            create_train_state, make_train_step)

        h, w, batch = 32, 64, 4
        images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)
        labels = rng.integers(0, 15, size=(batch, h, w)).astype(np.int32)
        model = ENet(num_classes=15, dtype=jnp.float32)
        step = jax.jit(make_train_step(model))
        key = jax.random.PRNGKey(7)
        sgd = optax.sgd(1e-2)  # see the dp x tp test for why not Adam

        state0 = create_train_state(model, (1, h, w, 3), seed=3,
                                    optimizer=sgd)
        ref_state, ref_loss = step(state0, jnp.asarray(images),
                                   jnp.asarray(labels), key)

        mesh = make_mesh(8, axes=("data", "space"), shape=(2, 4))
        state1 = create_train_state(model, (1, h, w, 3), seed=3,
                                    optimizer=sgd)
        state1 = replicate(state1, mesh)
        simages, slabels = shard_batch_spatial(
            (jnp.asarray(images), jnp.asarray(labels)), mesh)
        assert "space" in str(simages.sharding.spec)
        skey = jax.device_put(key, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        sp_state, sp_loss = step(state1, simages, slabels, skey)

        np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                                   rtol=1e-5)
        ref_params = jax.tree_util.tree_leaves_with_path(ref_state.params)
        sp_params = dict(jax.tree_util.tree_leaves_with_path(sp_state.params))
        assert len(ref_params) == len(sp_params)
        for path, leaf in ref_params:
            np.testing.assert_allclose(
                np.asarray(sp_params[path]), np.asarray(leaf),
                rtol=1e-4, atol=5e-6,
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
        # batch-norm stats come from row-sharded activations too
        ref_bs = jax.tree_util.tree_leaves(ref_state.batch_stats)
        sp_bs = jax.tree_util.tree_leaves(sp_state.batch_stats)
        for a, b in zip(ref_bs, sp_bs):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=5e-6)

    def test_dp_sp_segformer_train_step_matches_unsharded(self, rng):
        """VERDICT r4 #6: SegFormer's TRAINING forward is the XLA einsum
        attention path (models/segformer.py — ``if train or
        xla_attention``), which is exactly what makes it
        GSPMD-partitionable; SegFormer@1024² is the backbone whose
        activation footprint actually motivates spatial training.  One
        dp x space step must match the unsharded step (loss AND
        params)."""
        import optax
        from bugcar_image_segmentation_tpu.models.segformer import SegFormer
        from bugcar_image_segmentation_tpu.parallel import replicate
        from bugcar_image_segmentation_tpu.parallel.spatial import (
            shard_batch_spatial)
        from bugcar_image_segmentation_tpu.training import (
            create_train_state, make_train_step)

        h = w = 64
        batch = 4
        images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)
        labels = rng.integers(0, 15, size=(batch, h, w)).astype(np.int32)
        model = SegFormer.preset("b0", num_classes=15, dtype=jnp.float32)
        step = jax.jit(make_train_step(model))
        key = jax.random.PRNGKey(11)
        sgd = optax.sgd(1e-2)

        state0 = create_train_state(model, (1, h, w, 3), seed=5,
                                    optimizer=sgd)
        ref_state, ref_loss = step(state0, jnp.asarray(images),
                                   jnp.asarray(labels), key)

        # space=2: the deepest stage has 64/32 = 2 rows, and only even
        # splits are observationally safe (PERF.md round 4f).
        mesh = make_mesh(8, axes=("data", "space"), shape=(4, 2))
        state1 = create_train_state(model, (1, h, w, 3), seed=5,
                                    optimizer=sgd)
        state1 = replicate(state1, mesh)
        simages, slabels = shard_batch_spatial(
            (jnp.asarray(images), jnp.asarray(labels)), mesh)
        assert "space" in str(simages.sharding.spec)
        skey = jax.device_put(key, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        sp_state, sp_loss = step(state1, simages, slabels, skey)

        np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                                   rtol=1e-5)
        ref_params = jax.tree_util.tree_leaves_with_path(ref_state.params)
        sp_params = dict(
            jax.tree_util.tree_leaves_with_path(sp_state.params))
        assert len(ref_params) == len(sp_params)
        for path, leaf in ref_params:
            np.testing.assert_allclose(
                np.asarray(sp_params[path]), np.asarray(leaf),
                rtol=1e-4, atol=1e-5,
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
        ref_bs = jax.tree_util.tree_leaves(ref_state.batch_stats)
        sp_bs = jax.tree_util.tree_leaves(sp_state.batch_stats)
        for a, b in zip(ref_bs, sp_bs):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_shard_batch_spatial_rejects_scalars(self):
        import pytest
        from bugcar_image_segmentation_tpu.parallel.spatial import (
            shard_batch_spatial)
        mesh = make_mesh(8, axes=("data", "space"), shape=(2, 4))
        with pytest.raises(ValueError, match="rank-2"):
            shard_batch_spatial(jnp.zeros((8,)), mesh)
