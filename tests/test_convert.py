"""Converter round-trip: frozen TF graph → Flax variables → same outputs.

The reference's actual ``.pb`` blobs are stripped from the snapshot
(reference .MISSING_LARGE_BLOBS:1-3), so these tests do what SURVEY.md §7
prescribes: freeze small stand-in graphs covering every op pattern the
converter must handle (Conv2D, BiasAdd, FusedBatchNormV3,
Conv2DBackpropInput, DepthwiseConv2dNative, MatMul) and verify the
converted Flax model reproduces the TF graph's outputs numerically.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from bugcar_image_segmentation_tpu.convert import tf_graphdef as conv


def freeze(fn, input_spec):
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2)
    concrete = fn.get_concrete_function(input_spec)
    frozen = convert_variables_to_constants_v2(concrete)
    return frozen.graph.as_graph_def(), frozen


@pytest.fixture(scope="module")
def rng_np():
    return np.random.default_rng(42)


class TestExtraction:
    def test_conv_bn_bias_extracted_in_order(self, rng_np):
        w1 = tf.Variable(rng_np.normal(size=(3, 3, 3, 8)).astype(np.float32))
        b1 = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        gamma = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        beta = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        mean = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        var = tf.Variable(
            rng_np.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
        w2 = tf.Variable(rng_np.normal(size=(1, 1, 8, 4)).astype(np.float32))

        @tf.function
        def f(x):
            y = tf.nn.conv2d(x, w1, 1, "SAME")
            y = tf.nn.bias_add(y, b1)
            y, _, _ = tf.compat.v1.nn.fused_batch_norm(
                y, gamma, beta, mean, var, epsilon=1e-3, is_training=False)
            y = tf.nn.relu(y)
            return tf.nn.conv2d(y, w2, 1, "SAME")

        gd, _ = freeze(f, tf.TensorSpec([1, 8, 8, 3], tf.float32))
        ops = conv.extract_ops(gd)
        kinds = [o.kind for o in ops]
        assert kinds == ["conv", "bias", "batchnorm", "conv"]
        np.testing.assert_array_equal(ops[0].arrays["kernel"], w1.numpy())
        np.testing.assert_array_equal(ops[1].arrays["bias"], b1.numpy())
        np.testing.assert_array_equal(ops[2].arrays["variance"], var.numpy())
        np.testing.assert_allclose(ops[2].arrays["epsilon"], 1e-3)

    def test_load_graphdef_from_file(self, tmp_path, rng_np):
        w = tf.Variable(rng_np.normal(size=(1, 1, 2, 2)).astype(np.float32))

        @tf.function
        def f(x):
            return tf.nn.conv2d(x, w, 1, "SAME")

        gd, _ = freeze(f, tf.TensorSpec([1, 4, 4, 2], tf.float32))
        path = tmp_path / "tiny.pb"
        path.write_bytes(gd.SerializeToString())
        ops = conv.extract_ops(conv.load_graphdef(str(path)))
        assert [o.kind for o in ops] == ["conv"]


class TestCreationOrder:
    def test_records_dataflow_order(self):
        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(4, (3, 3), name="zz_first")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 name="aa_second")(x)
                return nn.Conv(2, (1, 1), name="mm_third")(x)

        _, order = conv.param_creation_order(
            Net(), jnp.zeros((1, 8, 8, 3), jnp.float32))
        modules = [p[0] for _, p in order]
        # Dataflow order, NOT alphabetical: zz before aa before mm.
        assert modules.index("zz_first") < modules.index("aa_second")
        assert modules.index("aa_second") < modules.index("mm_third")
        cols = {c for c, _ in order}
        assert cols == {"params", "batch_stats"}


class FlaxStandin(nn.Module):
    """Flax twin of the TF stand-in graph in TestFullRoundTrip."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), padding="SAME", name="c1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8,
                    use_bias=False, name="dw")(x)
        x = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=False, name="up")(x)
        x = nn.Conv(4, (1, 1), padding="SAME", use_bias=False,
                    name="head")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w * c)
        return nn.Dense(6, name="fc")(x)


class TestFullRoundTrip:
    def test_outputs_match_tf(self, rng_np):
        w1 = tf.Variable(rng_np.normal(size=(3, 3, 3, 8)).astype(np.float32))
        b1 = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        gamma = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        beta = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        mean = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        var = tf.Variable(
            rng_np.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
        wdw = tf.Variable(rng_np.normal(size=(3, 3, 8, 1)).astype(np.float32))
        wup = tf.Variable(rng_np.normal(size=(2, 2, 4, 8)).astype(np.float32))
        whead = tf.Variable(
            rng_np.normal(size=(1, 1, 4, 4)).astype(np.float32))
        wfc = tf.Variable(
            rng_np.normal(size=(16 * 16 * 4, 6)).astype(np.float32))
        bfc = tf.Variable(rng_np.normal(size=(6,)).astype(np.float32))

        @tf.function
        def f(x):
            y = tf.nn.conv2d(x, w1, 1, "SAME")
            y = tf.nn.bias_add(y, b1)
            y, _, _ = tf.compat.v1.nn.fused_batch_norm(
                y, gamma, beta, mean, var, epsilon=1e-3, is_training=False)
            y = tf.nn.relu(y)
            y = tf.nn.depthwise_conv2d(y, wdw, [1, 1, 1, 1], "SAME")
            y = tf.nn.conv2d_transpose(
                y, wup, [1, 16, 16, 4], [1, 2, 2, 1], "VALID")
            y = tf.nn.conv2d(y, whead, 1, "SAME")
            y = tf.reshape(y, [1, -1])
            return tf.linalg.matmul(y, wfc) + bfc

        gd, _ = freeze(f, tf.TensorSpec([1, 8, 8, 3], tf.float32))

        x = rng_np.normal(size=(1, 8, 8, 3)).astype(np.float32)
        tf_out = f(tf.constant(x)).numpy()

        module = FlaxStandin()
        variables = conv.pour_into_module(
            module, jnp.asarray(x), conv.extract_ops(gd))
        jax_out = np.asarray(module.apply(variables, jnp.asarray(x)))

        np.testing.assert_allclose(jax_out, tf_out, rtol=2e-4, atol=2e-4)

    def test_shape_mismatch_raises(self, rng_np):
        w = tf.Variable(rng_np.normal(size=(3, 3, 3, 99)).astype(np.float32))

        @tf.function
        def f(x):
            return tf.nn.conv2d(x, w, 1, "SAME")

        gd, _ = freeze(f, tf.TensorSpec([1, 8, 8, 3], tf.float32))

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Conv(8, (3, 3), use_bias=False)(x)

        with pytest.raises(ValueError, match="no conv-family graph op"):
            conv.pour_into_module(Tiny(), jnp.zeros((1, 8, 8, 3)),
                                  conv.extract_ops(gd))


class TestFoldBatchnorm:
    def test_fold_matches_fused_bn(self, rng_np):
        c = 8
        x = rng_np.normal(size=(2, 4, 4, c)).astype(np.float32)
        gamma = rng_np.normal(size=(c,)).astype(np.float32)
        beta = rng_np.normal(size=(c,)).astype(np.float32)
        mean = rng_np.normal(size=(c,)).astype(np.float32)
        var = rng_np.uniform(0.5, 2.0, size=(c,)).astype(np.float32)
        mult, shift = conv.fold_batchnorm(gamma, beta, mean, var, 1e-3)
        ref, _, _ = tf.compat.v1.nn.fused_batch_norm(
            tf.constant(x), gamma, beta, mean, var, epsilon=1e-3,
            is_training=False)
        np.testing.assert_allclose(x * mult + shift, ref.numpy(),
                                   rtol=1e-5, atol=1e-5)


class TestDecomposedPrelu:
    """The alpha-recovery matcher across the known TF1 decompositions.

    Stock TF1 has no Prelu op; real exports contain one of these algebraic
    forms (VERDICT r1 Missing #3 — the round-1 converter only matched a
    literal 'Prelu' node)."""

    def _freeze_and_extract(self, f, shape=(1, 4, 4, 8)):
        gd, _ = freeze(f, tf.TensorSpec(list(shape), tf.float32))
        return conv.extract_ops(gd)

    def _check(self, make_fn, alpha_np, rng_np):
        w = tf.Variable(rng_np.normal(size=(1, 1, 8, 8)).astype(np.float32))
        alpha = tf.Variable(alpha_np)

        @tf.function
        def f(x):
            y = tf.nn.conv2d(x, w, 1, "SAME")
            return make_fn(y, alpha)

        ops = self._freeze_and_extract(f)
        kinds = [o.kind for o in ops]
        assert kinds == ["conv", "prelu"], kinds
        np.testing.assert_allclose(ops[1].arrays["alpha"], alpha_np,
                                   rtol=1e-6)

    def test_slim_abs_form(self, rng_np):
        """relu(x) + alpha*(x-|x|)*0.5 — the kwotsin/slim ENet idiom."""
        a = rng_np.uniform(0.1, 0.5, size=(8,)).astype(np.float32)
        self._check(lambda y, al: tf.nn.relu(y)
                    + al * (y - tf.abs(y)) * 0.5, a, rng_np)

    def test_keras_neg_relu_form(self, rng_np):
        """relu(x) + (-alpha)*relu(-x) — Keras PReLU's decomposition."""
        a = rng_np.uniform(0.1, 0.5, size=(8,)).astype(np.float32)
        self._check(lambda y, al: tf.nn.relu(y)
                    + (-al) * tf.nn.relu(-y), a, rng_np)

    def test_sub_relu_form(self, rng_np):
        """relu(x) - alpha*relu(-x) — the Sub-combiner variant."""
        a = rng_np.uniform(0.1, 0.5, size=(8,)).astype(np.float32)
        self._check(lambda y, al: tf.nn.relu(y)
                    - al * tf.nn.relu(-y), a, rng_np)

    def test_minimum_form(self, rng_np):
        """relu(x) + alpha*minimum(x, 0) — the tf.minimum variant."""
        a = rng_np.uniform(0.1, 0.5, size=(8,)).astype(np.float32)
        self._check(lambda y, al: tf.nn.relu(y)
                    + al * tf.minimum(y, 0.0), a, rng_np)

    def test_plain_scale_mul_not_misread(self, rng_np):
        """A const-folded scale Mul (BN-like) must NOT be taken for a
        PReLU alpha — its input is the conv output, not a Relu/Abs/Neg
        branch."""
        w = tf.Variable(rng_np.normal(size=(1, 1, 8, 8)).astype(np.float32))
        scale = tf.Variable(
            rng_np.uniform(0.5, 2.0, size=(8,)).astype(np.float32))
        shift = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))

        @tf.function
        def f(x):
            y = tf.nn.conv2d(x, w, 1, "SAME")
            return y * scale + shift

        ops = self._freeze_and_extract(f)
        assert [o.kind for o in ops] == ["conv"], [o.kind for o in ops]


class TestDeepLabPreamble:
    """Real DeepLab exports embed preprocessing and a final ArgMax
    (reference models.py:100-101: ImageTensor → SemanticPredictions);
    none of it may be misread as weights."""

    def test_preamble_and_argmax_skipped(self, rng_np):
        w = tf.Variable(rng_np.normal(size=(3, 3, 3, 8)).astype(np.float32))
        b = tf.Variable(rng_np.normal(size=(8,)).astype(np.float32))
        wd = tf.Variable(rng_np.normal(size=(3, 3, 8, 1)).astype(np.float32))
        wp = tf.Variable(rng_np.normal(size=(1, 1, 8, 5)).astype(np.float32))

        @tf.function
        def f(x):
            # uint8 → float, resize, scale to [-1, 1]: mobilenet preproc.
            y = tf.cast(x, tf.float32)
            y = tf.image.resize(y, [16, 16])
            y = y * (2.0 / 255.0) - 1.0
            y = tf.nn.conv2d(y, w, 1, "SAME")
            y = tf.nn.bias_add(y, b)
            y = tf.nn.relu6(y)
            y = tf.nn.depthwise_conv2d(y, wd, [1, 1, 1, 1], "SAME")
            y = tf.nn.conv2d(y, wp, 1, "SAME")
            # embedded argmax: the graph returns predictions, not logits.
            return tf.argmax(y, axis=-1, output_type=tf.int32)

        gd, _ = freeze(f, tf.TensorSpec([1, 20, 24, 3], tf.uint8))
        ops = conv.extract_ops(gd)
        assert [o.kind for o in ops] == \
            ["conv", "bias", "depthwise", "conv"], [o.kind for o in ops]
