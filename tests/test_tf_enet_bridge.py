"""Deploy-bridge round-trip: Flax ENet ⇄ era-correct frozen TF1 GraphDef.

Closes the two converter gaps from round 1 (VERDICT.md Missing #2/#3):

- The reverse bridge: trained Flax variables → frozen ``.pb`` with the
  reference's exact tensor contract (``input0:0`` NCHW float →
  ``CATkrIDy/concat:0`` NCHW logits, reference models.py:15-16,52),
  equivalent to ``freeze_session`` (reference utils.py:49-83).
- Converter robustness against era-correct TF1 op patterns: the frozen
  twin contains decomposed PReLU (no ``Prelu`` op exists in stock TF1),
  ``MaxPoolWithArgmax`` + ``ScatterNd`` unpooling, ``FusedBatchNorm``
  and ``Conv2DBackpropInput`` — and must round-trip through
  ``convert_frozen_graph`` with exact logit parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from bugcar_image_segmentation_tpu.convert import tf_graphdef as conv
from bugcar_image_segmentation_tpu.convert import tf_enet
from bugcar_image_segmentation_tpu.models.enet import ENet

H, W, NCLASS = 32, 64, 15


@pytest.fixture(scope="module")
def flax_model_and_vars():
    model = ENet(num_classes=NCLASS, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(11),
                           jnp.zeros((1, H, W, 3)), train=False)
    return model, variables


@pytest.fixture(scope="module")
def frozen_graphdef(flax_model_and_vars):
    _, variables = flax_model_and_vars
    forward, _ = tf_enet.build_enet_tf(variables, NCLASS, (H, W))
    return tf_enet.freeze_function(
        forward, tf.TensorSpec([None, 3, H, W], tf.float32, name="input0"))


@pytest.fixture(scope="module")
def batch(rng_module):
    return rng_module.normal(size=(2, H, W, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(5)


def run_reference_style(graph_def, nchw_batch):
    """Execute the frozen graph exactly as the reference's ENET loader
    does (models.py:21-31, 43-44): import_graph_def + Session.run on the
    hardcoded tensor names."""
    g = tf.Graph()
    with g.as_default():
        tf.import_graph_def(graph_def, name="")
        with tf.compat.v1.Session(graph=g) as sess:
            return sess.run("CATkrIDy/concat:0",
                            {"input0:0": nchw_batch})


class TestEraCorrectExtraction:
    def test_decomposed_prelu_and_pool_patterns_present(self,
                                                        frozen_graphdef):
        """The twin must actually contain the era-correct patterns — no
        Prelu convenience op, argmax pooling, scatter unpooling."""
        ops = {n.op for n in frozen_graphdef.node}
        assert "Prelu" not in ops
        assert "MaxPoolWithArgmax" in ops
        assert "ScatterNd" in ops
        assert "Conv2DBackpropInput" in ops
        assert ops & {"FusedBatchNorm", "FusedBatchNormV2",
                      "FusedBatchNormV3"}

    def test_extract_ops_recovers_every_parameter(self, flax_model_and_vars,
                                                  frozen_graphdef):
        """Every PReLU alpha / conv / BN in the Flax tree must come back
        out of the era-correct graph — none silently skipped, and none of
        the unpooling's integer arithmetic misread as weights."""
        _, variables = flax_model_and_vars
        ops = conv.extract_ops(frozen_graphdef)
        kinds = {}
        for o in ops:
            kinds[o.kind] = kinds.get(o.kind, 0) + 1

        def count(tree, pred):
            total = 0
            for name, sub in tree.items():
                if isinstance(sub, dict):
                    total += count(sub, pred)
                elif pred(name, tree):
                    total += 1
            return total

        params = variables["params"]
        n_alpha = count(params, lambda n, mod: n == "alpha")
        # BatchNorm biases are poured from the FusedBatchNorm op, not the
        # bias queue — a BN module is recognizable by its 'scale' sibling.
        n_bias = count(params,
                       lambda n, mod: n == "bias" and "scale" not in mod)
        n_bn = count(params, lambda n, mod: n == "scale")
        n_kernel = count(params, lambda n, mod: n == "kernel")

        assert kinds.get("prelu", 0) == n_alpha
        assert kinds.get("batchnorm", 0) == n_bn
        assert kinds.get("bias", 0) == n_bias
        assert kinds.get("conv", 0) + kinds.get("conv_transpose", 0) \
            == n_kernel
        assert kinds.get("depthwise", 0) == 0


class TestLogitParity:
    def test_tf_twin_matches_flax(self, flax_model_and_vars,
                                  frozen_graphdef, batch):
        """The frozen era-correct graph computes the same function as the
        Flax model (fp tolerance — different conv libraries)."""
        model, variables = flax_model_and_vars
        flax_logits = np.asarray(
            model.apply(variables, jnp.asarray(batch), train=False))
        tf_logits = run_reference_style(
            frozen_graphdef, batch.transpose(0, 3, 1, 2))
        np.testing.assert_allclose(tf_logits.transpose(0, 2, 3, 1),
                                   flax_logits, rtol=1e-4, atol=1e-4)

    def test_roundtrip_reload_is_exact(self, flax_model_and_vars,
                                       frozen_graphdef, batch):
        """pb → convert_frozen_graph → Flax gives back the original
        weights exactly (layout transforms are involutions; the prelu
        alpha recovery's scalar chain 2*0.5 is exact in float32)."""
        model, variables = flax_model_and_vars
        ops = conv.extract_ops(frozen_graphdef)
        poured = conv.pour_into_module(model, jnp.zeros((1, H, W, 3)), ops)

        orig = jax.tree_util.tree_leaves_with_path(variables)
        got = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, poured)))
        assert len(orig) == len(got)
        for path, leaf in orig:
            np.testing.assert_array_equal(
                got[path], np.asarray(leaf),
                err_msg=f"weight drift at {jax.tree_util.keystr(path)}")

        flax_logits = model.apply(variables, jnp.asarray(batch),
                                  train=False)
        poured_logits = model.apply(poured, jnp.asarray(batch),
                                    train=False)
        np.testing.assert_array_equal(np.asarray(poured_logits),
                                      np.asarray(flax_logits))


class TestExportPb:
    def test_export_reload_reference_contract(self, flax_model_and_vars,
                                              batch, tmp_path):
        """export_enet_pb writes a file the reference's loader serves
        as-is, and convert_frozen_graph reads back losslessly."""
        model, variables = flax_model_and_vars
        pb = str(tmp_path / "enet.pb")
        tf_enet.export_enet_pb(variables, NCLASS, (H, W), pb)

        gd = conv.load_graphdef(pb)
        assert all(n.device == "" for n in gd.node)  # utils.py:78-80
        tf_logits = run_reference_style(gd, batch.transpose(0, 3, 1, 2))
        assert tf_logits.shape == (2, NCLASS, H, W)

        reloaded = conv.convert_frozen_graph(pb, model,
                                             jnp.zeros((1, H, W, 3)))
        flax_logits = model.apply(variables, jnp.asarray(batch),
                                  train=False)
        re_logits = model.apply(reloaded, jnp.asarray(batch), train=False)
        np.testing.assert_array_equal(np.asarray(re_logits),
                                      np.asarray(flax_logits))
