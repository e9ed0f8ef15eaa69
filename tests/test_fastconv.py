"""Parity of the phase-packed stride-2 convs (models/fastconv.py).

The fast modules must be numerically interchangeable with the stock Flax
layers **on the same parameter tree** — that is what lets the GraphDef
converter (convert/tf_graphdef.py), checkpoints, and the reverse deploy
bridge keep working while the compute path changes underneath.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bugcar_image_segmentation_tpu.models.fastconv import (
    FastConvTranspose2x, FastStemConv2x, depth_to_space, space_to_depth)


RNG = jax.random.PRNGKey(7)


def test_space_depth_roundtrip():
    x = jax.random.normal(RNG, (2, 8, 12, 5))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)
    # layout: channel blocks are (row-phase, col-phase, c), row-major
    s = space_to_depth(x)
    np.testing.assert_array_equal(s[0, 1, 2, 5:10], x[0, 2, 5, :])  # r0 s1
    np.testing.assert_array_equal(s[0, 1, 2, 10:15], x[0, 3, 4, :])  # r1 s0


@pytest.mark.parametrize("kernel,use_bias", [(3, False), (3, True),
                                             (2, False), (2, True)])
def test_conv_transpose_parity(kernel, use_bias):
    x = jax.random.normal(RNG, (2, 16, 24, 7), jnp.float32)
    ref = nn.ConvTranspose(5, (kernel, kernel), strides=(2, 2),
                           padding="SAME", use_bias=use_bias,
                           dtype=jnp.float32, param_dtype=jnp.float32)
    fast = FastConvTranspose2x(5, kernel=kernel, use_bias=use_bias,
                               dtype=jnp.float32)
    v = ref.init(RNG, x)
    vf = fast.init(RNG, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape
    y_ref = ref.apply(v, x)
    y_fast = fast.apply(v, x)  # ref's params through the fast path
    assert y_ref.shape == y_fast.shape
    np.testing.assert_allclose(y_fast, y_ref, atol=1e-5)


def test_conv_transpose_odd_input_ok():
    # Transposed-conv SAME padding is input-parity independent (output is
    # exactly 2x the input); odd inputs must still match.
    x = jax.random.normal(RNG, (1, 15, 9, 3), jnp.float32)
    ref = nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="SAME",
                           use_bias=False, dtype=jnp.float32,
                           param_dtype=jnp.float32)
    fast = FastConvTranspose2x(4, kernel=3, use_bias=False,
                               dtype=jnp.float32)
    v = ref.init(RNG, x)
    np.testing.assert_allclose(fast.apply(v, x), ref.apply(v, x), atol=1e-5)


def test_stem_parity():
    x = jax.random.normal(RNG, (2, 16, 24, 3), jnp.float32)
    ref = nn.Conv(13, (3, 3), strides=(2, 2), padding="SAME",
                  use_bias=False, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    fast = FastStemConv2x(13, dtype=jnp.float32)
    v = ref.init(RNG, x)
    vf = fast.init(RNG, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    np.testing.assert_allclose(fast.apply(v, x), ref.apply(v, x), atol=1e-5)


def test_stem4x_parity():
    from bugcar_image_segmentation_tpu.models.fastconv import FastStemConv4x

    x = jax.random.normal(RNG, (2, 24, 32, 3), jnp.float32)
    ref = nn.Conv(16, (7, 7), strides=(4, 4), padding="SAME",
                  dtype=jnp.float32, param_dtype=jnp.float32)
    fast = FastStemConv4x(16, dtype=jnp.float32)
    v = ref.init(RNG, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(RNG, x)))
    np.testing.assert_allclose(fast.apply(v, x), ref.apply(v, x),
                               atol=1e-4, rtol=1e-5)


def test_stem4x_rejects_bad_input():
    from bugcar_image_segmentation_tpu.models.fastconv import FastStemConv4x

    fast = FastStemConv4x(8, dtype=jnp.float32)
    v = fast.init(RNG, jnp.zeros((1, 16, 16, 3), jnp.float32))
    with pytest.raises(ValueError, match="divisible by 4"):
        fast.apply(v, jnp.zeros((1, 18, 16, 3), jnp.float32))


def test_segformer_patch_embed_parity():
    # The packed embeds must match the stock strided convs from the same
    # variables (k7s4 stage-1 and k3s2 later stages).
    from bugcar_image_segmentation_tpu.models.segformer import (
        OverlapPatchEmbed)

    for (k, s, cin) in ((7, 4, 3), (3, 2, 32)):
        x = jax.random.normal(RNG, (1, 16, 24, cin), jnp.float32)
        emb = OverlapPatchEmbed(16, k, s, dtype=jnp.float32)
        v = emb.init(RNG, x)
        conv_ref = nn.Conv(16, (k, k), strides=(s, s), padding="SAME",
                           dtype=jnp.float32, param_dtype=jnp.float32)
        ref = conv_ref.apply({"params": v["params"]["Conv_0"]}, x)
        ln = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)
        ref = ln.apply({"params": v["params"]["LayerNorm_0"]}, ref)
        got = emb.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)


def test_down_conv_parity():
    from bugcar_image_segmentation_tpu.models.fastconv import FastDownConv2x

    x = jax.random.normal(RNG, (2, 16, 24, 16), jnp.float32)
    ref = nn.Conv(8, (2, 2), strides=(2, 2), padding="SAME",
                  use_bias=False, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    fast = FastDownConv2x(8, dtype=jnp.float32)
    v = ref.init(RNG, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(RNG, x)))
    np.testing.assert_allclose(fast.apply(v, x), ref.apply(v, x), atol=1e-5)


def test_down_conv_rejects_odd_input():
    from bugcar_image_segmentation_tpu.models.fastconv import FastDownConv2x

    fast = FastDownConv2x(8, dtype=jnp.float32)
    v = fast.init(RNG, jnp.zeros((1, 16, 16, 4), jnp.float32))
    with pytest.raises(ValueError, match="even"):
        fast.apply(v, jnp.zeros((1, 15, 16, 4), jnp.float32))


def test_stem_rejects_odd_input():
    x = jnp.zeros((1, 15, 16, 3), jnp.float32)
    fast = FastStemConv2x(13, dtype=jnp.float32)
    v = fast.init(RNG, jnp.zeros((1, 16, 16, 3), jnp.float32))
    with pytest.raises(ValueError, match="even"):
        fast.apply(v, x)


def test_enet_fast_slow_parity():
    from bugcar_image_segmentation_tpu.models.enet import ENet

    x = jax.random.normal(RNG, (1, 32, 64, 3), jnp.float32)
    slow = ENet(num_classes=15, dtype=jnp.float32, fast=False)
    fast = ENet(num_classes=15, dtype=jnp.float32, fast=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(RNG, x, train=False)))
    y_slow = slow.apply(v, x, train=False)
    y_fast = fast.apply(v, x, train=False)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)


def test_unet_fast_slow_parity():
    from bugcar_image_segmentation_tpu.models.unet import UNet

    x = jax.random.normal(RNG, (1, 32, 32, 3), jnp.float32)
    slow = UNet(num_classes=15, widths=(8, 16), bottleneck_width=32,
                dtype=jnp.float32, fast=False)
    fast = UNet(num_classes=15, widths=(8, 16), bottleneck_width=32,
                dtype=jnp.float32, fast=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(RNG, x, train=False)))
    np.testing.assert_allclose(fast.apply(v, x, train=False),
                               slow.apply(v, x, train=False),
                               atol=2e-4, rtol=1e-4)


def test_initial_block_chw_path_parity():
    # The CHW inference stem must match the textbook lowering from the
    # same variables (init traces the CHW branch; train apply traces the
    # textbook one — same tree both ways).
    from bugcar_image_segmentation_tpu.models.enet import InitialBlock

    x = jax.random.normal(RNG, (2, 16, 24, 3), jnp.float32)
    fast = InitialBlock(dtype=jnp.float32, fast=True)
    slow = InitialBlock(dtype=jnp.float32, fast=False)
    vf = fast.init(RNG, x, train=False)
    vs = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(vf)
            == jax.tree_util.tree_structure(vs))
    y_fast = fast.apply(vf, x, train=False)
    y_slow = slow.apply(vf, x, train=False)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)
    # train-mode apply on the CHW-initialized tree runs and mutates stats
    (_, mutated) = fast.apply(vf, x, train=True, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(mutated["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(vf["batch_stats"]["BatchNorm_0"]["mean"]))


@pytest.mark.parametrize("width", [16, 64])
def test_regular_bottleneck_chw_path_parity(width):
    from bugcar_image_segmentation_tpu.models.enet import Bottleneck

    x = jax.random.normal(RNG, (2, 12, 20, width), jnp.float32)
    slow = Bottleneck(width, "regular", dtype=jnp.float32, fast=False)
    fast = Bottleneck(width, "regular", dtype=jnp.float32, fast=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                fast.init(RNG, x, train=False)))
    y_slow, _ = slow.apply(v, x, train=False)
    y_fast, _ = fast.apply(v, x, train=False)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)


def test_regular_bottleneck_chw_init_then_train_apply():
    from bugcar_image_segmentation_tpu.models.enet import Bottleneck

    x = jax.random.normal(RNG, (1, 8, 8, 16), jnp.float32)
    mod = Bottleneck(16, "regular", dtype=jnp.float32, fast=True)
    v = mod.init(RNG, x, train=False)      # traces the CHW branch
    (y, _), mutated = mod.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    assert y.shape == x.shape
    assert not np.allclose(
        np.asarray(mutated["batch_stats"]["proj"]["BatchNorm_0"]["mean"]),
        np.asarray(v["batch_stats"]["proj"]["BatchNorm_0"]["mean"]))


def test_down_bottleneck_chw_path_parity():
    from bugcar_image_segmentation_tpu.models.enet import Bottleneck

    x = jax.random.normal(RNG, (2, 16, 24, 16), jnp.float32)
    slow = Bottleneck(64, "down", dtype=jnp.float32, fast=False)
    fast = Bottleneck(64, "down", dtype=jnp.float32, fast=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                fast.init(RNG, x, train=False)))
    y_slow, i_slow = slow.apply(v, x, train=False)
    y_fast, i_fast = fast.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(i_fast), np.asarray(i_slow))
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)


def test_up_bottleneck_chw_path_parity():
    # Default fast path: CHW phase domain (phase_up=False).
    from bugcar_image_segmentation_tpu.models.enet import (
        Bottleneck, max_pool_with_indices)

    x_hi = jax.random.normal(RNG, (2, 16, 24, 16), jnp.float32)
    _, idx = max_pool_with_indices(x_hi)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 12, 64),
                          jnp.float32)
    slow = Bottleneck(16, "up", dtype=jnp.float32, fast=False)
    fast = Bottleneck(16, "up", dtype=jnp.float32, fast=True)
    v = slow.init(RNG, x, train=False, pool_idx=idx)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                fast.init(RNG, x, train=False, pool_idx=idx)))
    y_slow, _ = slow.apply(v, x, train=False, pool_idx=idx)
    y_fast, _ = fast.apply(v, x, train=False, pool_idx=idx)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)


def test_down_up_chw_init_then_train_apply():
    from bugcar_image_segmentation_tpu.models.enet import (
        Bottleneck, max_pool_with_indices)

    # down: init traces CHW, train apply traces textbook — same tree
    x = jax.random.normal(RNG, (1, 8, 8, 16), jnp.float32)
    down = Bottleneck(64, "down", dtype=jnp.float32, fast=True)
    v = down.init(RNG, x, train=False)
    (y, idx), _ = down.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(0)})
    assert y.shape == (1, 4, 4, 64)
    # up likewise
    x_hi = jax.random.normal(RNG, (1, 8, 8, 16), jnp.float32)
    _, idx1 = max_pool_with_indices(x_hi)
    up = Bottleneck(16, "up", dtype=jnp.float32, fast=True)
    vu = up.init(RNG, jnp.zeros((1, 4, 4, 64)), train=False, pool_idx=idx1)
    (yu, _), _ = up.apply(vu, jnp.zeros((1, 4, 4, 64)), train=True,
                          pool_idx=idx1, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert yu.shape == (1, 8, 8, 16)


def test_up_bottleneck_phase_path_parity():
    # The phase-domain up-bottleneck (inference fast path) must match the
    # textbook lowering bit-for-bit-ish at f32, from the SAME variables.
    from bugcar_image_segmentation_tpu.models.enet import (
        Bottleneck, max_pool_with_indices)

    x_hi = jax.random.normal(RNG, (2, 16, 24, 16), jnp.float32)
    pooled, idx = max_pool_with_indices(x_hi)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 12, 64),
                          jnp.float32)
    slow = Bottleneck(16, "up", dtype=jnp.float32, fast=False)
    fast = Bottleneck(16, "up", dtype=jnp.float32, fast=True,
                      phase_up=True)
    v = slow.init(RNG, x, train=False, pool_idx=idx)
    vf = fast.init(RNG, x, train=False, pool_idx=idx)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    y_slow, _ = slow.apply(v, x, train=False, pool_idx=idx)
    y_fast, _ = fast.apply(v, x, train=False, pool_idx=idx)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)


def test_up_bottleneck_phase_init_then_train_apply():
    # init traces the inference (phase) branch; a train-mode apply runs
    # the textbook modules over the same tree and must mutate batch_stats.
    from bugcar_image_segmentation_tpu.models.enet import (
        Bottleneck, max_pool_with_indices)

    x_hi = jax.random.normal(RNG, (1, 8, 8, 16), jnp.float32)
    _, idx = max_pool_with_indices(x_hi)
    x = jax.random.normal(RNG, (1, 4, 4, 64), jnp.float32)
    mod = Bottleneck(16, "up", dtype=jnp.float32, fast=True, phase_up=True)
    v = mod.init(RNG, x, train=False, pool_idx=idx)
    (y, _), mutated = mod.apply(
        v, x, train=True, pool_idx=idx, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    assert y.shape == (1, 8, 8, 16)
    before = v["batch_stats"]["deconv_bn"]["mean"]
    after = mutated["batch_stats"]["deconv_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_deeplab_convbn_fast_stem_parity():
    from bugcar_image_segmentation_tpu.models.deeplab import ConvBN

    x = jax.random.normal(RNG, (2, 16, 24, 3), jnp.float32)
    slow = ConvBN(32, (3, 3), strides=(2, 2), dtype=jnp.float32)
    fast = ConvBN(32, (3, 3), strides=(2, 2), dtype=jnp.float32,
                  fast_stem=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                fast.init(RNG, x, train=False)))
    y_slow = slow.apply(v, x, train=False)
    y_fast = fast.apply(v, x, train=False)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)
    # train apply on the fast-initialized tree uses the textbook modules
    _, mutated = fast.apply(v, x, train=True, mutable=["batch_stats"])
    assert "BatchNorm_0" in mutated["batch_stats"]


def test_fast_path_differentiable():
    # The fast lowering trains: grads flow through the kernel re-indexing.
    x = jax.random.normal(RNG, (1, 8, 8, 4), jnp.float32)
    mod = FastConvTranspose2x(3, kernel=3, use_bias=True, dtype=jnp.float32)
    v = mod.init(RNG, x)

    def loss(params):
        return jnp.sum(mod.apply(params, x) ** 2)

    g = jax.grad(loss)(v)
    assert all(np.all(np.isfinite(leaf))
               for leaf in jax.tree_util.tree_leaves(g))
    assert float(jnp.max(jnp.abs(g["params"]["kernel"]))) > 0


@pytest.mark.parametrize("rate", [1, 2, 6])
def test_shift_matmul_conv_parity(rate):
    """ShiftMatmulConv3x3 == lax dilated conv on the same kernel."""
    from bugcar_image_segmentation_tpu.models.fastconv import (
        ShiftMatmulConv3x3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 20),
                          jnp.float32)
    m = ShiftMatmulConv3x3(12, dilation=(rate, rate), dtype=jnp.float32)
    variables = m.init(RNG, x)
    got = m.apply(variables, x)
    ref = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"], (1, 1), "SAME",
        rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_convbn_dilated_inference_path_parity():
    """ConvBN auto-selects the shifted lowering for dilated 3x3s at
    inference; same variables, same output as the stock conv path."""
    from bugcar_image_segmentation_tpu.models.deeplab import ConvBN
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 12, 24),
                          jnp.float32)
    fast = ConvBN(16, (3, 3), dilation=(6, 6), dtype=jnp.float32)
    slow = ConvBN(16, (3, 3), dilation=(6, 6), dtype=jnp.float32,
                  shift_matmul=False)
    variables = fast.init(RNG, x)
    # identical param trees (incl. under the stock path)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables,
        slow.init(RNG, x)))
    np.testing.assert_allclose(
        np.asarray(fast.apply(variables, x)),
        np.asarray(slow.apply(variables, x)), rtol=1e-5, atol=1e-5)
    # training always takes the stock conv (differentiable, BN updating)
    out, _ = fast.apply(variables, x, train=True,
                        mutable=["batch_stats"])
    assert out.shape == (1, 8, 12, 16)


@pytest.mark.parametrize("strides,rate,hw", [
    ((1, 1), 1, (16, 24)), ((1, 1), 2, (16, 24)),
    ((2, 2), 1, (16, 24)), ((2, 2), 1, (30, 14)),
])
def test_depthwise_shift_parity(strides, rate, hw):
    """DepthwiseConv3x3Shift == grouped nn.Conv (SAME, no bias): stride 1
    at any dilation (nine scaled shifts), stride 2 on even dims (phase
    form).  Same param tree (kernel (3, 3, 1, C))."""
    from bugcar_image_segmentation_tpu.models.fastconv import (
        DepthwiseConv3x3Shift)
    h, w = hw
    c = 10
    x = jax.random.normal(jax.random.PRNGKey(3), (2, h, w, c), jnp.float32)
    m = DepthwiseConv3x3Shift(c, strides=strides, dilation=(rate, rate),
                              dtype=jnp.float32)
    variables = m.init(RNG, x)
    assert variables["params"]["kernel"].shape == (3, 3, 1, c)
    got = m.apply(variables, x)
    ref = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"], strides, "SAME",
        rhs_dilation=(rate, rate), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_shift_rejects_unsupported():
    from bugcar_image_segmentation_tpu.models.fastconv import (
        DepthwiseConv3x3Shift)
    x = jnp.zeros((1, 15, 16, 4), jnp.float32)  # odd H
    m = DepthwiseConv3x3Shift(4, strides=(2, 2), dtype=jnp.float32)
    with pytest.raises(ValueError, match="even dims"):
        m.init(RNG, x)
    with pytest.raises(ValueError, match="features == Cin"):
        DepthwiseConv3x3Shift(8, dtype=jnp.float32).init(
            RNG, jnp.zeros((1, 8, 8, 4), jnp.float32))


def test_sepconvbn_dw_shift_path_parity():
    """SepConvBN's shifted depthwise inference path == the grouped-conv
    path on the same variables (both strides), and training still takes
    the stock conv (BN updating)."""
    from bugcar_image_segmentation_tpu.models.xception import SepConvBN
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 12, 16, 6),
                          jnp.float32)
    for strides in [(1, 1), (2, 2)]:
        fast = SepConvBN(8, strides=strides, dtype=jnp.float32,
                         dw_shift=True)
        slow = SepConvBN(8, strides=strides, dtype=jnp.float32,
                         dw_shift=False)
        variables = fast.init(RNG, x)
        assert variables["params"]["depthwise"]["kernel"].shape == (3, 3, 1, 6)
        np.testing.assert_allclose(
            np.asarray(fast.apply(variables, x)),
            np.asarray(slow.apply(variables, x)), rtol=1e-5, atol=1e-5)
        out, mut = fast.apply(variables, x, train=True,
                              mutable=["batch_stats"])
        assert "depthwise_bn" in mut["batch_stats"]


def test_s2d4_stem_parity():
    from bugcar_image_segmentation_tpu.models.fastconv import S2d4StemConv2x

    x = jax.random.normal(RNG, (2, 16, 24, 3), jnp.float32)
    ref = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                  use_bias=False, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    fast = S2d4StemConv2x(32, dtype=jnp.float32)
    v = ref.init(RNG, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(RNG, x)))
    np.testing.assert_allclose(fast.apply(v, x), ref.apply(v, x),
                               atol=1e-5)


def test_s2d4_stem_rejects_bad_input():
    from bugcar_image_segmentation_tpu.models.fastconv import S2d4StemConv2x

    fast = S2d4StemConv2x(8, dtype=jnp.float32)
    v = fast.init(RNG, jnp.zeros((1, 16, 16, 3), jnp.float32))
    with pytest.raises(ValueError, match="divisible by 4"):
        fast.apply(v, jnp.zeros((1, 18, 16, 3), jnp.float32))


def test_deeplab_convbn_s2d4_stem_parity():
    from bugcar_image_segmentation_tpu.models.deeplab import ConvBN

    x = jax.random.normal(RNG, (2, 16, 24, 3), jnp.float32)
    slow = ConvBN(32, (3, 3), strides=(2, 2), dtype=jnp.float32)
    fast = ConvBN(32, (3, 3), strides=(2, 2), dtype=jnp.float32,
                  s2d4_stem=True)
    v = slow.init(RNG, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                fast.init(RNG, x, train=False)))
    y_slow = slow.apply(v, x, train=False)
    y_fast = fast.apply(v, x, train=False)
    np.testing.assert_allclose(y_fast, y_slow, atol=2e-4, rtol=1e-4)
    # Train apply falls back to the textbook conv (and updates BN).
    _, mutated = fast.apply(v, x, train=True, mutable=["batch_stats"])
    assert "BatchNorm_0" in mutated["batch_stats"]
    # Odd-by-4 inputs fall back to the stock path rather than raising.
    x14 = jax.random.normal(RNG, (1, 14, 16, 3), jnp.float32)
    v14 = slow.init(RNG, x14, train=False)
    np.testing.assert_allclose(
        fast.apply(v14, x14, train=False),
        slow.apply(v14, x14, train=False), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("module,kernel,stride", [
    ("stem2x", 3, 2), ("stem4x", 7, 4)])
def test_stem_torch_pad_parity(module, kernel, stride):
    # pad="torch" computes torch.nn.Conv2d(..., padding=k//2) — the
    # official SegFormer patch-embed convention (convert/torch_segformer
    # pours HF checkpoints) — via 2x2-tap phase folds (vs SAME's 3x3).
    from bugcar_image_segmentation_tpu.models.fastconv import FastStemConv4x

    cls = FastStemConv2x if module == "stem2x" else FastStemConv4x
    x = jax.random.normal(RNG, (2, 16, 24, 5), jnp.float32)
    m = cls(6, use_bias=True, dtype=jnp.float32, pad="torch")
    v = m.init(RNG, x)
    hp = kernel // 2
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (stride, stride),
        ((hp, hp), (hp, hp)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + v["params"]["bias"]
    np.testing.assert_allclose(m.apply(v, x), ref, atol=1e-5)
    # chw_out orientation too
    yt = m.apply(v, x, chw_out=True)
    np.testing.assert_allclose(
        yt.T.reshape(ref.shape), ref, atol=1e-5)


def test_stem2x_torch_pad_chw_in_parity():
    x = jax.random.normal(RNG, (2, 16, 24, 5), jnp.float32)
    m = FastStemConv2x(6, use_bias=True, dtype=jnp.float32, pad="torch")
    v = m.init(RNG, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + v["params"]["bias"]
    xt = x.reshape(-1, 5).T
    yt = m.apply(v, xt, chw_in_nhw=(2, 16, 24))
    np.testing.assert_allclose(yt.T.reshape(ref.shape), ref, atol=1e-5)


def test_stem_bad_pad_rejected():
    from bugcar_image_segmentation_tpu.models.fastconv import FastStemConv4x

    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    for cls in (FastStemConv2x, FastStemConv4x):
        with pytest.raises(ValueError, match="pad must be"):
            cls(4, dtype=jnp.float32, pad="valid").init(RNG, x)


class TestChwDenseFold:
    """ChwDense(fold=W2) == ChwConv1x1-after-ChwDense at the weight
    level (models/chw.py) — the SegFormer decode-head fuse fold."""

    def test_fold_matches_two_step(self):
        from bugcar_image_segmentation_tpu.models.chw import (ChwConv1x1,
                                                              ChwDense)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(24, 100)).astype(np.float32))
        dense = ChwDense(16, dtype=jnp.float32)
        v = dense.init(jax.random.PRNGKey(1), x)
        w2 = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        two_step = w2.T @ np.asarray(dense.apply(v, x))
        folded = dense.apply(v, x, fold=w2)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(two_step),
                                   rtol=1e-5, atol=1e-5)

    def test_param_tree_unchanged_by_fold(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwDense
        x = jnp.zeros((24, 10), jnp.float32)
        dense = ChwDense(16, dtype=jnp.float32)
        v0 = dense.init(jax.random.PRNGKey(0), x)
        v1 = dense.init(jax.random.PRNGKey(0), x,
                        fold=jnp.zeros((16, 8), jnp.float32))
        assert (jax.tree_util.tree_map(lambda a: a.shape, v0)
                == jax.tree_util.tree_map(lambda a: a.shape, v1))

    def test_conv1x1_param_only_mode(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwConv1x1
        conv = ChwConv1x1(8, use_bias=False, dtype=jnp.float32,
                          in_features=24)
        v = conv.init(jax.random.PRNGKey(0), None)
        w = conv.apply(v, None)
        assert w.shape == (24, 8)
        # same tree as the computing mode
        x = jnp.zeros((24, 10), jnp.float32)
        v2 = ChwConv1x1(8, use_bias=False,
                        dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        assert (jax.tree_util.tree_map(lambda a: a.shape, v)
                == jax.tree_util.tree_map(lambda a: a.shape, v2))

    def test_conv1x1_param_only_with_bias_keeps_tree(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwConv1x1
        x = jnp.zeros((6, 10), jnp.float32)
        conv_c = ChwConv1x1(4, dtype=jnp.float32)
        conv_p = ChwConv1x1(4, dtype=jnp.float32, in_features=6)
        vc = conv_c.init(jax.random.PRNGKey(0), x)
        vp = conv_p.init(jax.random.PRNGKey(0), None)
        assert (jax.tree_util.tree_map(lambda a: a.shape, vc)
                == jax.tree_util.tree_map(lambda a: a.shape, vp))
        w, b = conv_p.apply(vp, None)
        assert w.shape == (6, 4) and b.shape == (4,)

    def test_conv1x1_param_only_requires_in_features(self):
        from bugcar_image_segmentation_tpu.models.chw import ChwConv1x1
        with pytest.raises(ValueError, match="in_features"):
            ChwConv1x1(8, dtype=jnp.float32).init(jax.random.PRNGKey(0),
                                                  None)

    def test_fold_with_quant_gate(self):
        # Quantized fold: gate checks the FOLDED output width.
        from bugcar_image_segmentation_tpu.models.chw import ChwDense
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        dense = ChwDense(600, dtype=jnp.float32, quant=True)
        v = dense.init(jax.random.PRNGKey(1), x)
        w2 = jnp.asarray(rng.normal(size=(600, 512)).astype(np.float32)
                         / 24.5)
        exact = ChwDense(600, dtype=jnp.float32).apply(v, x, fold=w2)
        got = dense.apply(v, x, fold=w2)
        err = (np.linalg.norm(np.asarray(got) - np.asarray(exact))
               / np.linalg.norm(np.asarray(exact)))
        assert err < 0.05, err
