"""SegFormer torch bridge: parity against the OFFICIAL implementation.

Unlike the TF1/Keras bridges (validated against era-correct stand-ins
because the reference's blobs are stripped — .MISSING_LARGE_BLOBS:1-3),
the SegFormer family has its official implementation importable right
here (HF transformers).  These tests build a random-init
``SegformerForSemanticSegmentation``, pour its state_dict through
convert/torch_segformer.py, and assert logits parity between the torch
forward and every inference path of the Flax rebuild — architecture
fidelity proven against the source of truth, not a reconstruction.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tiny_hf(num_labels=5, seed=0):
    from transformers import (SegformerConfig,
                              SegformerForSemanticSegmentation)

    torch.manual_seed(seed)
    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4,
        depths=[1, 1, 2, 1], sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[8, 16, 40, 64], num_attention_heads=[1, 2, 5, 8],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        decoder_hidden_size=32, num_labels=num_labels, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0)
    return SegformerForSemanticSegmentation(cfg).eval()


@pytest.fixture(scope="module")
def bridge():
    from bugcar_image_segmentation_tpu.convert.torch_segformer import (
        convert_hf_model)

    hf = _tiny_hf()
    model, variables = convert_hf_model(hf, dtype=jnp.float32,
                                        head_upsample="quarter")
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits \
            .numpy().transpose(0, 2, 3, 1)
    return model, variables, x, ref


def test_chw_serving_path_matches_torch(bridge):
    model, variables, x, ref = bridge
    assert model.torch_compat and model.chw_stages == 4
    y = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert y.shape == ref.shape       # HF logits come out at 1/4 res
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_textbook_path_matches_torch(bridge):
    model, variables, x, ref = bridge
    m = model.clone(chw_stages=0, chw_head=False)
    y = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_full_res_head_matches_torch_interpolate(bridge):
    # The HF task head leaves logits at 1/4 resolution; consumers
    # upsample with align_corners=False bilinear — exactly
    # head_upsample="full".
    model, variables, x, ref = bridge
    m = model.clone(head_upsample="full")
    y = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    tt = torch.nn.functional.interpolate(
        torch.from_numpy(ref.transpose(0, 3, 1, 2)), size=(64, 64),
        mode="bilinear", align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, tt, atol=1e-5)


def test_same_pad_would_be_wrong(bridge):
    # The counterfactual that makes torch_compat load-bearing: the same
    # weights under this repo's default SAME conventions sample shifted
    # embed windows — materially different logits.  If this ever starts
    # PASSING at tight tolerance, the compat plumbing got disconnected.
    model, variables, x, ref = bridge
    m = model.clone(torch_compat=False)
    y = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    # >10% relative error (measured ~120% on this fixture) vs the
    # 1e-5-absolute parity of the compat path.
    assert np.abs(y - ref).max() > 0.1 * np.abs(ref).max()


def test_state_dict_accepts_numpy_and_prefix_free_keys(bridge):
    from bugcar_image_segmentation_tpu.convert.torch_segformer import (
        convert_state_dict)

    hf = _tiny_hf(seed=1)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    v1 = convert_state_dict(sd, depths=(1, 1, 2, 1))
    v2 = convert_state_dict(hf.state_dict(), depths=(1, 1, 2, 1))
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(a, b)


def test_variable_tree_matches_init(bridge):
    # The poured tree must be structurally identical to a fresh init —
    # that is what lets it flow through Engine / checkpointing / the
    # training path unchanged.
    model, variables, _, _ = bridge
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(variables))
    for a, b in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(variables)):
        assert np.shape(a) == np.shape(b)
