"""SegFormer torch checkpoints (HF transformers) → Flax variables.

The reference ships frozen TF1 blobs only (reference models.py:16,
100-103); the SegFormer family (BASELINE config 5) has no reference
counterpart but DOES have real public weights — the NVlabs release,
distributed through HF transformers (``nvidia/segformer-b0-finetuned-*``,
``nvidia/mit-b*``).  This bridge pours a
``SegformerForSemanticSegmentation`` state_dict into
:class:`~..models.segformer.SegFormer` built with ``torch_compat=True``
(centered patch-embed padding + exact GELU — the official conventions;
under this repo's default SAME padding the embeds sample a shifted
window and poured weights would silently lose accuracy).

Fidelity is proven against the official implementation itself, not an
era-correct stand-in: tests/test_torch_segformer_bridge.py builds a
random-init HF model, converts it, and asserts logits parity between
the torch forward and every inference path of the Flax rebuild.

torch / transformers imports are lazy: conversion is offline tooling,
never on the inference path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor / array-like → float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch ``Linear`` (out, in) → flax ``Dense`` {kernel (in, out), bias}."""
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch ``Conv2d`` (O, I/g, kh, kw) → flax {kernel (kh, kw, I/g, O)}."""
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _ln(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def convert_state_dict(state_dict: Dict[str, Any],
                       depths: Tuple[int, ...],
                       ) -> Dict[str, Any]:
    """HF ``SegformerForSemanticSegmentation`` state_dict → Flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching the
    variable tree of :class:`~..models.segformer.SegFormer` (every
    layout path — the tree is identical for textbook / CHW / quant).
    Accepts torch tensors or arrays; ``segformer.``-prefixed
    (ForSemanticSegmentation) and bare encoder keys both work.
    """
    sd = {k[len("segformer."):] if k.startswith("segformer.") else k: v
          for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    for s in range(len(depths)):
        pe = f"encoder.patch_embeddings.{s}"
        params[f"embed{s}"] = {
            "Conv_0": _conv(sd, f"{pe}.proj"),
            "LayerNorm_0": _ln(sd, f"{pe}.layer_norm"),
        }
        for b in range(depths[s]):
            blk = f"encoder.block.{s}.{b}"
            attn = {
                "q": _linear(sd, f"{blk}.attention.self.query"),
                "k": _linear(sd, f"{blk}.attention.self.key"),
                "v": _linear(sd, f"{blk}.attention.self.value"),
                "proj": _linear(sd, f"{blk}.attention.output.dense"),
            }
            if f"{blk}.attention.self.sr.weight" in sd:
                attn["sr"] = _conv(sd, f"{blk}.attention.self.sr")
                attn["sr_norm"] = _ln(sd, f"{blk}.attention.self.layer_norm")
            params[f"stage{s}_block{b}"] = {
                "norm1": _ln(sd, f"{blk}.layer_norm_1"),
                "norm2": _ln(sd, f"{blk}.layer_norm_2"),
                "attn": attn,
                "ffn": {
                    "fc1": _linear(sd, f"{blk}.mlp.dense1"),
                    "dwconv": _conv(sd, f"{blk}.mlp.dwconv.dwconv"),
                    "fc2": _linear(sd, f"{blk}.mlp.dense2"),
                },
            }
        params[f"norm{s}"] = _ln(sd, f"encoder.layer_norm.{s}")

    # All-MLP decode head.  HF fuses cat(states[::-1]) — the Flax head
    # concatenates proj[::-1] too (models/segformer.py), so the fuse
    # kernel's input-channel order maps 1:1.
    for s in range(len(depths)):
        params[f"linear_c{s}"] = _linear(sd, f"decode_head.linear_c.{s}.proj")
    params["fuse"] = _conv(sd, "decode_head.linear_fuse")
    params["fuse_bn"] = {"scale": _np(sd["decode_head.batch_norm.weight"]),
                         "bias": _np(sd["decode_head.batch_norm.bias"])}
    params["classifier"] = _conv(sd, "decode_head.classifier")
    batch_stats = {"fuse_bn": {
        "mean": _np(sd["decode_head.batch_norm.running_mean"]),
        "var": _np(sd["decode_head.batch_norm.running_var"]),
    }}
    return {"params": params, "batch_stats": batch_stats}


def convert_hf_model(hf_model, **overrides):
    """HF ``SegformerForSemanticSegmentation`` → (Flax model, variables).

    Reads the architecture from ``hf_model.config`` (hidden sizes,
    depths, heads, SR ratios, decoder width, label count) and builds the
    Flax :class:`SegFormer` with ``torch_compat=True``; ``overrides``
    pass through (e.g. ``head_upsample="quarter"`` to match the HF
    output contract exactly — HF logits come out at 1/4 resolution).
    """
    from ..models.segformer import SegFormer

    cfg = hf_model.config
    kw = dict(
        num_classes=cfg.num_labels,
        widths=tuple(cfg.hidden_sizes),
        depths=tuple(cfg.depths),
        num_heads=tuple(cfg.num_attention_heads),
        sr_ratios=tuple(cfg.sr_ratios),
        decoder_dim=cfg.decoder_hidden_size,
        torch_compat=True,
    )
    kw.update(overrides)
    model = SegFormer(**kw)
    variables = convert_state_dict(hf_model.state_dict(),
                                   depths=tuple(cfg.depths))
    return model, variables


def load_torch_segformer(path: str, **overrides):
    """Checkpoint directory / HF model id → (Flax model, variables).

    Wraps ``SegformerForSemanticSegmentation.from_pretrained`` — use a
    local path in air-gapped environments.
    """
    from transformers import SegformerForSemanticSegmentation

    hf = SegformerForSemanticSegmentation.from_pretrained(path)
    return convert_hf_model(hf, **overrides)


__all__ = ["convert_state_dict", "convert_hf_model", "load_torch_segformer"]
