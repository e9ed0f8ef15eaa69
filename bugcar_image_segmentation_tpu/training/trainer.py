"""Training: loss, train state, and the jitted/sharded train step.

The reference has no training code at all — its models arrive as frozen
graphs, and its only train→deploy bridge is ``freeze_session`` (reference
utils.py:49-83).  A complete framework needs the other direction: train or
fine-tune the segmentation backbones on TPU, then export.  This module
provides:

- class-weighted softmax cross-entropy over (N, H, W, C) logits with an
  ignore label;
- a Flax ``TrainState`` carrying batch-norm statistics;
- :func:`make_train_step` — one optax update compiled as a single XLA
  program.  Data parallelism is expressed with ``jax.sharding`` on a
  named mesh ("data" axis): the batch shards across chips, parameters
  replicate, and XLA inserts the gradient ``psum`` over ICI from the
  sharding annotations alone — no hand-written collectives (the
  scaling-book recipe).
"""

from __future__ import annotations


from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    """Optax train state + mutable batch-norm statistics."""

    batch_stats: Any = None


def create_train_state(model,
                       input_shape: Tuple[int, int, int, int],
                       optimizer: Optional[optax.GradientTransformation]
                       = None,
                       learning_rate: float = 1e-3,
                       seed: int = 0) -> TrainState:
    """Initialize model variables and wrap them in a TrainState."""
    if optimizer is None:
        optimizer = optax.adamw(learning_rate)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(input_shape, jnp.float32), train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=optimizer,
    )


def softmax_cross_entropy(logits: jax.Array,
                          labels: jax.Array,
                          class_weights: Optional[jax.Array] = None,
                          ignore_label: int = 255) -> jax.Array:
    """Mean weighted CE over (..., C) logits and integer labels.

    Pixels labeled ``ignore_label`` contribute nothing (the standard
    segmentation convention for unlabeled regions).
    """
    num_classes = logits.shape[-1]
    valid = (labels != ignore_label) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    # One-hot contraction instead of take_along_axis: a per-pixel gather
    # costs per INDEX on TPU (batch 8 @ 512x256 is ~1M indices) and its
    # backward is a scatter; the equality mask fuses into compare/selects
    # (the models/remap.py doctrine).  Computing nll as lse - picked also
    # keeps the full (N, H, W, C) float32 log-softmax from materializing
    # in HBM — only two (N, H, W) reductions do.
    lf = logits.astype(jnp.float32)
    onehot = safe[..., None] == jnp.arange(num_classes, dtype=jnp.int32)
    lse = jax.nn.logsumexp(lf, axis=-1)
    picked = jnp.sum(jnp.where(onehot, lf, 0.0), axis=-1)
    nll = lse - picked
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        w = w * jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_train_step(model,
                    class_weights: Optional[np.ndarray] = None,
                    ignore_label: int = 255,
                    remat: bool = False,
                    ) -> Callable[[TrainState, jax.Array, jax.Array,
                                   jax.Array], Tuple[TrainState, jax.Array]]:
    """Build the pure train step: (state, images, labels, rng) → (state', loss).

    Jit/pjit-agnostic: shard the inputs with ``jax.sharding`` and jit the
    returned function; XLA derives the cross-chip gradient reduction from
    the shardings (see parallel/ and __graft_entry__.dryrun_multichip).

    ``remat=True`` wraps the forward in :func:`jax.checkpoint` with the
    ``dots_with_no_batch_dims_saveable`` policy: matmul/conv outputs are
    kept for the backward pass but the elementwise/normalization
    intermediates are recomputed, cutting activation HBM (the standard
    TPU FLOPs-for-memory trade) so high-res segmentation batches fit —
    at the cost of part of a second forward.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array,
                   rng: jax.Array) -> Tuple[TrainState, jax.Array]:
        def fwd(params, imgs):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, imgs, train=True,
                              rngs={"dropout": rng}, mutable=mutable)
            return out if mutable else (out, {})

        if remat:
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)

        def loss_fn(params):
            logits, aux = fwd(params, images)
            loss = softmax_cross_entropy(logits, labels, cw, ignore_label)
            return loss, aux.get("batch_stats")

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        return new_state, loss

    return train_step


def make_eval_step(model) -> Callable[[TrainState, jax.Array], jax.Array]:
    """Inference-mode logits from a train state (for validation loops)."""

    def eval_step(state: TrainState, images: jax.Array) -> jax.Array:
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, images, train=False)

    return eval_step


__all__ = ["TrainState", "create_train_state", "softmax_cross_entropy",
           "make_train_step", "make_eval_step"]
