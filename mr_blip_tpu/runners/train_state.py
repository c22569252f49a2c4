"""Optimizer construction and the jitted/pjitted train step.

Reproduces the reference training semantics (``runner_base.py:103-142`` +
``base_task.py:157-248``) TPU-natively:

* AdamW with the weight-decay split — parameters with ndim < 2 (biases,
  norm scales) get no decay (reference splits on ``p.ndim < 2 or
  name.endswith(".bias")``).
* Frozen parameters (ViT, non-LoRA T5) are excluded via ``optax.masked`` —
  they get no optimizer state at all (reference filters by requires_grad).
* Gradient accumulation via ``optax.MultiSteps`` (reference
  ``accum_grad_iters``).
* bf16 on TPU needs no GradScaler; loss/grads accumulate in fp32.
* The learning rate is computed host-side per (epoch, step) by the
  registered scheduler and injected as a traced scalar.

Under a dp-sharded batch, GSPMD derives the gradient psum over ICI from
sharding propagation — the moral equivalent of DDP's bucketed allreduce,
but fused by XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # static fields
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )


def wd_mask_fn(params):
    """True where weight decay applies: rank >= 2 tensors (kernels)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    accum_grad_iters: int = 1,
    trainable_mask=None,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW with lr injected per step via ``inject_hyperparams``."""

    def base(learning_rate):
        chain = []
        if max_grad_norm:
            chain.append(optax.clip_by_global_norm(max_grad_norm))
        chain.append(
            optax.adamw(
                learning_rate=learning_rate,
                b1=beta1, b2=beta2, eps=eps,
                weight_decay=weight_decay,
                mask=wd_mask_fn,
            )
        )
        return optax.chain(*chain)

    tx = optax.inject_hyperparams(base)(learning_rate=0.0)
    if trainable_mask is not None:
        # NOTE: optax.masked would pass frozen params' gradients through
        # UNCHANGED as updates; multi_transform + set_to_zero actually
        # freezes them (and allocates no Adam state for them).
        labels = jax.tree.map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, param_labels=labels
        )
    if accum_grad_iters > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad_iters)
    return tx


def _set_lr(opt_state, lr):
    """Inject the traced lr into the InjectHyperparamsState (possibly nested
    inside MaskedState / MultiStepsState)."""

    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state._replace(inner_opt_state=_set_lr(opt_state.inner_opt_state, lr))
    if isinstance(opt_state, optax.MaskedState):
        return opt_state._replace(inner_state=_set_lr(opt_state.inner_state, lr))
    if hasattr(opt_state, "inner_states"):  # MultiTransformState
        inner = dict(opt_state.inner_states)
        inner["train"] = _set_lr(inner["train"], lr)
        return opt_state._replace(inner_states=inner)
    if hasattr(opt_state, "hyperparams"):
        # InjectHyperparamsState / InjectStatefulHyperparamsState
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    raise TypeError(f"cannot inject lr into {type(opt_state)}")


def make_train_step(
    loss_fn: Callable,
    donate: bool = True,
    trainable_mask=None,
) -> Callable:
    """Build the jitted train step.

    ``loss_fn(params, batch, dropout_rng) -> (loss, aux)`` must be pure.
    The returned step has signature
    ``step(state, batch, lr, rng) -> (state, loss)``.
    """

    def train_step(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        def lf(params):
            if trainable_mask is not None:
                # Stop-grad every frozen leaf so autodiff never emits the
                # dW matmuls for the frozen T5 base / embeddings in the
                # first place. Without this, those cotangents are computed
                # and only then discarded by the optimizer's set_to_zero
                # branch — correctness-identical (the frozen grads become
                # symbolic zeros either way) but reliant on XLA DCE to
                # recover the FLOPs, which is not guaranteed through
                # scan-over-layers backward graphs.
                params = jax.tree.map(
                    lambda m, p: p if m else jax.lax.stop_gradient(p),
                    trainable_mask, params,
                )
            loss, _aux = loss_fn(params, batch, rng)
            return loss

        # allow_int: int8 QLoRA-style base kernels (T5Config.int8_base) get
        # float0 gradients; rewrite those to integer zeros so the frozen
        # branch (set_to_zero) and apply_updates stay dtype-preserving
        loss, grads = jax.value_and_grad(lf, allow_int=True)(state.params)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p) if g.dtype == jax.dtypes.float0 else g,
            grads, state.params,
        )
        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = state.tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def trainable_param_count(params, mask) -> tuple[int, int]:
    import numpy as np

    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    trainable = sum(
        int(np.prod(p.shape))
        for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
        if m
    )
    return trainable, total
