"""MusicGen LM training: cross-entropy over the delay pattern, sharded with
pjit (dp + fsdp + tp).

Parity: `audiocraft/solvers/musicgen.py:32-749` — delay-pattern CE per
codebook over valid positions, condition dropout, padding -> special-token
masking. The distributed story is GSPMD: gradients sync implicitly through
sharded params; the reference's fsdp/eager-sync/scaler branches
(`musicgen.py:394-434`) collapse into one jitted step.
"""
import dataclasses
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lm import LMModel
from ..modules.conditioners import (AttributeDropout,
                                    ClassifierFreeGuidanceDropout,
                                    ConditioningAttributes)
from ..parallel.mesh import batch_sharding, replicated
from ..parallel.sharding import infer_shardings


@struct.dataclass
class TrainState:
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any


def compute_cross_entropy(logits: jax.Array, targets: jax.Array,
                          mask: jax.Array
                          ) -> tp.Tuple[jax.Array, jax.Array]:
    """CE over valid positions, per codebook (`solvers/musicgen.py:219-251`).

    logits [B, K, T, card], targets [B, K, T], mask [B, K, T].
    Returns (mean over codebooks, per-codebook CE [K]).
    """
    B, K, T = targets.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce_all = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = mask.astype(jnp.float32)
    ce_per_codebook = (jnp.sum(ce_all * mask, axis=(0, 2))
                       / jnp.maximum(jnp.sum(mask, axis=(0, 2)), 1.0))  # [K]
    return jnp.mean(ce_per_codebook), ce_per_codebook


def apply_condition_dropout(attributes: tp.List[ConditioningAttributes],
                            cfg_dropout: tp.Optional[ClassifierFreeGuidanceDropout],
                            att_dropout: tp.Optional[AttributeDropout]
                            ) -> tp.List[ConditioningAttributes]:
    """Host-side CFG + attribute dropout before tokenization (`lm.py:253-255`)."""
    if cfg_dropout is not None:
        attributes = cfg_dropout(attributes)
    if att_dropout is not None:
        attributes = att_dropout(attributes)
    return attributes


def make_optimizer(learning_rate, optimizer: str = "adamw",
                   betas=(0.9, 0.95), weight_decay: float = 0.1,
                   eps: float = 1e-8, max_norm: float = 1.0):
    """AdamW + grad clip, matching `solvers/builders.py:95-139` defaults."""
    chain = []
    if max_norm:
        chain.append(optax.clip_by_global_norm(max_norm))
    if optimizer == "adamw":
        chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                 eps=eps, weight_decay=weight_decay))
    elif optimizer == "adam":
        chain.append(optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
    else:
        raise ValueError(f"Unsupported Optimizer: {optimizer}")
    return optax.chain(*chain)


def make_train_step(model: LMModel, optimizer: optax.GradientTransformation,
                    mesh: tp.Optional[Mesh] = None):
    """Build the jitted, sharded LM training step.

    step(state, codes [B,K,T], tokenized_conds, padding_mask [B,T], rng)
      -> (new_state, metrics)

    Padding positions in codes must already be replaced by the special token
    (`solvers/musicgen.py:333-344` — done host- or device-side by the caller
    via `mask_padding`).
    """

    def loss_fn(params, codes, tokenized, padding_mask, rng):
        condition_tensors = model.apply(params, tokenized,
                                        method=LMModel.compute_conditions)
        out = model.apply(params, codes, condition_tensors,
                          method=LMModel.compute_predictions,
                          rngs={"dropout": rng}, deterministic=False)
        mask = out.mask & (codes != model.special_token_id)
        ce, ce_q = compute_cross_entropy(out.logits, codes, mask)
        return ce, ce_q

    def step(state: TrainState, codes, tokenized, padding_mask, rng):
        (ce, ce_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, codes, tokenized, padding_mask, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        metrics = {
            "ce": ce,
            "ppl": jnp.exp(ce),
            "grad_norm": grad_norm,
            **{f"ce_q{k + 1}": ce_q[k] for k in range(model.n_q)},
            **{f"ppl_q{k + 1}": jnp.exp(ce_q[k]) for k in range(model.n_q)},
        }
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    def shard_the_step(state_shardings):
        data = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(state_shardings, data, rep, data, rep),
            out_shardings=(state_shardings, rep),
            donate_argnums=(0,))
    return shard_the_step


def init_train_state(model: LMModel, params,
                     optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Shardings pytree mirroring a TrainState: params via the TP/FSDP rules,
    optimizer moments (which mirror the param tree) likewise, scalars
    replicated."""
    param_sh = infer_shardings(state.params, mesh)
    param_treedef = jax.tree_util.tree_structure(state.params)
    rep = NamedSharding(mesh, P())

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == param_treedef:
                return param_sh
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return type(node)(*[rec(x) for x in node])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(x) for x in node)
        return jax.tree_util.tree_map(lambda _: rep, node)

    return TrainState(step=rep, params=param_sh, opt_state=rec(state.opt_state))


def mask_padding(codes: jax.Array, padding_mask: jax.Array,
                 special_token_id: int) -> jax.Array:
    """Replace padded positions with the special token
    (`solvers/musicgen.py:333-344`). codes [B,K,T], padding_mask [B,T]."""
    return jnp.where(padding_mask[:, None, :].astype(bool), codes,
                     special_token_id)
