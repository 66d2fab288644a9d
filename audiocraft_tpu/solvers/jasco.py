"""JASCO flow-matching training: MSE on the conditional vector field.

Parity: `audiocraft/solvers/jasco.py:19-287` — unquantized encoder latents,
latent normalization, conditional-flow interpolation `z_t = t*x + (1-(1-s)t)*z0`
and ground-truth field `x - (1-sigma_min)*z0`, MSE on v-theta.
"""
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.flow_matching import FlowMatchingModel


@struct.dataclass
class JascoTrainState:
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any


def make_jasco_train_step(model: FlowMatchingModel,
                          optimizer: optax.GradientTransformation,
                          sigma_min: float = 1e-4,
                          latent_mean: float = 0.0,
                          latent_std: float = 1.0):
    """step(state, latents [B,T,D], tokenized, rng) -> (state, metrics)
    (`solvers/jasco.py:100-140`)."""

    def loss_fn(params, latents, tokenized, rng):
        condition_tensors = model.apply(
            params, tokenized, method=FlowMatchingModel.compute_conditions)
        x1 = (latents - latent_mean) / latent_std  # normalized latents
        rng_t, rng_z = jax.random.split(rng)
        B = x1.shape[0]
        t = jax.random.uniform(rng_t, (B,))
        z0 = jax.random.normal(rng_z, x1.shape)
        t_ = t[:, None, None]
        # conditional flow interpolation (`jasco.py:112-119`)
        z_t = t_ * x1 + (1 - (1 - sigma_min) * t_) * z0
        u_t = x1 - (1 - sigma_min) * z0  # ground-truth vector field
        v_theta = model.apply(params, z_t, t, condition_tensors)
        return jnp.mean(jnp.square(v_theta - u_t))

    def step(state: JascoTrainState, latents, tokenized, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, latents,
                                                  tokenized, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return JascoTrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


from .base import SolverRunMixin


class JascoSolver(SolverRunMixin):
    """`solvers/jasco.py:19-287`."""

    def __init__(self, cfg: dict):
        from ..models import builders as model_builders
        self.cfg = cfg
        jasco = model_builders.get_debug_jasco_model()
        self.model = jasco.model
        self.compression_model = jasco.compression_model
        self.compression_variables = jasco.compression_variables
        self.params = jasco.params
        self.jasco = jasco
        self.optimizer = optax.adamw(float(cfg.get("optim", {}).get("lr", 1e-4)))
        self.state = JascoTrainState(step=jnp.zeros((), jnp.int32),
                                     params=self.params,
                                     opt_state=self.optimizer.init(self.params))
        self._step = make_jasco_train_step(self.model, self.optimizer)
        self._rng = jax.random.PRNGKey(cfg.get("seed", 2036))
        from . import builders as solver_builders
        self.dataloaders = solver_builders.get_audio_datasets(
            cfg, solver_builders.DatasetType.MUSIC) if cfg.get("datasource") else {}
        self.epoch = 1

    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def get_latents(self, wav: jax.Array) -> jax.Array:
        """Unquantized encoder latents (`jasco.py:55-58`)."""
        x = jnp.swapaxes(jnp.asarray(wav), 1, 2)
        enc_vars = {"params": self.compression_variables["params"]["encoder"]}
        return self.compression_model.encoder.apply(enc_vars, x)

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        wav, infos = batch if isinstance(batch, tuple) else (batch, None)
        latents = self.get_latents(wav)
        from ..modules.conditioners import ConditioningAttributes, SymbolicCondition
        from ..modules.jasco_conditioners import JascoConditioningProvider
        T = latents.shape[1]
        if infos is not None:
            attrs = [i.to_condition_attributes() for i in infos]
        else:
            attrs = [ConditioningAttributes(
                text={"description": None},
                symbolic={"chords": SymbolicCondition(
                    frame_chords=np.zeros((T,), np.int32))})
                for _ in range(latents.shape[0])]
        provider = JascoConditioningProvider(self.model.conditioners,
                                             sequence_length=T)
        tokenized = provider.tokenize(attrs)
        self.state, m = self._step(self.state, latents, tokenized,
                                   self._next_rng())
        metrics["loss"] = float(np.asarray(m["loss"]))
        return metrics
