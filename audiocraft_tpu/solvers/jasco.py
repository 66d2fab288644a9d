"""JASCO flow-matching training: MSE on the conditional vector field.

Parity: `audiocraft/solvers/jasco.py:19-287` — unquantized encoder latents,
latent normalization, conditional-flow interpolation `z_t = t*x + (1-(1-s)t)*z0`
and ground-truth field `x - (1-sigma_min)*z0`, MSE on v-theta.
"""
import logging
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

logger = logging.getLogger(__name__)

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
        latents, tokenized = self._tokenize_batch(wav, infos)
        self.state, m = self._step(self.state, latents, tokenized,
                                   self._next_rng())
        metrics["loss"] = float(np.asarray(m["loss"]))
        return metrics

    def _tokenize_batch(self, wav, infos):
        """Latents + tokenized conditions with null chords/melody fallbacks
        for datasets without the JASCO side-car files (`jasco.py:60-98`)."""
        from ..modules.conditioners import (ConditioningAttributes,
                                            SymbolicCondition)
        from ..modules.jasco_conditioners import JascoConditioningProvider
        latents = self.get_latents(wav)
        T = latents.shape[1]
        if infos is not None:
            attrs = [i.to_condition_attributes() for i in infos]
        else:
            attrs = [ConditioningAttributes(text={"description": None})
                     for _ in range(latents.shape[0])]
        for a in attrs:
            if "chords" in self.model.conditioners and "chords" not in a.symbolic:
                a.symbolic["chords"] = SymbolicCondition(
                    frame_chords=np.zeros((T,), np.int32))
            if "melody" in self.model.conditioners and "melody" not in a.symbolic:
                melody_dim = self.model.conditioners["melody"].melody_dim
                a.symbolic["melody"] = SymbolicCondition(
                    melody=np.zeros((melody_dim, T), np.float32))
        provider = JascoConditioningProvider(self.model.conditioners,
                                             sequence_length=T)
        return latents, provider.tokenize(attrs)

    def evaluate(self) -> dict:
        """Flow-matching v-field MSE at fixed timesteps over the evaluate
        split (`solvers/jasco.py:200-240`), per-timestep-bucket metrics."""
        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}
        from ..models.flow_matching import FlowMatchingModel
        model = self.model

        @jax.jit
        def eval_mse(params, latents, tokenized, t, rng):
            condition_tensors = model.apply(
                params, tokenized, method=FlowMatchingModel.compute_conditions)
            x1 = latents
            z0 = jax.random.normal(rng, x1.shape, x1.dtype)
            sigma_min = 1e-4
            tt = t[:, None, None]
            zt = tt * x1 + (1 - (1 - sigma_min) * tt) * z0
            target = x1 - (1 - sigma_min) * z0
            v = model.apply(params, zt, t, condition_tensors)
            return jnp.mean((v - target) ** 2)

        buckets = {0.1: "t_low", 0.5: "t_mid", 0.9: "t_high"}
        totals: tp.Dict[str, float] = {}
        count = 0
        for batch in loader:
            wav, infos = batch if isinstance(batch, tuple) else (batch, None)
            latents, tokenized = self._tokenize_batch(wav, infos)
            for t_val, name in buckets.items():
                t = jnp.full((latents.shape[0],), t_val, latents.dtype)
                mse = eval_mse(self.state.params, latents, tokenized, t,
                               self._next_rng())
                totals[name] = totals.get(name, 0.0) + float(np.asarray(mse))
            count += 1
        metrics = {k: v / max(count, 1) for k, v in totals.items()}
        metrics["loss"] = float(np.mean(list(metrics.values()))) \
            if metrics else 0.0
        from ..parallel import distrib
        return distrib.average_metrics(metrics, count)

    def generate(self) -> dict:
        """Generate latents via the ODE sampler and decode through the codec,
        stored with SampleManager (`solvers/jasco.py:242-268`)."""
        import types
        loader = (self.dataloaders.get("generate")
                  or self.dataloaders.get("evaluate")
                  or self.dataloaders.get("valid"))
        if loader is None:
            return {}
        from ..utils.samples.manager import SampleManager
        xp = types.SimpleNamespace(folder=self._folder, cfg=self.cfg)
        manager = SampleManager(xp)
        self.jasco.params = self.state.params
        n = 0
        for batch in loader:
            wav, infos = batch if isinstance(batch, tuple) else (batch, None)
            descs = [getattr(i, "description", None) or "" for i in infos] \
                if infos is not None else [""] * np.asarray(wav).shape[0]
            gen = np.asarray(self.jasco.generate(descs, progress=False))
            manager.add_samples(gen, self.epoch,
                                conditioning=[{"description": d}
                                              for d in descs],
                                ground_truth_wavs=np.asarray(wav))
            n += gen.shape[0]
            break
        logger.info("Generated %d JASCO samples under %s", n,
                    manager.base_folder)
        return {"generated_samples": n}
