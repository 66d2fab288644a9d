"""Multi-Band Diffusion training: noise-prediction MSE on one frequency band.

Parity: `audiocraft/solvers/diffusion.py:25-279` — band filtering/resampling
DataProcess, per-timestep-bucket PerStageMetrics, MSE on the predicted noise.
"""
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.unet import DiffusionUnet
from ..modules.diffusion_schedule import (MultiBandProcessor, NoiseSchedule,
                                          SampleProcessor)
from ..ops.filters import SplitBands
from ..ops.resample import resample_frac


class PerStageMetrics:
    """Metrics per diffusion-step bucket (`diffusion.py:25-50`)."""

    def __init__(self, num_steps: int, num_stages: int = 4):
        self.num_steps = num_steps
        self.num_stages = num_stages

    def __call__(self, losses: dict, step) -> dict:
        if isinstance(step, int):
            stage = int((step / self.num_steps) * self.num_stages)
            return {f"{name}_{stage}": loss for name, loss in losses.items()}
        step = np.asarray(step)
        stage_tensor = ((step / self.num_steps) * self.num_stages).astype(np.int64)
        out: tp.Dict[str, float] = {}
        for stage_idx in range(self.num_stages):
            mask = stage_tensor == stage_idx
            N = mask.sum()
            if N > 0:
                for name, loss in losses.items():
                    stage_loss = float((mask * np.asarray(loss)).sum() / N)
                    out[f"{name}_{stage_idx}"] = stage_loss
        return out


class DataProcess:
    """Band filtering / resampling of training data (`diffusion.py:53-111`)."""

    def __init__(self, initial_sr: int = 24000, target_sr: int = 16000,
                 use_resampling: bool = False, use_filter: bool = False,
                 n_bands: int = 4, idx_band: int = 0, cutoffs=None,
                 boost: bool = False):
        assert idx_band < n_bands
        self.idx_band = idx_band
        if use_filter:
            assert cutoffs is None, "custom cutoffs: construct SplitBands directly"
            self.filter = SplitBands(sample_rate=initial_sr, n_bands=n_bands)
        self.use_filter = use_filter
        self.use_resampling = use_resampling
        self.target_sr = target_sr
        self.initial_sr = initial_sr
        self.boost = boost

    def process_data(self, x, metric: bool = False):
        if x is None:
            return None
        if self.boost:
            std = jnp.clip(jnp.std(x, axis=(1, 2), keepdims=True), 1e-4)
            x = x / std * 0.22
        if self.use_filter and not metric:
            x = self.filter(x)[self.idx_band]
        if self.use_resampling:
            x = resample_frac(x, self.initial_sr, self.target_sr)
        return x

    def inverse_process(self, x):
        if self.use_resampling:
            x = resample_frac(x, self.target_sr, self.initial_sr)
        return x


@struct.dataclass
class DiffusionTrainState:
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any
    proc_state: tp.Any


from .base import SolverRunMixin


class DiffusionSolver(SolverRunMixin):
    """MBD training solver (`diffusion.py:114-279`)."""

    def __init__(self, cfg: dict):
        from ..models import builders as model_builders
        self.cfg = cfg
        self.sample_rate: int = cfg.get("sample_rate", 24000)
        sched_cfg = dict(cfg.get("schedule", {}))
        self.num_steps = sched_cfg.get("num_steps", 1000)

        proc_cfg = dict(cfg.get("processor", {"name": "multi_band_processor",
                                              "use": True}))
        use_proc = proc_cfg.pop("use", True)
        name = proc_cfg.pop("name", None)
        if use_proc and name == "multi_band_processor":
            self.sample_processor: SampleProcessor = MultiBandProcessor(
                sample_rate=self.sample_rate, **proc_cfg)
        else:
            self.sample_processor = SampleProcessor()
        self.schedule = NoiseSchedule(sample_processor=self.sample_processor,
                                      **sched_cfg)

        filter_cfg = dict(cfg.get("filter", {}))
        resample_cfg = dict(cfg.get("resampling", {}))
        self.data_processor = DataProcess(
            initial_sr=self.sample_rate,
            target_sr=resample_cfg.get("target_sr", 16000),
            use_resampling=resample_cfg.get("use", False),
            use_filter=filter_cfg.get("use", False),
            n_bands=filter_cfg.get("n_bands", 4),
            idx_band=filter_cfg.get("idx_band", 0))

        channels = cfg.get("channels", 1)
        unet_cfg = dict(cfg.get("diffusion_unet", {}))
        if "transformer" in unet_cfg:  # config key per ref unet.py:126
            unet_cfg["use_transformer"] = unet_cfg.pop("transformer")
        allowed = set(DiffusionUnet.__dataclass_fields__)
        unet_cfg = {k: v for k, v in unet_cfg.items() if k in allowed}
        self.model = DiffusionUnet(chin=channels, num_steps=self.num_steps,
                                   **unet_cfg)

        # frozen codec for the latent condition (`diffusion.py:162-170`)
        ckpt = cfg.get("compression_model_checkpoint", "debug")
        if ckpt == "debug" or ckpt is None:
            self.codec_model, self.codec_variables = \
                model_builders.get_debug_compression_model(32000)
        else:
            from .compression import CompressionSolver
            self.codec_model, self.codec_variables = \
                CompressionSolver.model_from_checkpoint(ckpt)

        segment = cfg.get("dataset", {}).get("segment_duration", 1.0)
        T = int(self.sample_rate * segment)
        rng = jax.random.PRNGKey(cfg.get("seed", 2036))
        cond_dim = self.codec_model.encoder.dimension
        example_x = jnp.zeros((1, T, channels))
        example_cond = jnp.zeros((1, T // 320, cond_dim))
        params = self.model.init(rng, example_x, 0, condition=example_cond)

        optim_cfg = cfg.get("optim", {})
        self.optimizer = optax.adam(float(optim_cfg.get("lr", 2e-4)))
        self.state = DiffusionTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.optimizer.init(params),
            proc_state=self.sample_processor.init_state())
        self.per_stage = PerStageMetrics(self.num_steps,
                                         cfg.get("metrics", {}).get("num_stage", 4))
        self._rng = rng
        self._step_fn = self._make_step()
        from . import builders as solver_builders
        self.dataloaders = solver_builders.get_audio_datasets(
            cfg, solver_builders.DatasetType.AUDIO) if cfg.get("datasource") else {}

    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def get_condition(self, wav: jax.Array) -> jax.Array:
        """`diffusion.py:162-168`: codec latent (no quantization in eval?
        Reference uses quantized latents via encode+decode_latent)."""
        codes, scale = self.codec_model.encode(self.codec_variables, wav)
        assert scale is None
        return self.codec_model.decode_latent(self.codec_variables, codes)

    def _make_step(self):
        model = self.model
        schedule = self.schedule
        processor = self.sample_processor
        optimizer = self.optimizer
        data_proc = self.data_processor

        is_mbp = isinstance(processor, MultiBandProcessor)

        def step(state: DiffusionTrainState, x, condition, rng):
            rng_proc, rng_item = jax.random.split(rng)
            # update processor stats (warmup phase), then noise the batch
            if is_mbp:
                proc_state = processor.update(state.proc_state, x, rng_proc)
            else:
                proc_state = state.proc_state
            item = schedule.get_training_item(
                rng_item, x, proc_state=proc_state if is_mbp else None,
                tensor_step=True)

            def loss_fn(params):
                # model operates channels-last
                noisy = jnp.swapaxes(item.noisy, 1, 2)
                estimate = model.apply(params, noisy, item.step,
                                       condition=condition)
                estimate = jnp.swapaxes(estimate, 1, 2)
                per_item = jnp.mean(jnp.square(item.noise - estimate),
                                    axis=(1, 2))
                return jnp.mean(per_item), per_item

            (loss, per_item), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = DiffusionTrainState(step=state.step + 1,
                                            params=new_params,
                                            opt_state=new_opt,
                                            proc_state=proc_state)
            return new_state, {"loss": loss, "per_item": per_item,
                               "steps": item.step}

        return jax.jit(step, donate_argnums=(0,))

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        wav = batch[0] if isinstance(batch, tuple) else batch
        x = jnp.asarray(wav)  # [B, C, T]
        condition = self.get_condition(x)
        x_p = self.data_processor.process_data(x)
        self.state, m = self._step_fn(self.state, x_p, condition,
                                      self._next_rng())
        metrics["loss"] = float(m["loss"])
        metrics.update(self.per_stage({"loss": np.asarray(m["per_item"])},
                                      np.asarray(m["steps"])))
        return metrics
