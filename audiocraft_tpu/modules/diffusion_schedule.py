"""Diffusion noise schedules and sample processors.

Parity: `audiocraft/modules/diffusion_schedule.py:20-272` — power-law beta
schedule, `get_training_item` noising, full and subsampled DDPM reverse
processes, and the MultiBandProcessor per-band normalization.

TPU design: the reverse process runs as a `lax.scan` over the (static) step
list with all per-step scalars precomputed host-side; training-item creation
is a pure function of an explicit rng.
"""
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.filters import SplitBands

TrainingItem = tp.NamedTuple("TrainingItem", [("noisy", jax.Array),
                                              ("noise", jax.Array),
                                              ("step", jax.Array)])


def betas_from_alpha_bar(alpha_bar: np.ndarray) -> np.ndarray:
    """`diffusion_schedule.py:20-22`."""
    alphas = np.concatenate([alpha_bar[:1], alpha_bar[1:] / alpha_bar[:-1]])
    return 1 - alphas


class SampleProcessor:
    """Identity projection (`diffusion_schedule.py:25-33`)."""

    def init_state(self):
        return {}

    def project_sample(self, state, x: jax.Array):
        return x

    def return_sample(self, state, z: jax.Array):
        return z

    def update(self, state, x: jax.Array):
        return state


@struct.dataclass
class MBPState:
    counts: jax.Array
    sum_x: jax.Array
    sum_x2: jax.Array
    sum_target_x2: jax.Array


class MultiBandProcessor(SampleProcessor):
    """Per-mel-band energy matching vs gaussian noise
    (`diffusion_schedule.py:35-110`). Band statistics live in an explicit
    `MBPState` updated during the first `num_samples` training samples."""

    def __init__(self, n_bands: int = 8, sample_rate: float = 24_000,
                 num_samples: int = 10_000,
                 power_std: tp.Union[float, tp.List[float]] = 1.0):
        self.n_bands = n_bands
        self.split_bands = SplitBands(sample_rate, n_bands=n_bands)
        self.num_samples = num_samples
        self.power_std = jnp.asarray(power_std) if isinstance(power_std, list) \
            else power_std
        if isinstance(power_std, list):
            assert len(power_std) == n_bands

    def init_state(self) -> MBPState:
        return MBPState(counts=jnp.zeros(()),
                        sum_x=jnp.zeros(self.n_bands),
                        sum_x2=jnp.zeros(self.n_bands),
                        sum_target_x2=jnp.zeros(self.n_bands))

    def _stats(self, state: MBPState):
        mean = state.sum_x / jnp.maximum(state.counts, 1.0)
        std = jnp.sqrt(jnp.clip(state.sum_x2 / jnp.maximum(state.counts, 1.0)
                                - mean ** 2, 0.0))
        target_std = state.sum_target_x2 / jnp.maximum(state.counts, 1.0)
        return mean, std, target_std

    def update(self, state: MBPState, x: jax.Array,
               rng: tp.Optional[jax.Array] = None) -> MBPState:
        """Online stats update during warmup (`diffusion_schedule.py:92-99`)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        bands = self.split_bands(x)  # [F, B, C, T]
        ref_bands = self.split_bands(jax.random.normal(rng, x.shape))
        do = state.counts < self.num_samples
        inc = jnp.where(do, float(x.shape[0]), 0.0)
        gate = jnp.where(do, 1.0, 0.0)
        return MBPState(
            counts=state.counts + inc,
            sum_x=state.sum_x + gate * bands.mean(axis=(2, 3)).sum(axis=1),
            sum_x2=state.sum_x2 + gate * (bands ** 2).mean(axis=(2, 3)).sum(axis=1),
            sum_target_x2=state.sum_target_x2
            + gate * (ref_bands ** 2).mean(axis=(2, 3)).sum(axis=1))

    def project_sample(self, state: MBPState, x: jax.Array) -> jax.Array:
        assert x.ndim == 3
        mean, std, target_std = self._stats(state)
        bands = self.split_bands(x)
        rescale = (target_std / jnp.clip(std, 1e-12)) ** self.power_std
        bands = (bands - mean.reshape(-1, 1, 1, 1)) * rescale.reshape(-1, 1, 1, 1)
        return bands.sum(axis=0)

    def return_sample(self, state: MBPState, x: jax.Array) -> jax.Array:
        assert x.ndim == 3
        mean, std, target_std = self._stats(state)
        bands = self.split_bands(x)
        rescale = (std / jnp.maximum(target_std, 1e-12)) ** self.power_std
        bands = bands * rescale.reshape(-1, 1, 1, 1) + mean.reshape(-1, 1, 1, 1)
        return bands.sum(axis=0)


class NoiseSchedule:
    """Power-law beta schedule + DDPM reverse process
    (`diffusion_schedule.py:112-272`)."""

    def __init__(self, beta_t0: float = 1e-4, beta_t1: float = 0.02,
                 num_steps: int = 1000, variance: str = "beta",
                 clip: float = 5.0, rescale: float = 1.0, beta_exp: float = 1,
                 repartition: str = "power", alpha_sigmoid: dict = {},
                 n_bands: tp.Optional[int] = None,
                 sample_processor: SampleProcessor = SampleProcessor(),
                 noise_scale: float = 1.0, **kwargs):
        self.beta_t0 = beta_t0
        self.beta_t1 = beta_t1
        self.variance = variance
        self.num_steps = num_steps
        self.clip = clip
        self.sample_processor = sample_processor
        self.rescale = rescale
        self.n_bands = n_bands
        self.noise_scale = noise_scale
        assert n_bands is None
        if repartition == "power":
            self.betas = np.linspace(beta_t0 ** (1 / beta_exp),
                                     beta_t1 ** (1 / beta_exp),
                                     num_steps, dtype=np.float64) ** beta_exp
        else:
            raise RuntimeError("Not implemented")

    def get_beta(self, step):
        return self.betas[step]

    def get_initial_noise(self, rng: jax.Array, x: jax.Array) -> jax.Array:
        return jax.random.normal(rng, x.shape, x.dtype)

    def get_alpha_bar(self, step=None) -> np.ndarray:
        """`diffusion_schedule.py:166-173`."""
        if step is None:
            return np.cumprod(1 - self.betas, axis=-1)
        if isinstance(step, int):
            return float(np.prod(1 - self.betas[:step + 1]))
        return np.cumprod(1 - self.betas)[step]

    def get_training_item(self, rng: jax.Array, x: jax.Array,
                          proc_state=None, tensor_step: bool = True
                          ) -> TrainingItem:
        """Noise a clean batch (`diffusion_schedule.py:175-190`)."""
        rng_step, rng_noise = jax.random.split(rng)
        bs = x.shape[0]
        if tensor_step:
            step = jax.random.randint(rng_step, (bs,), 0, self.num_steps)
        else:
            step = jax.random.randint(rng_step, (), 0, self.num_steps)
        alpha_bars = jnp.asarray(self.get_alpha_bar(), jnp.float32)
        alpha_bar = alpha_bars[step].reshape(-1, 1, 1) if tensor_step \
            else alpha_bars[step]
        if proc_state is not None:
            x = self.sample_processor.project_sample(proc_state, x)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        noisy = (jnp.sqrt(alpha_bar) / self.rescale) * x \
            + jnp.sqrt(1 - alpha_bar) * noise * self.noise_scale
        return TrainingItem(noisy, noise, step)

    def _reverse(self, model_fn, rng: jax.Array, initial: jax.Array,
                 condition, step_list: tp.List[int], proc_state):
        """Shared reverse loop over a static step list. Each iteration is one
        model eval + scalar algebra; the Python loop unrolls into one jitted
        graph when the caller jits."""
        betas_sub = None
        if step_list[0] != self.num_steps - 1 or len(step_list) != self.num_steps:
            alpha_bars_sub = np.cumprod(1 - self.betas)[list(reversed(step_list))]
            betas_sub = betas_from_alpha_bar(alpha_bars_sub)
        alpha_bar = self.get_alpha_bar(self.num_steps - 1)
        current = initial if betas_sub is None else initial * self.noise_scale
        for idx, step in enumerate(step_list[:-1] if betas_sub is not None
                                   else step_list):
            estimate = model_fn(current, step, condition)
            if betas_sub is not None:
                estimate = estimate * self.noise_scale
                alpha = 1 - betas_sub[-1 - idx]
            else:
                alpha = 1 - self.betas[step]
            previous = (current - (1 - alpha) / np.sqrt(1 - alpha_bar)
                        * estimate) / np.sqrt(alpha)
            if betas_sub is not None:
                previous_alpha_bar = self.get_alpha_bar(step_list[idx + 1])
                if step == step_list[-2]:
                    sigma2 = 0.0
                    previous_alpha_bar = 1.0
                else:
                    sigma2 = (1 - previous_alpha_bar) / (1 - alpha_bar) * (1 - alpha)
            else:
                previous_alpha_bar = self.get_alpha_bar(step - 1) if step > 0 else 1.0
                if step == 0:
                    sigma2 = 0.0
                elif self.variance == "beta":
                    sigma2 = 1 - alpha
                elif self.variance == "beta_tilde":
                    sigma2 = (1 - previous_alpha_bar) / (1 - alpha_bar) * (1 - alpha)
                elif self.variance == "none":
                    sigma2 = 0.0
                else:
                    raise ValueError(f"Invalid variance type {self.variance}")
            if sigma2 > 0:
                rng, r = jax.random.split(rng)
                previous = previous + (sigma2 ** 0.5) * jax.random.normal(
                    r, previous.shape, previous.dtype) * self.noise_scale
            if self.clip:
                previous = jnp.clip(previous, -self.clip, self.clip)
            current = previous
            alpha_bar = previous_alpha_bar
            if step == 0:
                previous = previous * self.rescale
        if proc_state is not None:
            return self.sample_processor.return_sample(proc_state, previous)
        return previous

    def generate(self, model_fn, rng: jax.Array, initial: jax.Array,
                 condition=None, proc_state=None) -> jax.Array:
        """Full DDPM reverse process (`diffusion_schedule.py:192-236`).
        model_fn(x, step:int, condition) -> noise estimate."""
        return self._reverse(model_fn, rng, initial, condition,
                             list(range(self.num_steps))[::-1], proc_state)

    def generate_subsampled(self, model_fn, rng: jax.Array, initial: jax.Array,
                            step_list: tp.Optional[tp.List[int]] = None,
                            condition=None, proc_state=None) -> jax.Array:
        """Subsampled reverse process (`diffusion_schedule.py:238-272`)."""
        if step_list is None:
            step_list = list(range(1000))[::-50] + [0]
        return self._reverse(model_fn, rng, initial, condition, step_list,
                             proc_state)
