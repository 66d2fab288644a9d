"""Multi-Band Diffusion: diffusion decoding of EnCodec tokens.

Parity: `audiocraft/models/multibanddiffusion.py:25-191` — one DiffusionProcess
per mel frequency band; `tokens_to_wav` regenerates each band from the codec
latent condition and sums.
"""
import typing as tp

import jax
import jax.numpy as jnp

from ..modules.diffusion_schedule import NoiseSchedule, SampleProcessor
from ..ops.resample import resample_frac
from .encodec import CompressionModel
from .unet import DiffusionUnet


class DiffusionProcess:
    """Sampling wrapper (`multibanddiffusion.py:25-45`)."""

    def __init__(self, model: DiffusionUnet, params,
                 noise_schedule: NoiseSchedule,
                 proc_state=None) -> None:
        self.model = model
        self.params = params
        self.schedule = noise_schedule
        self.proc_state = proc_state

    def generate(self, rng: jax.Array, condition: jax.Array,
                 initial_noise: jax.Array,
                 step_list: tp.Optional[tp.List[int]] = None) -> jax.Array:
        def model_fn(x, step, cond):
            return self.model.apply(self.params, x, step, condition=cond)

        return self.schedule.generate_subsampled(
            model_fn, rng, initial_noise, step_list=step_list,
            condition=condition, proc_state=self.proc_state)


class MultiBandDiffusion:
    """Sample from per-band diffusion models (`multibanddiffusion.py:48-191`)."""

    def __init__(self, DPs: tp.List[DiffusionProcess],
                 codec_model: CompressionModel, codec_variables) -> None:
        self.DPs = DPs
        self.codec_model = codec_model
        self.codec_variables = codec_variables
        self.rng = jax.random.PRNGKey(0)

    @property
    def sample_rate(self) -> int:
        return self.codec_model.sample_rate

    def _next_rng(self):
        self.rng, r = jax.random.split(self.rng)
        return r

    @staticmethod
    def from_checkpoint(name: str, codec_name: str,
                        filename: tp.Optional[str] = None
                        ) -> "MultiBandDiffusion":
        """Build from converted torch checkpoints (`loaders.py:181-204` +
        `multibanddiffusion.py:48-118`): one DiffusionProcess per band plus
        the matching compression model, both resolved from local snapshots
        (zero-egress environment — see models/loaders.py)."""
        from . import loaders
        models, schedules, proc_states, cfgs, _ = loaders.load_diffusion_models(
            name, filename=filename)
        codec, codec_vars = loaders.load_compression_model(codec_name)
        DPs = [DiffusionProcess(model, params, schedule, proc_state)
               for (model, params), schedule, proc_state
               in zip(models, schedules, proc_states)]
        return MultiBandDiffusion(DPs, codec, codec_vars)

    @staticmethod
    def get_mbd_musicgen(**kwargs) -> "MultiBandDiffusion":
        """Pretrained MBD for MusicGen tokens (`multibanddiffusion.py:63-77`).
        Local snapshots required (zero-egress environment)."""
        return MultiBandDiffusion.from_checkpoint(
            "facebook/multiband-diffusion", "facebook/musicgen-small",
            filename="mbd_musicgen_32khz.th")

    @staticmethod
    def get_mbd_24khz(bw: float = 3.0, **kwargs) -> "MultiBandDiffusion":
        """`multibanddiffusion.py:79-110`; local snapshots required."""
        assert bw in (1.5, 3.0, 6.0), f"bandwidth {bw} not available"
        return MultiBandDiffusion.from_checkpoint(
            "facebook/multiband-diffusion", "facebook/encodec_24khz",
            filename=f"mbd_comp_{int(bw * 2)}.pt")

    def get_condition(self, wav: jax.Array, sample_rate: int) -> jax.Array:
        """Waveform -> codec latent condition [B, T, D]
        (`multibanddiffusion.py:112-124`)."""
        if sample_rate != self.sample_rate:
            wav = resample_frac(wav, sample_rate, self.sample_rate)
        codes, scale = self.codec_model.encode(self.codec_variables, wav)
        assert scale is None, "Scaled compression models not supported."
        return self.codec_model.decode_latent(self.codec_variables, codes)

    def get_emb(self, codes: jax.Array) -> jax.Array:
        """Tokens -> latent condition (`multibanddiffusion.py:126-133`)."""
        return self.codec_model.decode_latent(self.codec_variables, codes)

    def generate(self, emb: jax.Array, size: tp.Optional[tp.Sequence[int]] = None,
                 step_list: tp.Optional[tp.List[int]] = None) -> jax.Array:
        """Latent condition -> waveform, one diffusion per band, summed
        (`multibanddiffusion.py:135-155`)."""
        if size is None:
            upsampling = int(self.codec_model.sample_rate
                             / self.codec_model.frame_rate)
            size = (emb.shape[0], self.codec_model.channels,
                    emb.shape[1] * upsampling)
        assert size[0] == emb.shape[0]
        out = jnp.zeros(tuple(size), jnp.float32)
        for DP in self.DPs:
            initial = DP.schedule.get_initial_noise(
                self._next_rng(), jnp.swapaxes(out, 1, 2))  # [B, T, C]
            band = DP.generate(self._next_rng(), condition=emb,
                               initial_noise=initial, step_list=step_list)
            out = out + jnp.swapaxes(band, 1, 2)
        return out

    def re_eq(self, wav: jax.Array, ref: jax.Array,
              n_bands: int = 32, strictness: float = 1.0) -> jax.Array:
        """Match the EQ of `wav` to `ref` per mel band
        (`multibanddiffusion.py:157-172`)."""
        from ..ops.filters import SplitBands
        split = SplitBands(self.sample_rate, n_bands)
        bands = split(wav)
        bands_ref = split(ref)
        energy = jnp.sqrt(jnp.mean(bands ** 2, axis=(1, 2, 3), keepdims=True))
        energy_ref = jnp.sqrt(jnp.mean(bands_ref ** 2, axis=(1, 2, 3), keepdims=True))
        out = bands * (energy_ref / jnp.maximum(energy, 1e-12)) ** strictness
        return out.sum(axis=0)

    def regenerate(self, wav: jax.Array, sample_rate: int) -> jax.Array:
        """Wav -> codec condition -> diffusion wav (`multibanddiffusion.py:174-181`)."""
        emb = self.get_condition(wav, sample_rate)
        size = (wav.shape[0], self.codec_model.channels,
                int(wav.shape[-1] * self.sample_rate / sample_rate)) \
            if sample_rate != self.sample_rate else wav.shape
        return self.generate(emb, size=size)

    def tokens_to_wav(self, tokens: jax.Array, n_bands: int = 32) -> jax.Array:
        """Tokens -> compressed wav -> diffusion wav with EQ matching
        (`multibanddiffusion.py:183-191`)."""
        wav_encodec = self.codec_model.decode(self.codec_variables, tokens)
        condition = self.get_emb(tokens)
        wav_diffusion = self.generate(emb=condition,
                                      size=tuple(wav_encodec.shape))
        return self.re_eq(wav=wav_diffusion, ref=wav_encodec, n_bands=n_bands)
