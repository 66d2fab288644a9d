"""Audio watermarking: generator + detector (AudioSeal).

Parity: `audiocraft/models/watermark.py:17-111`. The reference wraps the
external `audioseal` package; here the generator/detector are implemented
natively on our SEANet blocks, following the AudioSeal architecture
(arXiv 2401.17264): the generator embeds an n-bit message into the SEANet
latent and decodes an additive watermark delta; the detector produces
sample-level detection (2-way) + message logits.
"""
import typing as tp
from abc import ABC, abstractmethod

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.seanet import SEANetDecoder, SEANetEncoder


class MsgProcessor(nn.Module):
    """Binary message -> latent-added embedding (audioseal MsgProcessor)."""
    nbits: int
    hidden_size: int

    @nn.compact
    def __call__(self, latent: jax.Array, message: jax.Array) -> jax.Array:
        """latent [B, T, D]; message [B, nbits] in {0,1}."""
        if self.nbits == 0:
            return latent
        # one embedding per (bit index, bit value): index 2*i + b_i
        table = nn.Embed(2 * self.nbits, self.hidden_size, name="msg_emb")
        indices = 2 * jnp.arange(self.nbits)[None, :] + message.astype(jnp.int32)
        emb = jnp.sum(table(indices), axis=1)  # [B, D]
        return latent + emb[:, None, :]


class AudioSealWM(nn.Module):
    """Watermark generator: SEANet encoder -> +message -> SEANet decoder
    producing the additive watermark."""
    nbits: int = 16
    dimension: int = 128
    channels: int = 1
    n_filters: int = 32
    n_residual_layers: int = 1
    lstm: int = 2
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)

    def setup(self):
        common = dict(channels=self.channels, dimension=self.dimension,
                      n_filters=self.n_filters,
                      n_residual_layers=self.n_residual_layers, lstm=self.lstm,
                      ratios=self.ratios, norm="weight_norm", causal=False,
                      pad_mode="constant")
        self.encoder = SEANetEncoder(**common)
        self.decoder = SEANetDecoder(**common)
        self.msg_processor = MsgProcessor(self.nbits, self.dimension)

    def get_watermark(self, x: jax.Array,
                      message: tp.Optional[jax.Array] = None,
                      sample_rate: int = 16_000) -> jax.Array:
        """x [B, C, T] -> watermark delta [B, C, T]."""
        B, C, T = x.shape
        latent = self.encoder(jnp.swapaxes(x, 1, 2))
        if message is None:
            message = jnp.zeros((B, self.nbits), jnp.int32)
        latent = self.msg_processor(latent, message)
        wm = self.decoder(latent)
        return jnp.swapaxes(wm, 1, 2)[..., :T]

    def __call__(self, x: jax.Array, message: tp.Optional[jax.Array] = None,
                 sample_rate: int = 16_000, alpha: float = 1.0) -> jax.Array:
        return x + alpha * self.get_watermark(x, message, sample_rate)


class AudioSealDetector(nn.Module):
    """Detector: SEANet encoder -> reverse transposed conv back to sample
    resolution -> 1x1 conv head -> [B, 2+nbits, T] (softmaxed detection
    units). Mirrors the audioseal package's SEANetEncoderKeepDimension +
    Conv1d head so its torch checkpoints convert 1:1."""
    nbits: int = 16
    dimension: int = 128
    output_dim: int = 32
    channels: int = 1
    n_filters: int = 32
    n_residual_layers: int = 1
    lstm: int = 2
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)

    def setup(self):
        self.encoder = SEANetEncoder(
            channels=self.channels, dimension=self.dimension,
            n_filters=self.n_filters, lstm=self.lstm,
            n_residual_layers=self.n_residual_layers, ratios=self.ratios,
            norm="weight_norm", causal=False, pad_mode="constant")
        hop = 1
        for r in self.ratios:
            hop *= r
        self.reverse_convolution = nn.ConvTranspose(
            self.output_dim, (hop,), strides=(hop,), padding="VALID",
            name="reverse_convolution")
        self.head = nn.Conv(2 + self.nbits, (1,), name="head")

    def __call__(self, x: jax.Array) -> jax.Array:
        """x [B, C, T] -> [B, 2+nbits, T] (detection probs + msg logits)."""
        B, C, T = x.shape
        latent = self.encoder(jnp.swapaxes(x, 1, 2))   # [B, Tf, D]
        up = self.reverse_convolution(latent)[:, :T]   # [B, T, output_dim]
        logits = self.head(up)                         # [B, T, 2+nbits]
        logits = jnp.swapaxes(logits, 1, 2)            # [B, 2+nbits, T]
        det = jax.nn.softmax(logits[:, :2], axis=1)
        return jnp.concatenate([det, logits[:, 2:]], axis=1)


class WMModel(ABC):
    """Watermarking interface (`watermark.py:17-46`)."""

    @abstractmethod
    def get_watermark(self, x, message=None, sample_rate: int = 16_000):
        ...

    @abstractmethod
    def detect_watermark(self, x):
        ...


class AudioSeal(WMModel):
    """Jointly trained generator + detector (`watermark.py:49-111`).
    Holds static modules; params pass explicitly."""

    def __init__(self, generator: AudioSealWM, detector: AudioSealDetector,
                 nbits: int = 0):
        self.generator = generator
        self.detector = detector
        self.nbits = nbits if nbits else generator.nbits

    def init(self, rng: jax.Array, example: jax.Array):
        r1, r2 = jax.random.split(rng)
        B = example.shape[0]
        msg = jnp.zeros((B, self.generator.nbits), jnp.int32)
        gen_params = self.generator.init(r1, example, msg,
                                         method=AudioSealWM.get_watermark)
        det_params = self.detector.init(r2, example)
        return {"generator": gen_params, "detector": det_params}

    def get_watermark(self, params, x: jax.Array,
                      message: tp.Optional[jax.Array] = None,
                      sample_rate: int = 16_000) -> jax.Array:
        return self.generator.apply(params["generator"], x, message,
                                    sample_rate,
                                    method=AudioSealWM.get_watermark)

    def detect_watermark(self, params, x: jax.Array) -> jax.Array:
        """[B, C, T] -> [B, 2+nbits, T] (`watermark.py:74-93`)."""
        return self.detector.apply(params["detector"], x)

    def forward(self, params, x: jax.Array,
                message: tp.Optional[jax.Array] = None,
                sample_rate: int = 16_000, alpha: float = 1.0) -> jax.Array:
        """Watermarked audio `x + alpha * wm` (`watermark.py:93-102`)."""
        wm = self.get_watermark(params, x, message, sample_rate)
        return x + alpha * wm

    @staticmethod
    def get_pretrained(name: str = "base") -> tp.Tuple["AudioSeal", dict]:
        """Load converted audioseal torch checkpoints from a local snapshot
        (`watermark.py:104-111`; zero-egress: place generator_<name>.pth /
        detector_<name>.pth under AUDIOCRAFT_CACHE_DIR/facebook/audioseal)."""
        from . import loaders
        return loaders.load_audioseal_models("facebook/audioseal",
                                             filename=name)
