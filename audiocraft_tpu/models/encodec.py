"""Compression models: the audio-tokenizer API and EnCodec.

Parity: `audiocraft/models/encodec.py:28-506` (CompressionModel contract,
EncodecModel with optional renormalization, length trim after decode,
InterleaveStereoCompressionModel).

Design: the model object holds *static* config plus jitted pure functions;
all parameters and EMA-codebook state live in an explicit `variables` pytree
`{"params": {"encoder", "decoder"}, "quantizer": RVQState}` that the caller
owns (checkpointing, sharding and training steps all operate on the pytree).
Audio tensors use the reference layout [B, C, T] at the API boundary and
channels-last [B, T, C] inside.
"""
import dataclasses
import logging
import math
import typing as tp
from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np

from .. import quantization as qt
from ..modules.seanet import SEANetDecoder, SEANetEncoder

logger = logging.getLogger(__name__)


class CompressionModel(ABC):
    """Base API for all audio tokenizers (`encodec.py:28-122`)."""

    @abstractmethod
    def forward(self, variables, x: jax.Array, *, training: bool = False,
                rng: tp.Optional[jax.Array] = None):
        ...

    @abstractmethod
    def encode(self, variables, x: jax.Array):
        ...

    @abstractmethod
    def decode(self, variables, codes: jax.Array, scale=None):
        ...

    @abstractmethod
    def decode_latent(self, variables, codes: jax.Array):
        ...

    @property
    @abstractmethod
    def channels(self) -> int:
        ...

    @property
    @abstractmethod
    def frame_rate(self) -> float:
        ...

    @property
    @abstractmethod
    def sample_rate(self) -> int:
        ...

    @property
    @abstractmethod
    def cardinality(self) -> int:
        ...

    @property
    @abstractmethod
    def num_codebooks(self) -> int:
        ...

    @property
    @abstractmethod
    def total_codebooks(self) -> int:
        ...

    @abstractmethod
    def set_num_codebooks(self, n: int):
        ...

    @staticmethod
    def get_pretrained(name: str) -> tp.Tuple["CompressionModel", tp.Any]:
        """Instantiate a (model, variables) pair from a pretrained name
        (`encodec.py:87-122`): 'debug_compression_model', an exported
        checkpoint path, or a local HF EnCodec checkpoint dir."""
        from . import builders, loaders
        if name == "debug_compression_model":
            return builders.get_debug_compression_model()
        return loaders.load_compression_model(name)


@dataclasses.dataclass
class EncodecModel(CompressionModel):
    """EnCodec: SEANet encoder -> RVQ -> SEANet decoder (`encodec.py:125-255`)."""
    encoder: SEANetEncoder
    decoder: SEANetDecoder
    quantizer: qt.ResidualVectorQuantizer
    frame_rate: int = 0
    sample_rate: int = 0
    channels: int = 0
    causal: bool = False
    renormalize: bool = False

    def __post_init__(self):
        if self.causal:
            assert not self.renormalize, "Causal model does not support renormalize"
        self._jit_encode = jax.jit(self._encode_impl)
        self._jit_decode = jax.jit(self._decode_impl)

    # -- properties ---------------------------------------------------------
    @property
    def total_codebooks(self):
        return self.quantizer.total_codebooks

    @property
    def num_codebooks(self):
        return self.quantizer.num_codebooks

    def set_num_codebooks(self, n: int):
        self.quantizer.set_num_codebooks(n)
        # jitted closures capture quantizer config; rebuild them
        self._jit_encode = jax.jit(self._encode_impl)
        self._jit_decode = jax.jit(self._decode_impl)

    @property
    def cardinality(self):
        return self.quantizer.bins

    # -- init ----------------------------------------------------------------
    def init(self, rng: jax.Array, segment_length: int = 0) -> tp.Dict[str, tp.Any]:
        """Initialize all variables. segment_length defaults to one second."""
        T = segment_length or self.sample_rate
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, T, self.channels), jnp.float32)
        enc_vars = self.encoder.init(r1, x)
        z = jnp.zeros((1, -(-T // self.encoder.hop_length),
                       self.encoder.dimension), jnp.float32)
        dec_vars = self.decoder.init(r2, z)
        return {
            "params": {"encoder": enc_vars["params"], "decoder": dec_vars["params"]},
            "quantizer": self.quantizer.init(r3),
        }

    # -- pre/post processing (`encodec.py:186-204`) --------------------------
    def preprocess(self, x: jax.Array):
        if self.renormalize:
            mono = jnp.mean(x, axis=1, keepdims=True)
            volume = jnp.sqrt(jnp.mean(jnp.square(mono), axis=2, keepdims=True))
            scale = 1e-8 + volume
            x = x / scale
            scale = scale.reshape(-1, 1)
        else:
            scale = None
        return x, scale

    def postprocess(self, x: jax.Array, scale=None) -> jax.Array:
        if scale is not None:
            assert self.renormalize
            x = x * scale.reshape(-1, 1, 1)
        return x

    # -- forward (training path, `encodec.py:206-230`) -----------------------
    def forward(self, variables, x: jax.Array, *, training: bool = False,
                rng: tp.Optional[jax.Array] = None
                ) -> tp.Tuple[qt.QuantizedResult, tp.Any]:
        assert x.ndim == 3, "audio must be [B, C, T]"
        length = x.shape[-1]
        x, scale = self.preprocess(x)
        emb = self.encoder.apply({"params": variables["params"]["encoder"]},
                                 jnp.swapaxes(x, 1, 2))
        q_res, new_qstate = self.quantizer.forward(
            variables["quantizer"], emb, self.frame_rate, training=training, rng=rng)
        out = self.decoder.apply({"params": variables["params"]["decoder"]}, q_res.x)
        out = jnp.swapaxes(out, 1, 2)
        assert out.shape[-1] >= length, (out.shape[-1], length)
        out = out[..., :length]
        q_res = dataclasses.replace(q_res, x=self.postprocess(out, scale))
        new_vars = dict(variables)
        new_vars["quantizer"] = new_qstate
        return q_res, new_vars

    # -- inference path -------------------------------------------------------
    def _encode_impl(self, variables, x: jax.Array):
        x, scale = self.preprocess(x)
        emb = self.encoder.apply({"params": variables["params"]["encoder"]},
                                 jnp.swapaxes(x, 1, 2))
        codes = self.quantizer.encode(variables["quantizer"], emb)
        return codes, scale

    def _decode_impl(self, variables, codes: jax.Array, scale=None):
        emb = self.quantizer.decode(variables["quantizer"], codes)
        out = self.decoder.apply({"params": variables["params"]["decoder"]}, emb)
        out = jnp.swapaxes(out, 1, 2)
        return self.postprocess(out, scale)

    def encode(self, variables, x: jax.Array):
        """[B, C, T] float -> ([B, K, T_frames] codes, scale)
        (`encodec.py:232-246`)."""
        assert x.ndim == 3
        return self._jit_encode(variables, x)

    def decode(self, variables, codes: jax.Array, scale=None):
        """[B, K, T_frames] codes -> [B, C, T] wav; contains extra padding
        the caller trims (`encodec.py:240-253`)."""
        return self._jit_decode(variables, codes, scale)

    def decode_latent(self, variables, codes: jax.Array) -> jax.Array:
        """codes -> continuous latent [B, T, D] (`encodec.py:255`)."""
        return self.quantizer.decode(variables["quantizer"], codes)


@dataclasses.dataclass
class InterleaveStereoCompressionModel(CompressionModel):
    """Stereo via per-channel codes interleaving (`encodec.py:397-506`)."""
    model: EncodecModel
    per_timestep: bool = False

    def __post_init__(self):
        assert self.model.channels == 1, "Wrapped model is expected to be mono"

    @property
    def total_codebooks(self):
        return self.model.total_codebooks

    @property
    def num_codebooks(self):
        """Active codebooks (`encodec.py:424-432`): doubled when codebooks
        are interleaved, unchanged when timesteps are (per_timestep)."""
        if self.per_timestep:
            return self.model.num_codebooks
        return self.model.num_codebooks * 2

    def set_num_codebooks(self, n: int):
        assert n % 2 == 0, "Stereo interleaved model expects even codebooks"
        self.model.set_num_codebooks(n // 2)

    @property
    def num_virtual_steps(self) -> float:
        return 2 if self.per_timestep else 1

    @property
    def frame_rate(self) -> float:
        return self.model.frame_rate * self.num_virtual_steps

    @property
    def sample_rate(self) -> int:
        return self.model.sample_rate

    @property
    def channels(self) -> int:
        return 2

    @property
    def cardinality(self):
        return self.model.cardinality

    def forward(self, variables, x: jax.Array, *, training: bool = False,
                rng=None):
        raise NotImplementedError("Not supported, use encode and decode.")

    def encode(self, variables, x: jax.Array):
        B, C, T = x.shape
        assert C == self.channels, f"Expecting stereo audio but audio num channels is {C}"
        indices_c0, scales_c0 = self.model.encode(variables, x[:, 0:1])
        indices_c1, scales_c1 = self.model.encode(variables, x[:, 1:2])
        indices = jnp.stack([indices_c0, indices_c1], axis=0)  # [2, B, K, T]
        scales: tp.Optional[jax.Array] = None
        if scales_c0 is not None and scales_c1 is not None:
            scales = jnp.stack([scales_c0, scales_c1], axis=1)
        if self.per_timestep:
            # [B, K, 2T] interleaving channel codes per timestep: (t c)
            # ordering — c0t0, c1t0, c0t1, ... — matching the reference's
            # rearrange('c b k t -> b k (t c)') and get_left_right_codes
            indices = jnp.einsum("cbkt->bktc", indices).reshape(
                B, self.model.num_codebooks, -1)
        else:
            # [B, 2K, T] interleaving codebooks c0k0, c1k0, c0k1, ...
            indices = jnp.einsum("cbkt->bkct", indices).reshape(B, -1, indices.shape[-1])
        return indices, scales

    def get_left_right_codes(self, codes: jax.Array
                             ) -> tp.Tuple[jax.Array, jax.Array]:
        if self.per_timestep:
            B, K, T = codes.shape
            codes = codes.reshape(B, K, T // 2, 2)
            return codes[..., 0], codes[..., 1]
        B, K2, T = codes.shape
        codes = codes.reshape(B, K2 // 2, 2, T)
        return codes[:, :, 0], codes[:, :, 1]

    def decode(self, variables, codes: jax.Array, scale=None):
        B, K, T = codes.shape
        assert T > 0
        assert K == self.num_codebooks, "Provided codes' number of codebooks does not match the model"
        scale_c0, scale_c1 = None, None
        if scale is not None:
            assert scale.ndim == 2 and scale.shape[1] == 2
            scale_c0 = scale[:, 0]
            scale_c1 = scale[:, 1]
        codes_c0, codes_c1 = self.get_left_right_codes(codes)
        audio_c0 = self.model.decode(variables, codes_c0, scale_c0)
        audio_c1 = self.model.decode(variables, codes_c1, scale_c1)
        return jnp.concatenate([audio_c0, audio_c1], axis=1)

    def decode_latent(self, variables, codes: jax.Array):
        raise NotImplementedError("Not supported by interleaved stereo wrapped models.")
