"""Base generative model wrapper: the user-facing generation API.

Parity: `audiocraft/models/genmodel.py:28-267` (generate /
generate_unconditional / generate_continuation, token->audio decode, progress
callbacks, long-generation sliding window via `extend_stride`).
"""
import typing as tp
from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio_utils import convert_audio
from ..modules.conditioners import ConditioningAttributes
from . import lm as lm_mod
from .encodec import CompressionModel
from .lm import GenParams, LMModel


class BaseGenModel(ABC):
    """Wraps (compression model, LM) with convenient generation
    (`genmodel.py:28-100`). Parameters are explicit: `lm_params` and
    `compression_variables` pytrees owned by this wrapper."""

    def __init__(self, name: str, compression_model: CompressionModel,
                 compression_variables, lm: LMModel, lm_params,
                 max_duration: tp.Optional[float] = None,
                 cfg: tp.Optional[tp.Any] = None):
        self.name = name
        self.compression_model = compression_model
        self.compression_variables = compression_variables
        self.lm = lm
        self.lm_params = lm_params
        self.cfg = cfg
        if cfg is not None:
            # stereo checkpoints carry interleave_stereo_codebooks in their
            # cfg; wrap like the reference (`genmodel.py:53-56`)
            from .builders import get_wrapped_compression_model
            self.compression_model = get_wrapped_compression_model(
                self.compression_model, cfg)

        if max_duration is None and cfg is not None:
            max_duration = cfg["dataset"]["segment_duration"]
        if max_duration is None:
            raise ValueError("You must provide max_duration when building directly your GenModel")
        self.max_duration: float = max_duration
        self.duration = self.max_duration
        self.extend_stride: tp.Optional[float] = None
        self.generation_params: dict = {}
        self.rng = jax.random.PRNGKey(0)
        self._progress_callback: tp.Optional[tp.Callable[[int, int], None]] = None

    def set_seed(self, seed: int):
        self.rng = jax.random.PRNGKey(seed)

    def _next_rng(self) -> jax.Array:
        self.rng, r = jax.random.split(self.rng)
        return r

    @property
    def frame_rate(self) -> float:
        return self.compression_model.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.compression_model.sample_rate

    @property
    def audio_channels(self) -> int:
        return self.compression_model.channels

    def set_custom_progress_callback(self, progress_callback=None):
        self._progress_callback = progress_callback

    @abstractmethod
    def set_generation_params(self, *args, **kwargs):
        raise NotImplementedError("No base implementation for setting generation params.")

    @staticmethod
    @abstractmethod
    def get_pretrained(name: str, **kwargs):
        raise NotImplementedError("No base implementation for getting pretrained model")

    def _prepare_tokens_and_attributes(self, descriptions, prompt
                                       ) -> tp.Tuple[tp.List[ConditioningAttributes],
                                                     tp.Optional[jax.Array]]:
        """Text -> attributes; prompt wav -> codes (`genmodel.py:109-133`)."""
        attributes = [ConditioningAttributes(text={"description": description})
                      for description in descriptions]
        if prompt is not None:
            if descriptions is not None:
                assert len(descriptions) == len(prompt), \
                    "Prompt and nb. descriptions doesn't match"
            prompt_tokens, scale = self.compression_model.encode(
                self.compression_variables, jnp.asarray(prompt))
            assert scale is None
        else:
            prompt_tokens = None
        return attributes, prompt_tokens

    def generate_unconditional(self, num_samples: int, progress: bool = False,
                               return_tokens: bool = False):
        """`genmodel.py:135-147`."""
        descriptions: tp.List[tp.Optional[str]] = [None] * num_samples
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(descriptions, None)
        tokens = self._generate_tokens(attributes, prompt_tokens, progress)
        if return_tokens:
            return self.generate_audio(tokens), tokens
        return self.generate_audio(tokens)

    def generate(self, descriptions: tp.List[str], progress: bool = False,
                 return_tokens: bool = False):
        """Text-conditioned generation (`genmodel.py:149-161`)."""
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(descriptions, None)
        assert prompt_tokens is None
        tokens = self._generate_tokens(attributes, prompt_tokens, progress)
        if return_tokens:
            return self.generate_audio(tokens), tokens
        return self.generate_audio(tokens)

    def generate_continuation(self, prompt, prompt_sample_rate: int,
                              descriptions: tp.Optional[tp.List[tp.Optional[str]]] = None,
                              progress: bool = False, return_tokens: bool = False):
        """Continue an audio prompt (`genmodel.py:163-186`)."""
        prompt = jnp.asarray(prompt)
        if prompt.ndim == 2:
            prompt = prompt[None]
        if prompt.ndim != 3:
            raise ValueError("prompt should have 3 dimensions: [B, C, T] (C = 1).")
        prompt = convert_audio(prompt, prompt_sample_rate, self.sample_rate,
                               self.audio_channels)
        if descriptions is None:
            descriptions = [None] * len(prompt)
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(descriptions, prompt)
        assert prompt_tokens is not None
        tokens = self._generate_tokens(attributes, prompt_tokens, progress)
        if return_tokens:
            return self.generate_audio(tokens), tokens
        return self.generate_audio(tokens)

    def _lm_generate(self, prompt_tokens, attributes, max_gen_len: int):
        return lm_mod.generate(
            self.lm, self.lm_params, self._next_rng(), prompt=prompt_tokens,
            conditions=attributes, max_gen_len=max_gen_len,
            gen=GenParams(**self.generation_params))

    def _generate_tokens(self, attributes: tp.List[ConditioningAttributes],
                         prompt_tokens: tp.Optional[jax.Array],
                         progress: bool = False) -> jax.Array:
        """Token generation incl. the >max_duration sliding window
        (`genmodel.py:188-259`)."""
        total_gen_len = int(self.duration * self.frame_rate)
        max_prompt_len = int(min(self.duration, self.max_duration) * self.frame_rate)
        current_gen_offset: int = 0

        if prompt_tokens is not None:
            assert max_prompt_len >= prompt_tokens.shape[-1], \
                "Prompt is longer than audio to generate"

        if self.duration <= self.max_duration:
            gen_tokens = self._lm_generate(prompt_tokens, attributes, total_gen_len)
        else:
            assert self.extend_stride is not None, \
                "Stride should be defined to generate beyond max_duration"
            assert self.extend_stride < self.max_duration, \
                "Cannot stride by more than max generation duration."
            all_tokens = []
            if prompt_tokens is None:
                prompt_length = 0
            else:
                all_tokens.append(prompt_tokens)
                prompt_length = prompt_tokens.shape[-1]
            stride_tokens = int(self.frame_rate * self.extend_stride)
            while current_gen_offset + prompt_length < total_gen_len:
                time_offset = current_gen_offset / self.frame_rate
                chunk_duration = min(self.duration - time_offset, self.max_duration)
                max_gen_len = int(chunk_duration * self.frame_rate)
                gen_tokens = self._lm_generate(prompt_tokens, attributes, max_gen_len)
                if prompt_tokens is None:
                    all_tokens.append(gen_tokens)
                else:
                    all_tokens.append(gen_tokens[:, :, prompt_tokens.shape[-1]:])
                prompt_tokens = gen_tokens[:, :, stride_tokens:]
                prompt_length = prompt_tokens.shape[-1]
                current_gen_offset += stride_tokens
                if progress:
                    print(f"{min(current_gen_offset + prompt_length, total_gen_len): 6d}"
                          f" / {total_gen_len: 6d}", end="\r")
            gen_tokens = jnp.concatenate(all_tokens, axis=-1)
        return gen_tokens

    def generate_audio(self, gen_tokens: jax.Array) -> jax.Array:
        """Tokens -> waveform [B, C, T] (`genmodel.py:262-267`)."""
        assert gen_tokens.ndim == 3
        return self.compression_model.decode(self.compression_variables,
                                             gen_tokens, None)
