"""MusicGen: text (and melody) conditioned music generation.

Parity: `audiocraft/models/musicgen.py:40-338` — defaults (duration 15s,
top_k 250, cfg 3.0), style params, generation params plumbing, melody
conditioning API surface, HF checkpoint name map, extend_stride windowing.
"""
import logging
import typing as tp

import jax.numpy as jnp

from .genmodel import BaseGenModel
from .lm import LMModel

logger = logging.getLogger(__name__)

# Reference HF checkpoint map (`musicgen.py:31-37`)
HF_MODEL_CHECKPOINTS_MAP = {
    "small": "facebook/musicgen-small",
    "medium": "facebook/musicgen-medium",
    "large": "facebook/musicgen-large",
    "melody": "facebook/musicgen-melody",
    "style": "facebook/musicgen-style",
    "stereo-small": "facebook/musicgen-stereo-small",
    "stereo-medium": "facebook/musicgen-stereo-medium",
    "stereo-large": "facebook/musicgen-stereo-large",
    "stereo-melody": "facebook/musicgen-stereo-melody",
}

MelodyType = tp.Any  # [B, C, T] waveform or chroma


class MusicGen(BaseGenModel):
    """Text/melody -> music (`musicgen.py:40-338`)."""

    def __init__(self, name, compression_model, compression_variables, lm,
                 lm_params, max_duration=None, cfg=None):
        super().__init__(name, compression_model, compression_variables,
                         lm, lm_params, max_duration=max_duration, cfg=cfg)
        # reference defaults (`musicgen.py:54,96-100`); stride clamped for
        # short-max-duration (debug) models
        self.set_generation_params(
            duration=min(15, self.max_duration),
            extend_stride=min(18, self.max_duration / 2))

    @staticmethod
    def get_pretrained(name: str = "facebook/musicgen-melody", **kwargs) -> "MusicGen":
        """Load a pretrained or debug MusicGen (`musicgen.py:56-94`)."""
        from . import loaders
        if name in ("debug", "debug-melody", "debug-style", "debug-stereo"):
            from . import builders
            compression_model, compression_vars = \
                builders.get_debug_compression_model()
            lm, lm_params = {
                "debug": builders.get_debug_lm_model,
                "debug-melody": builders.get_debug_melody_lm_model,
                "debug-style": builders.get_debug_style_lm_model,
                "debug-stereo": builders.get_debug_stereo_lm_model,
            }[name]()
            if name == "debug-stereo":
                from .encodec import InterleaveStereoCompressionModel
                compression_model = InterleaveStereoCompressionModel(
                    compression_model)
            return MusicGen(name, compression_model, compression_vars,
                            lm, lm_params, max_duration=30)
        name = HF_MODEL_CHECKPOINTS_MAP.get(name, name)
        compression_model, compression_vars = loaders.load_compression_model(name)
        lm, lm_params, model_cfg = loaders.load_lm_model(name)
        if "self_wav" in lm.conditioners:
            # melody models must keep the wav condition during generation
            object.__setattr__(lm.conditioners["self_wav"], "match_len_on_eval", True)
        return MusicGen(name, compression_model, compression_vars, lm,
                        lm_params, cfg=model_cfg)

    def set_generation_params(self, use_sampling: bool = True, top_k: int = 250,
                              top_p: float = 0.0, temperature: float = 1.0,
                              duration: float = 30.0, cfg_coef: float = 3.0,
                              cfg_coef_beta: tp.Optional[float] = None,
                              two_step_cfg: bool = False,
                              extend_stride: float = 18):
        """`musicgen.py:96-134`."""
        assert extend_stride < self.max_duration, \
            "Cannot stride by more than max generation duration."
        self.extend_stride = extend_stride
        self.duration = duration
        self.generation_params = {
            "use_sampling": use_sampling,
            "temp": temperature,
            "top_k": top_k,
            "top_p": top_p,
            "cfg_coef": cfg_coef,
            "cfg_coef_beta": cfg_coef_beta,
            "two_step_cfg": two_step_cfg,
        }

    def set_style_conditioner_params(self, eval_q: int = 3,
                                     excerpt_length: float = 3.0,
                                     ds_factor: tp.Optional[int] = None,
                                     encodec_n_q: tp.Optional[int] = None):
        """MusicGen-Style conditioner knobs (`musicgen.py:136-153`)."""
        from ..modules.conditioners import StyleConditioner, set_style_params
        from .lm import _COND_JIT_CACHE
        cond = self.lm.conditioners.get("self_wav")
        assert isinstance(cond, StyleConditioner), \
            "Only use this function if your model is MusicGen-Style"
        set_style_params(cond, eval_q=eval_q, excerpt_length=excerpt_length,
                         ds_factor=ds_factor, encodec_n_q=encodec_n_q)
        # the conditioner program was traced against the old field values
        _COND_JIT_CACHE.pop(id(self.lm), None)

    def _prepare_tokens_and_attributes(self, descriptions, prompt):
        """Adds a null `self_wav` condition for wav-conditioned models when
        no melody/style audio is given (`musicgen.py:262-270`)."""
        import numpy as np
        from ..modules.conditioners import WavCondition
        attributes, prompt_tokens = super()._prepare_tokens_and_attributes(
            descriptions, prompt)
        if "self_wav" in self.lm.conditioners:
            for attr in attributes:
                attr.wav["self_wav"] = WavCondition(
                    np.zeros((1, 1, 1), np.float32), np.array([0]),
                    sample_rate=[self.sample_rate], path=[None])
        return attributes, prompt_tokens

    def generate_with_chroma(self, descriptions: tp.List[str],
                             melody_wavs: MelodyType, melody_sample_rate: int,
                             progress: bool = False, return_tokens: bool = False):
        """Melody-conditioned generation (`musicgen.py:155-191`)."""
        import numpy as np
        from ..data.audio_utils import convert_audio
        from ..modules.conditioners import WavCondition
        assert "self_wav" in self.lm.conditioners, \
            "This model doesn't support melody conditioning."
        if not isinstance(melody_wavs, (list, tuple)):
            if np.asarray(melody_wavs).ndim == 2:
                melody_wavs = np.asarray(melody_wavs)[None]
            melody_wavs = list(np.asarray(melody_wavs))
        melody_wavs = [
            np.asarray(convert_audio(np.asarray(w)[None] if np.asarray(w).ndim == 2
                                     else np.asarray(w)[None, None],
                                     melody_sample_rate, self.sample_rate, 1))[0]
            if w is not None else None
            for w in melody_wavs]
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(
            descriptions, None)
        assert len(attributes) == len(melody_wavs)
        for attr, melody in zip(attributes, melody_wavs):
            if melody is None:
                attr.wav["self_wav"] = WavCondition(
                    np.zeros((1, 1, 1), np.float32), np.array([0]),
                    sample_rate=[self.sample_rate], path=[None])
            else:
                attr.wav["self_wav"] = WavCondition(
                    melody[None], np.array([melody.shape[-1]]),
                    sample_rate=[self.sample_rate], path=[None])
        tokens = self._generate_tokens(attributes, prompt_tokens, progress)
        if return_tokens:
            return self.generate_audio(tokens), tokens
        return self.generate_audio(tokens)
