"""AudioGen: text -> sound generation at 16 kHz.

Parity: `audiocraft/models/audiogen.py:23-150` — same API as MusicGen with
sound-specific defaults (duration 10s, extend_stride 2).
"""
import typing as tp

from .genmodel import BaseGenModel


class AudioGen(BaseGenModel):
    """Text -> environmental sound (`audiogen.py:23-150`)."""

    def __init__(self, name, compression_model, compression_variables, lm,
                 lm_params, max_duration=None, cfg=None):
        super().__init__(name, compression_model, compression_variables,
                         lm, lm_params, max_duration=max_duration, cfg=cfg)
        self.set_generation_params(duration=10)  # default duration (`audiogen.py:42`)

    @staticmethod
    def get_pretrained(name: str = "facebook/audiogen-medium", **kwargs) -> "AudioGen":
        """`audiogen.py:46-76`."""
        from . import loaders
        if name == "debug":
            from . import builders
            compression_model, compression_vars = \
                builders.get_debug_compression_model(sample_rate=16000)
            lm, lm_params = builders.get_debug_lm_model()
            return AudioGen(name, compression_model, compression_vars,
                            lm, lm_params, max_duration=10)
        compression_model, compression_vars = loaders.load_compression_model(name)
        lm, lm_params, model_cfg = loaders.load_lm_model(name)
        assert "self_wav" not in lm.conditioners, \
            "AudioGen do not support waveform conditioning for now"
        return AudioGen(name, compression_model, compression_vars, lm,
                        lm_params, cfg=model_cfg)

    def set_generation_params(self, use_sampling: bool = True, top_k: int = 250,
                              top_p: float = 0.0, temperature: float = 1.0,
                              duration: float = 10.0, cfg_coef: float = 3.0,
                              two_step_cfg: bool = False,
                              extend_stride: float = 2):
        """`audiogen.py:78-110`."""
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
            "two_step_cfg": two_step_cfg,
        }
