"""MAGNeT generation wrapper.

Parity: `audiocraft/models/magnet.py:18-90` — BaseGenModel over MagnetLMModel
with MAGNeT-specific generation params (annealed CFG, per-stage decoding
steps).
"""
import typing as tp

from . import lm_magnet
from .genmodel import BaseGenModel


class MAGNeT(BaseGenModel):
    """Text -> music/sound, non-autoregressive (`magnet.py:18-90`)."""

    def __init__(self, name, compression_model, compression_variables, lm,
                 lm_params, max_duration=None, cfg=None):
        super().__init__(name, compression_model, compression_variables,
                         lm, lm_params, max_duration=max_duration, cfg=cfg)
        self.set_generation_params(duration=10)

    @staticmethod
    def get_pretrained(name: str = "facebook/magnet-small-10secs", **kwargs) -> "MAGNeT":
        """`magnet.py:30-55`."""
        if name == "debug":
            from . import builders
            compression_model, compression_vars = \
                builders.get_debug_compression_model()
            lm, lm_params = builders.get_debug_magnet_lm_model()
            return MAGNeT(name, compression_model, compression_vars,
                          lm, lm_params, max_duration=10)
        from . import loaders
        compression_model, compression_vars = loaders.load_compression_model(name)
        lm, lm_params, model_cfg = loaders.load_lm_model(name)
        return MAGNeT(name, compression_model, compression_vars, lm,
                      lm_params, cfg=model_cfg)

    def set_generation_params(self, use_sampling: bool = True, top_k: int = 0,
                              top_p: float = 0.9, temperature: float = 3.0,
                              max_cfg_coef: float = 10.0,
                              min_cfg_coef: float = 1.0,
                              decoding_steps: tp.List[int] = [20, 10, 10, 10],
                              span_arrangement: str = "nonoverlap",
                              duration: float = 10.0):
        """MAGNeT generation knobs (`magnet.py:57-90`)."""
        self.duration = duration
        self.generation_params = {
            "use_sampling": use_sampling,
            "temp": temperature,
            "top_k": top_k,
            "top_p": top_p,
            "max_cfg_coef": max_cfg_coef,
            "min_cfg_coef": min_cfg_coef,
            "decoding_steps": tuple(int(s) for s in decoding_steps),
            "span_arrangement": span_arrangement,
        }

    def _lm_generate(self, prompt_tokens, attributes, max_gen_len: int):
        return lm_magnet.generate_magnet(
            self.lm, self.lm_params, self._next_rng(), prompt=prompt_tokens,
            conditions=attributes, max_gen_len=max_gen_len,
            **self.generation_params)
