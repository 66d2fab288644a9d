"""Model presets mirroring the reference configs (sizes from
`config/model/lm/model_scale/*.yaml` and `config/solver/musicgen/default.yaml`).
"""
import typing as tp

import jax.numpy as jnp

from ..modules.conditioners import (BaseConditioner, ConditionFuser,
                                    LUTConditioner, T5Conditioner)
from ..modules.patterns import DelayedPatternProvider
from .lm import LMModel

MODEL_SCALES = {
    "xsmall": dict(dim=64, num_heads=2, num_layers=2),       # ~2M, tests
    "small": dict(dim=1024, num_heads=16, num_layers=24),    # 300M
    "medium": dict(dim=1536, num_heads=24, num_layers=48),   # 1.5B
    "large": dict(dim=2048, num_heads=32, num_layers=48),    # 3.3B
}


def musicgen_lm(scale: str = "small", n_q: int = 4, card: int = 2048,
                conditioners: tp.Optional[tp.Dict[str, BaseConditioner]] = None,
                dtype=jnp.float32, use_t5: bool = False,
                **overrides) -> LMModel:
    """MusicGen-style LM (`config/model/lm/musicgen_lm.yaml`): delay pattern,
    T5 (or LUT) cross-attention conditioning, pre-norm, no biases."""
    kw = dict(MODEL_SCALES[scale])
    dim = kw["dim"]
    if conditioners is None:
        if use_t5:
            conditioners = {"description": T5Conditioner(
                model_name="t5-base", dim=768, output_dim=dim, dtype=dtype)}
        else:
            conditioners = {"description": LUTConditioner(
                n_bins=2048, dim=dim, output_dim=dim, tokenizer="whitespace",
                dtype=dtype)}
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "input_interpolate": []})
    kw.update(dict(
        n_q=n_q, card=card, cross_attention=True, causal=True,
        norm_first=True, bias_proj=False, bias_ff=False, bias_attn=False,
        weight_init="gaussian", depthwise_init="current", zero_bias_init=True,
        cfg_coef=3.0, dtype=dtype))
    kw.update(overrides)
    return LMModel(pattern_provider=DelayedPatternProvider(n_q=n_q),
                   conditioners=conditioners, fuser=fuser, **kw)
