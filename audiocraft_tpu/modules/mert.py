"""MERT / HuBERT audio encoder in JAX/flax.

The reference's MusicGen-Style feature extractor runs m-a-p/MERT-v1-95M
through HF transformers (`audiocraft/modules/conditioners.py:802-845`,
`config/conditioner/style2music.yaml: model_name: mert`). MERT-v1-95M is
architecturally a HuBERT-base encoder (conv feature extractor + conv
positional embedding + post-LN transformer, 75 Hz frames at 24 kHz); this
module implements that network natively so style conditioning runs as one
XLA program, with weights converted from a local torch checkpoint
(`utils.torch_port.convert_hubert` / `load_mert_from_path`).

Layout: [B, T] waveform -> [B, frames, hidden] last-hidden-state.
"""
import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_gelu = partial(nn.gelu, approximate=False)


class ConvFeatureExtractor(nn.Module):
    """wav2vec2/HuBERT conv feature encoder (group-norm on the first layer
    only, `transformers` HubertFeatureEncoder with feat_extract_norm=
    'group'). [B, T] -> [B, frames, conv_dim[-1]]."""
    conv_dim: tp.Tuple[int, ...] = (512,) * 7
    conv_kernel: tp.Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tp.Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x[..., None]                               # [B, T, 1]
        for i, (dim, k, s) in enumerate(zip(self.conv_dim, self.conv_kernel,
                                            self.conv_stride)):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=self.conv_bias, name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 name="group_norm")(x)
            x = _gelu(x)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (HubertPositionalConvEmbedding):
    conv(k=128, groups=16, pad=64), trim one trailing step for even
    kernels, GELU."""
    hidden: int = 768
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel // 2
        y = nn.Conv(self.hidden, (self.kernel,), padding=((pad, pad),),
                    feature_group_count=self.groups, name="conv")(x)
        if self.kernel % 2 == 0:
            y = y[:, :-1]
        return _gelu(y)


class _PostLNLayer(nn.Module):
    """Post-LN transformer layer (HubertEncoderLayer,
    do_stable_layer_norm=False): x = LN(x + attn(x)); x = LN(x + ff(x))."""
    hidden: int
    heads: int
    ffn: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        H = self.heads
        hd = C // H
        q = nn.Dense(C, name="q_proj")(x) / math.sqrt(hd)
        k = nn.Dense(C, name="k_proj")(x)
        v = nn.Dense(C, name="v_proj")(x)
        att = jnp.einsum("bqhd,bkhd->bhqk", q.reshape(B, T, H, hd),
                         k.reshape(B, T, H, hd))
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att,
                         v.reshape(B, T, H, hd)).reshape(B, T, C)
        x = nn.LayerNorm(name="layer_norm")(x + nn.Dense(
            C, name="out_proj")(out))
        h = nn.Dense(self.ffn, name="intermediate_dense")(x)
        h = nn.Dense(C, name="output_dense")(_gelu(h))
        return nn.LayerNorm(name="final_layer_norm")(x + h)


class MERTModel(nn.Module):
    """HuBERT/MERT encoder returning the last hidden state
    (`transformers` HubertModel.forward().last_hidden_state)."""
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate: int = 3072
    conv_dim: tp.Tuple[int, ...] = (512,) * 7
    conv_kernel: tp.Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tp.Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    pos_kernel: int = 128
    pos_groups: int = 16
    sample_rate: int = 24000
    frame_rate: float = 75.0

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """wav [B, T] at `sample_rate` -> [B, frames, hidden]."""
        feats = ConvFeatureExtractor(
            self.conv_dim, self.conv_kernel, self.conv_stride,
            self.conv_bias, name="feature_extractor")(wav)
        x = nn.LayerNorm(name="fp_layer_norm")(feats)
        x = nn.Dense(self.hidden, name="fp_projection")(x)
        x = x + ConvPositionalEmbedding(self.hidden, self.pos_kernel,
                                        self.pos_groups,
                                        name="pos_conv_embed")(x)
        x = nn.LayerNorm(name="encoder_layer_norm")(x)
        for i in range(self.num_layers):
            x = _PostLNLayer(self.hidden, self.num_heads, self.intermediate,
                             name=f"layers_{i}")(x)
        return x


# ------------------------------------------------------- checkpoint lookup

_MERT_CACHE: tp.Dict[str, tp.Any] = {}


def get_mert() -> tp.Optional[tp.Tuple[MERTModel, tp.Any]]:
    """Return the (model, variables) MERT encoder when a local checkpoint
    exists, else None. Lookup: $MERT_CHECKPOINT (file or HF snapshot dir),
    then `$AUDIOCRAFT_CACHE_DIR/mert`. Cached per path."""
    import os
    from pathlib import Path
    path = os.environ.get("MERT_CHECKPOINT")
    if not path:
        cache = os.environ.get("AUDIOCRAFT_CACHE_DIR")
        if cache and (Path(cache) / "mert").exists():
            path = str(Path(cache) / "mert")
    if not path or not Path(path).exists():
        return None
    if path not in _MERT_CACHE:
        from ..utils.torch_port import load_mert_from_path
        _MERT_CACHE[path] = load_mert_from_path(path)
    return _MERT_CACHE[path]


_JIT_APPLY: tp.Dict[int, tp.Any] = {}


def jitted_mert_apply(model: MERTModel):
    """Cached jit of model.apply per model instance — the 12-layer forward
    dispatched eagerly per-op is pathologically slow on this platform."""
    fn = _JIT_APPLY.get(id(model))
    if fn is None:
        if len(_JIT_APPLY) > 8:
            _JIT_APPLY.clear()
        fn = jax.jit(model.apply)
        _JIT_APPLY[id(model)] = fn
    return fn
