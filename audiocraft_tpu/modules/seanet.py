"""SEANet encoder/decoder — the EnCodec conv stack.

Parity: `audiocraft/modules/seanet.py:16-258` (resblocks, strided
down/upsampling by `ratios`, optional LSTM bottleneck, norm-disable on outer
blocks). Layout is channels-last ``[B, T, C]``; callers convert from audio
``[B, C, T]`` once at the model boundary.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .activations import get_activation_fn
from .conv import StreamableConv1d, StreamableConvTranspose1d
from .lstm import StreamableLSTM


class SEANetResnetBlock(nn.Module):
    """Residual block (`seanet.py:16-62`)."""
    dim: int
    kernel_sizes: tp.Tuple[int, ...] = (3, 1)
    dilations: tp.Tuple[int, ...] = (1, 1)
    activation: str = "elu"
    activation_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict({"alpha": 1.0})
    norm: str = "none"
    norm_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    causal: bool = False
    pad_mode: str = "reflect"
    compress: int = 2
    true_skip: bool = True
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert len(self.kernel_sizes) == len(self.dilations)
        act = get_activation_fn(self.activation, **dict(self.activation_params))
        hidden = self.dim // self.compress
        y = x
        n = len(self.kernel_sizes)
        for i, (kernel_size, dilation) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            y = act(y)
            y = StreamableConv1d(in_chs, out_chs, kernel_size=kernel_size,
                                 dilation=dilation, norm=self.norm,
                                 norm_kwargs=self.norm_params, causal=self.causal,
                                 pad_mode=self.pad_mode, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name=f"block_{i}")(y)
        if self.true_skip:
            shortcut = x
        else:
            shortcut = StreamableConv1d(self.dim, self.dim, kernel_size=1,
                                        norm=self.norm, norm_kwargs=self.norm_params,
                                        causal=self.causal, pad_mode=self.pad_mode,
                                        dtype=self.dtype, param_dtype=self.param_dtype,
                                        name="shortcut")(x)
        return shortcut + y


class SEANetEncoder(nn.Module):
    """SEANet encoder (`seanet.py:65-158`): conv -> [resblocks + strided
    downsample per ratio] -> LSTM -> conv. Ratios are given in decoder order
    and reversed internally, matching the reference."""
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "elu"
    activation_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict({"alpha": 1.0})
    norm: str = "none"
    norm_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = True
    compress: int = 2
    lstm: int = 0
    disable_norm_outer_blocks: int = 0
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ratios = list(reversed(self.ratios))
        n_blocks = len(ratios) + 2
        dnob = self.disable_norm_outer_blocks
        assert 0 <= dnob <= n_blocks
        act = get_activation_fn(self.activation, **dict(self.activation_params))
        common = dict(causal=self.causal, pad_mode=self.pad_mode,
                      dtype=self.dtype, param_dtype=self.param_dtype)

        mult = 1
        y = StreamableConv1d(self.channels, mult * self.n_filters, self.kernel_size,
                             norm="none" if dnob >= 1 else self.norm,
                             norm_kwargs=self.norm_params, name="conv_in", **common)(x)
        for i, ratio in enumerate(ratios):
            block_norm = "none" if dnob >= i + 2 else self.norm
            for j in range(self.n_residual_layers):
                y = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    norm=block_norm, norm_params=self.norm_params,
                    activation=self.activation, activation_params=self.activation_params,
                    compress=self.compress, true_skip=self.true_skip,
                    causal=self.causal, pad_mode=self.pad_mode,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"res_{i}_{j}")(y)
            y = act(y)
            y = StreamableConv1d(mult * self.n_filters, mult * self.n_filters * 2,
                                 kernel_size=ratio * 2, stride=ratio,
                                 norm=block_norm, norm_kwargs=self.norm_params,
                                 name=f"down_{i}", **common)(y)
            mult *= 2

        if self.lstm:
            y = StreamableLSTM(mult * self.n_filters, num_layers=self.lstm,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="lstm")(y)
        y = act(y)
        y = StreamableConv1d(mult * self.n_filters, self.dimension, self.last_kernel_size,
                             norm="none" if dnob == n_blocks else self.norm,
                             norm_kwargs=self.norm_params, name="conv_out", **common)(y)
        return y


class SEANetDecoder(nn.Module):
    """SEANet decoder (`seanet.py:161-258`), mirror of the encoder with
    transposed convs."""
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "elu"
    activation_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict({"alpha": 1.0})
    final_activation: tp.Optional[str] = None
    final_activation_params: tp.Optional[tp.Mapping[str, tp.Any]] = None
    norm: str = "none"
    norm_params: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = True
    compress: int = 2
    lstm: int = 0
    disable_norm_outer_blocks: int = 0
    trim_right_ratio: float = 1.0
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        ratios = list(self.ratios)
        n_blocks = len(ratios) + 2
        dnob = self.disable_norm_outer_blocks
        assert 0 <= dnob <= n_blocks
        act = get_activation_fn(self.activation, **dict(self.activation_params))
        common = dict(causal=self.causal, dtype=self.dtype, param_dtype=self.param_dtype)

        mult = int(2 ** len(ratios))
        y = StreamableConv1d(self.dimension, mult * self.n_filters, self.kernel_size,
                             norm="none" if dnob == n_blocks else self.norm,
                             norm_kwargs=self.norm_params, pad_mode=self.pad_mode,
                             name="conv_in", **common)(z)
        if self.lstm:
            y = StreamableLSTM(mult * self.n_filters, num_layers=self.lstm,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="lstm")(y)
        for i, ratio in enumerate(ratios):
            block_norm = "none" if dnob >= n_blocks - (i + 1) else self.norm
            y = act(y)
            y = StreamableConvTranspose1d(mult * self.n_filters, mult * self.n_filters // 2,
                                          kernel_size=ratio * 2, stride=ratio,
                                          norm=block_norm, norm_kwargs=self.norm_params,
                                          trim_right_ratio=self.trim_right_ratio,
                                          name=f"up_{i}", **common)(y)
            for j in range(self.n_residual_layers):
                y = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation, activation_params=self.activation_params,
                    norm=block_norm, norm_params=self.norm_params,
                    compress=self.compress, true_skip=self.true_skip,
                    causal=self.causal, pad_mode=self.pad_mode,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"res_{i}_{j}")(y)
            mult //= 2

        y = act(y)
        y = StreamableConv1d(self.n_filters, self.channels, self.last_kernel_size,
                             norm="none" if dnob >= 1 else self.norm,
                             norm_kwargs=self.norm_params, pad_mode=self.pad_mode,
                             name="conv_out", **common)(y)
        if self.final_activation is not None:
            final_act = get_activation_fn(self.final_activation,
                                          **dict(self.final_activation_params or {}))
            y = final_act(y)
        return y
