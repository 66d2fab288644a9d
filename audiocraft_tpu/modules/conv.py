"""Streamable 1d convolutions with causal / asymmetric padding laws.

Behavioral parity with the reference's streamable convolutions
(`audiocraft/modules/conv.py:47-243`): the same padding/trim arithmetic so that
encoder/decoder lengths match exactly and torch checkpoints can be ported.

TPU-first design notes:
  * Layout is channels-last ``[B, T, C]`` (lanes = feature dim) instead of the
    reference's ``[B, C, T]``; XLA maps NHC conv directly onto the MXU.
  * Padding amounts are pure Python ints derived from static shapes, so
    everything stays compile-time static under ``jit``.
  * weight-norm is a (v, g) parametrization computed on the fly; XLA fuses the
    normalization into the conv weight computation.
"""
import math
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

CONV_NORMALIZATIONS = frozenset(["none", "weight_norm", "spectral_norm", "time_group_norm"])


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """Extra right-padding so the last conv window is full.

    Mirrors `audiocraft/modules/conv.py:47-53`.
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad_for_conv1d(x: jax.Array, kernel_size: int, stride: int, padding_total: int = 0):
    """Pad (right) so that the last window is full (`conv.py:56-68`)."""
    extra_padding = get_extra_padding_for_conv1d(x.shape[1], kernel_size, stride, padding_total)
    return pad1d(x, (0, extra_padding))


def pad1d(x: jax.Array, paddings: tp.Tuple[int, int], mode: str = "constant",
          value: float = 0.0) -> jax.Array:
    """Pad the time axis of a ``[B, T, C]`` tensor.

    Handles reflect padding on inputs shorter than the pad amount by
    zero-extending first (`conv.py:71-88`).
    """
    length = x.shape[1]
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    if mode == "reflect":
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra_pad), (0, 0)))
        padded = jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)), mode="reflect")
        end = padded.shape[1] - extra_pad
        return padded[:, :end]
    else:
        return jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)),
                       mode="constant", constant_values=value)


def unpad1d(x: jax.Array, paddings: tp.Tuple[int, int]) -> jax.Array:
    """Remove padding from the time axis (`conv.py:91-97`)."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end]


def _weight_norm_kernel(v: jax.Array, g: jax.Array) -> jax.Array:
    """kernel = g * v / ||v||, norm over all dims except the output-channel dim.

    ``v`` is ``[K, Cin, Cout]`` (or ``[K, Cout, Cin//groups]`` transposed conv);
    norm is taken over every axis except the last, matching torch
    ``weight_norm(dim=0)`` on ``[Cout, Cin, K]``.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


class NormConv1d(nn.Module):
    """Conv1d + normalization with a uniform interface (`conv.py:103-117`).

    Input/output layout ``[B, T, C]``.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int = 0
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.norm in CONV_NORMALIZATIONS, self.norm
        kshape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        # Match torch Conv1d default init: kaiming_uniform(a=sqrt(5)) ~ U(-b, b)
        # with b = 1/sqrt(fan_in).
        fan_in = self.in_channels // self.groups * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        init = nn.initializers.uniform(scale=2 * bound)

        def kernel_init(key, shape, dtype):
            return init(key, shape, dtype) - bound

        if self.norm == "weight_norm":
            v = self.param("kernel_v", kernel_init, kshape, self.param_dtype)
            g = self.param("kernel_g",
                           lambda key, shape, dtype: jnp.sqrt(
                               jnp.sum(jnp.square(v), axis=(0, 1))).astype(dtype),
                           (self.out_channels,), self.param_dtype)
            kernel = _weight_norm_kernel(v, g)
        else:
            kernel = self.param("kernel", kernel_init, kshape, self.param_dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", kernel_init, (self.out_channels,), self.param_dtype)
            y = y + b.astype(self.dtype)
        if self.norm == "time_group_norm":
            assert not self.causal, "GroupNorm doesn't support causal evaluation."
            y = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                             param_dtype=self.param_dtype, **self.norm_kwargs)(y)
        return y


class NormConvTranspose1d(nn.Module):
    """ConvTranspose1d + normalization (`conv.py:133-147`). Layout ``[B, T, C]``."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.norm in CONV_NORMALIZATIONS, self.norm
        # Stored in torch ConvTranspose1d order [K, Cin, Cout] after transpose:
        # torch stores [Cin, Cout, K]; we keep [K, Cin, Cout] ("HIO" w/ transpose).
        kshape = (self.kernel_size, self.in_channels, self.out_channels)
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        init = nn.initializers.uniform(scale=2 * bound)

        def kernel_init(key, shape, dtype):
            return init(key, shape, dtype) - bound

        if self.norm == "weight_norm":
            # torch weight_norm on ConvTranspose1d normalizes over dim 0 = Cin
            # i.e. per (Cout, K)?? torch dim=0 means norm over dims (1, 2) per
            # input-channel row; we keep per-output-channel semantics used by
            # EnCodec checkpoints: norm over (K, Cin) per Cout works because we
            # port weights by direct reparametrization at load time.
            v = self.param("kernel_v", kernel_init, kshape, self.param_dtype)
            g = self.param("kernel_g",
                           lambda key, shape, dtype: jnp.sqrt(
                               jnp.sum(jnp.square(v), axis=(0, 2))).astype(dtype),
                           (self.in_channels,), self.param_dtype)
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
            kernel = v * (g[None, :, None] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kernel_init, kshape, self.param_dtype)

        # Transposed conv expressed as lhs-dilated conv with a spatially
        # flipped kernel: out[t] = sum_k x[s] w[k] for t = s*stride + k,
        # identical to torch ConvTranspose1d (weight [Cin, Cout, K] == our
        # kernel[k, ci, co]). Output length (T-1)*stride + K.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[::-1].astype(self.dtype),
            window_strides=(1,),
            padding=((self.kernel_size - 1, self.kernel_size - 1),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            b = self.param("bias", kernel_init, (self.out_channels,), self.param_dtype)
            y = y + b.astype(self.dtype)
        if self.norm == "time_group_norm":
            assert not self.causal, "GroupNorm doesn't support causal evaluation."
            y = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                             param_dtype=self.param_dtype, **self.norm_kwargs)(y)
        return y


class StreamableConv1d(nn.Module):
    """Conv1d with built-in causal/asymmetric padding (`conv.py:165-201`)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    pad_mode: str = "reflect"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_size = (self.kernel_size - 1) * self.dilation + 1  # effective
        padding_total = kernel_size - self.stride
        extra_padding = get_extra_padding_for_conv1d(
            x.shape[1], kernel_size, self.stride, padding_total)
        if self.causal:
            x = pad1d(x, (padding_total, extra_padding), mode=self.pad_mode)
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
            x = pad1d(x, (padding_left, padding_right + extra_padding), mode=self.pad_mode)
        return NormConv1d(self.in_channels, self.out_channels, self.kernel_size,
                          stride=self.stride, dilation=self.dilation, groups=self.groups,
                          use_bias=self.use_bias, causal=self.causal, norm=self.norm,
                          norm_kwargs=self.norm_kwargs, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv")(x)


class StreamableConvTranspose1d(nn.Module):
    """ConvTranspose1d with causal/asymmetric trim (`conv.py:204-243`)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    norm: str = "none"
    trim_right_ratio: float = 1.0
    norm_kwargs: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.causal or self.trim_right_ratio == 1.0, \
            "`trim_right_ratio` != 1.0 only makes sense for causal convolutions"
        padding_total = self.kernel_size - self.stride
        y = NormConvTranspose1d(self.in_channels, self.out_channels, self.kernel_size,
                                stride=self.stride, causal=self.causal, norm=self.norm,
                                norm_kwargs=self.norm_kwargs, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="convtr")(x)
        if self.causal:
            padding_right = math.ceil(padding_total * self.trim_right_ratio)
            padding_left = padding_total - padding_right
            y = unpad1d(y, (padding_left, padding_right))
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
            y = unpad1d(y, (padding_left, padding_right))
        return y


class NormConv2d(nn.Module):
    """Conv2d + normalization (`conv.py:119-131`). Layout ``[B, H, W, C]``
    (NHWC; reference uses NCHW)."""
    in_channels: int
    out_channels: int
    kernel_size: tp.Tuple[int, int]
    stride: tp.Tuple[int, int] = (1, 1)
    dilation: tp.Tuple[int, int] = (1, 1)
    padding: tp.Tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = nn.module.FrozenDict()
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.norm in CONV_NORMALIZATIONS, self.norm
        kh, kw = self.kernel_size
        kshape = (kh, kw, self.in_channels, self.out_channels)
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        init = nn.initializers.uniform(scale=2 * bound)

        def kernel_init(key, shape, dtype):
            return init(key, shape, dtype) - bound

        if self.norm == "weight_norm":
            v = self.param("kernel_v", kernel_init, kshape, self.param_dtype)
            g = self.param("kernel_g",
                           lambda key, shape, dtype: jnp.sqrt(
                               jnp.sum(jnp.square(v), axis=(0, 1, 2))).astype(dtype),
                           (self.out_channels,), self.param_dtype)
            kernel = _weight_norm_kernel(v, g)
        else:
            kernel = self.param("kernel", kernel_init, kshape, self.param_dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", kernel_init, (self.out_channels,), self.param_dtype)
            y = y + b.astype(self.dtype)
        if self.norm == "time_group_norm":
            y = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                             param_dtype=self.param_dtype, **self.norm_kwargs)(y)
        return y
