"""Multi-codebook transformer language model + TPU-compiled AR generation.

Parity: `audiocraft/models/lm.py:120-587` (per-codebook embeddings summed at
input, per-codebook heads, special token = card, ConditionFuser integration,
depthwise init, CFG variants incl. double-CFG, pattern-aware token-by-token
decode with prompt retention).

TPU-first design:
  * Embeddings/heads are stacked params `[K, card+1, dim]` / `[K, dim, card]`
    — one gather-sum and one einsum instead of K module calls.
  * `generate` compiles to: one prefill forward + one `lax.scan` over decode
    steps with static shapes (fixed-size KV caches, masked writes from the
    host-precomputed pattern index tables). The reference's per-token Python
    loop (`lm.py:540`) disappears.
  * CFG runs fused in the batch dimension (cond/uncond[(/style)] stacked),
    including the MusicGen-Style double CFG (3x batch, `lm.py:355-377`).
"""
import dataclasses
import logging
import collections
import math
import os
import typing as tp
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..modules.conditioners import (AttributeDropout, BaseConditioner,
                                    ClassifierFreeGuidanceDropout,
                                    ConditionFuser, ConditioningAttributes,
                                    ConditioningProvider, ConditionType,
                                    drop_description_condition)
from ..modules.patterns import CodebooksPatternProvider
from ..modules.transformer import LayerCache, StreamingTransformer
from ..ops.quant import QTensor, quantize_weight, w8a8_heads
from ..utils.utils import sample_tokens

logger = logging.getLogger(__name__)
ConditionTensors = tp.Dict[str, ConditionType]


@struct.dataclass
class LMOutput:
    """Logits re-aligned with input codes (`lm.py:113-118`)."""
    logits: jax.Array  # [B, K, T, card]
    mask: jax.Array    # [B, K, T]


def _trunc_normal_init(std: float):
    def init(key, shape, dtype):
        return std * jax.random.truncated_normal(key, -3.0, 3.0, shape, jnp.float32) \
            .astype(dtype)
    return init


def get_init_fn(method: str, input_dim: int, init_depth: tp.Optional[int] = None):
    """LM init (`lm.py:37-63`): std = 1/sqrt(input_dim), depth-rescaled."""
    std = 1 / math.sqrt(input_dim)
    if init_depth is not None:
        std = std / math.sqrt(2 * init_depth)
    if method == "gaussian":
        return _trunc_normal_init(std)
    elif method == "uniform":
        bound = math.sqrt(3) * std
        return lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -bound, bound)
    raise ValueError("Unsupported layer initialization method")


class LMModel(nn.Module):
    """Transformer LM over multiple code streams (`lm.py:120-321`)."""
    pattern_provider: CodebooksPatternProvider
    conditioners: tp.Dict[str, BaseConditioner]
    fuser: ConditionFuser
    n_q: int = 8
    card: int = 1024
    dim: int = 128
    num_heads: int = 8
    hidden_scale: int = 4
    norm_first: bool = False
    bias_proj: bool = True
    weight_init: tp.Optional[str] = None
    depthwise_init: tp.Optional[str] = None
    zero_bias_init: bool = False
    cfg_coef: float = 1.0
    two_step_cfg: bool = False
    # transformer kwargs
    num_layers: int = 8
    dropout: float = 0.0
    attention_dropout: tp.Optional[float] = None
    bias_ff: bool = True
    bias_attn: bool = True
    causal: bool = True
    past_context: tp.Optional[int] = None
    attention_as_float32: bool = False
    layer_scale: tp.Optional[float] = None
    positional_embedding: str = "sin"
    xpos: bool = False
    checkpointing: str = "none"
    layer_scan: bool = False
    cross_attention: bool = False
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    kv_repeat: int = 1
    activation: str = "gelu"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def special_token_id(self) -> int:
        return self.card

    @property
    def num_codebooks(self) -> int:
        return self.n_q

    def setup(self):
        embed_dim = self.card + 1
        emb_init = (get_init_fn(self.weight_init, self.dim, None)
                    if self.weight_init else
                    nn.initializers.normal(1.0))
        # stacked per-codebook embedding tables (`lm.py:164` ScaledEmbedding xK)
        self.emb = self.param("emb", emb_init, (self.n_q, embed_dim, self.dim),
                              self.param_dtype)
        self.condition_provider = ConditioningProvider(self.conditioners)
        self.transformer = StreamingTransformer(
            d_model=self.dim, num_heads=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim),
            dropout=self.dropout, attention_dropout=self.attention_dropout,
            use_bias_ff=self.bias_ff, use_bias_attn=self.bias_attn,
            causal=self.causal, past_context=self.past_context,
            attention_as_float32=self.attention_as_float32,
            cross_attention=self.cross_attention,
            layer_scale=self.layer_scale,
            positional_embedding=self.positional_embedding, xpos=self.xpos,
            qk_layer_norm=self.qk_layer_norm,
            qk_layer_norm_cross=self.qk_layer_norm_cross,
            kv_repeat=self.kv_repeat, norm_first=self.norm_first,
            activation=self.activation, checkpointing=self.checkpointing,
            layer_scan=self.layer_scan,
            dtype=self.dtype, param_dtype=self.param_dtype)
        if self.norm_first:
            self.out_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        head_init = (get_init_fn(self.weight_init, self.dim, None)
                     if self.weight_init else
                     nn.initializers.lecun_normal())
        # stacked per-codebook output heads (`lm.py:177`)
        self.linears = self.param("linears", head_init,
                                  (self.n_q, self.dim, self.card),
                                  self.param_dtype)
        if self.bias_proj:
            self.linears_bias = self.param("linears_bias", nn.initializers.zeros,
                                           (self.n_q, self.card), self.param_dtype)

    def embed_codes(self, sequence: jax.Array) -> jax.Array:
        """sum_k emb[k][seq[:, k]] (`lm.py:244`). sequence [B, K, S] -> [B, S, D]."""
        emb = self.emb.astype(self.dtype)  # [K, V, D]
        gathered = jnp.take_along_axis(emb[None], sequence[..., None], axis=2)
        return jnp.sum(gathered, axis=1)  # [B, K, S, D] -> [B, S, D]

    def compute_conditions(self, tokenized: tp.Dict[str, tp.Any]) -> ConditionTensors:
        """Device forward of the conditioning provider."""
        return self.condition_provider(tokenized)

    def __call__(self, sequence: jax.Array,
                 condition_tensors: ConditionTensors,
                 caches: tp.Optional[tp.List[LayerCache]] = None,
                 attn_bias: tp.Optional[jax.Array] = None,
                 first_step: bool = True,
                 deterministic: bool = True,
                 ) -> tp.Tuple[jax.Array, tp.Optional[tp.List[LayerCache]]]:
        """sequence [B, K, S] -> logits [B, K, S, card] (`lm.py:221-269`)."""
        B, K, S = sequence.shape
        assert K == self.num_codebooks
        input_ = self.embed_codes(sequence)
        input_, cross_attention_input = self.fuser(input_, condition_tensors,
                                                   first_step=first_step)
        out, caches = self.transformer(
            input_, cross_attention_src=cross_attention_input,
            caches=caches, attn_bias=attn_bias, deterministic=deterministic)
        if self.norm_first:
            out = self.out_norm(out)
        # [B, S', D] x [K, D, card] -> [B, K, S', card]
        if isinstance(self.linears, QTensor):
            logits = w8a8_heads(out, self.linears, out.dtype)
        else:
            logits = jnp.einsum("bsd,kdc->bksc", out,
                                self.linears.astype(out.dtype))
        if self.bias_proj:
            logits = logits + self.linears_bias.astype(logits.dtype)[None, :, None, :]
        # remove the prepended-conditions prefix (`lm.py:266-267`)
        if self.fuser.has_prepend and first_step:
            logits = logits[:, :, -S:]
        return logits, caches

    def precompute_cross_kv(self, src: jax.Array, caches: tp.List[LayerCache]):
        return self.transformer.precompute_cross_kv(src, caches)

    def init_all(self, sequence: jax.Array, tokenized: tp.Dict[str, tp.Any]):
        """Init path touching every submodule (conditioners + trunk)."""
        condition_tensors = self.compute_conditions(tokenized)
        return self(sequence, condition_tensors)

    def compute_predictions(self, codes: jax.Array,
                            condition_tensors: ConditionTensors,
                            attn_bias: tp.Optional[jax.Array] = None,
                            keep_only_valid_steps: bool = True,
                            deterministic: bool = True) -> LMOutput:
        """Pattern-interleaved training forward (`lm.py:270-321`):
        codes [B, K, T] -> logits [B, K, T, card] aligned with codes."""
        B, K, T = codes.shape
        pattern = self.pattern_provider.get_pattern(T)
        sequence_codes, _, _ = pattern.build_pattern_sequence(
            codes, self.special_token_id, keep_only_valid_steps=keep_only_valid_steps)
        logits, _ = self(sequence_codes, condition_tensors, attn_bias=attn_bias,
                         deterministic=deterministic)
        logits = logits.transpose(0, 3, 1, 2)  # [B, card, K, S]
        # Fill invalid pattern positions with 0.0, NOT NaN: the reference
        # gathers only mask-selected logits before F.cross_entropy so NaN is
        # never exposed, but here the loss multiplies by the mask and
        # NaN * 0 == NaN — forward/backward must be finite by construction
        # (XLA folding NaN*0 -> 0 is undefined behavior, not a guarantee).
        # Invalid positions are identified by `logits_mask`.
        logits, _, logits_mask = pattern.revert_pattern_logits(
            logits, 0.0, keep_only_valid_steps=keep_only_valid_steps)
        logits = logits.transpose(0, 2, 3, 1)  # [B, K, T, card]
        logits_mask = jnp.broadcast_to(jnp.asarray(logits_mask)[None], (B, K, T))
        return LMOutput(logits, logits_mask)


# --------------------------------------------------------------- generation

@dataclasses.dataclass(frozen=True)
class GenParams:
    """Sampling/CFG hyperparameters (`lm.py:423-433`).

    `two_step_cfg` (or `model.two_step_cfg`) runs the conditional and null
    forwards as two separately-padded streams with their own KV caches
    (`lm.py:343-354`) — this differs from batched CFG exactly when
    cross-attention sees zero-padded positions (see
    tests/models/test_two_step_cfg.py).
    """
    use_sampling: bool = True
    temp: float = 1.0
    top_k: int = 250
    top_p: float = 0.0
    cfg_coef: tp.Optional[float] = None
    cfg_coef_beta: tp.Optional[float] = None
    two_step_cfg: tp.Optional[bool] = None


def init_lm_cache(model: LMModel, batch: int, max_len: int,
                  dtype=None) -> tp.List[LayerCache]:
    """Fresh empty per-layer KV caches for `batch` sequences of `max_len`."""
    from ..modules.transformer import KVCache
    num_kv = model.num_heads // model.kv_repeat
    head_dim = model.dim // model.num_heads
    dtype = dtype or model.dtype
    return [LayerCache(self_attn=KVCache.create(batch, max_len, num_kv,
                                                head_dim, dtype))
            for _ in range(model.num_layers)]


def tokenize_conditions(model: LMModel,
                        conditions: tp.List[ConditioningAttributes]):
    """Host-side tokenization through the provider (no params needed)."""
    return ConditioningProvider(model.conditioners).tokenize(conditions)


def prepare_cfg_conditions(model: LMModel, params,
                           conditions: tp.List[ConditioningAttributes],
                           cfg_coef_beta: tp.Optional[float] = None,
                           two_step: bool = False):
    """Fused CFG condition tensors (`lm.py:483-513`): cond + null stacked in
    the batch dim (cond + wav-only + null for double CFG). With `two_step`
    (`lm.py:343-354`), the conditional and null sets are tokenized
    *separately* — each padded to its own length, which changes the result
    whenever cross-attention sees zero-padded (unmasked) positions — and a
    tuple (cond_tensors, null_tensors) is returned."""
    if not conditions:
        return {}
    if two_step and cfg_coef_beta is None:
        null_conditions = ClassifierFreeGuidanceDropout(p=1.0)(conditions)
        tok_c = tokenize_conditions(model, conditions)
        tok_n = tokenize_conditions(model, null_conditions)
        return (jit_compute_conditions(model, params, tok_c),
                jit_compute_conditions(model, params, tok_n))
    if cfg_coef_beta is not None:
        wav_conditions = drop_description_condition(conditions)
        null_conditions = ClassifierFreeGuidanceDropout(p=1.0)(conditions)
        all_conditions = conditions + wav_conditions + null_conditions
    else:
        null_conditions = ClassifierFreeGuidanceDropout(p=1.0)(conditions)
        all_conditions = conditions + null_conditions
    tokenized = tokenize_conditions(model, all_conditions)
    return jit_compute_conditions(model, params, tokenized)


def _combine_cfg_logits(all_logits: jax.Array, B: int, cfg_coef: float,
                        cfg_coef_beta: tp.Optional[float]) -> jax.Array:
    """CFG combinations (`lm.py:355-401`)."""
    if cfg_coef_beta is not None:
        cond_logits = all_logits[:B]
        wav_logits = all_logits[B:2 * B]
        uncond_logits = all_logits[2 * B:]
        return uncond_logits + cfg_coef * (
            wav_logits + cfg_coef_beta * (cond_logits - wav_logits) - uncond_logits)
    cond_logits, uncond_logits = all_logits[:B], all_logits[B:]
    return uncond_logits + (cond_logits - uncond_logits) * cfg_coef


# Compiled-program caches keyed by (id(model), shape bucket, ...). Each entry
# also holds a strong reference to the model, so a live entry pins its id
# (no stale hits after GC-reuse), and the caches are LRU-bounded so shape
# buckets can't grow them without bound.
_GEN_JIT_CACHE: "collections.OrderedDict[tp.Any, tp.Any]" = \
    collections.OrderedDict()
_COND_JIT_CACHE: "collections.OrderedDict[int, tp.Any]" = \
    collections.OrderedDict()
_JIT_CACHE_MAX_ENTRIES = 16


def _cache_put(cache, key, value):
    cache[key] = value
    cache.move_to_end(key)
    while len(cache) > _JIT_CACHE_MAX_ENTRIES:
        cache.popitem(last=False)

# KV buffers grow through these fractions of the final length during decode
# (zero-padded up between scan segments); (1.0,) disables bucketing. The
# default (1/3, 2/3, 1) shape minimizes sum-over-steps cache reads for 3
# buckets; override via AUDIOCRAFT_CACHE_GROWTH_FRACS="1.0" (comma floats)
# to trade decode HBM traffic for ~3x fewer scan compiles — at B<=8 the KV
# cache is a small share of step traffic and the difference is in the noise.
_CACHE_GROWTH_FRACS: tp.Tuple[float, ...] = (0.375, 0.625, 1.0)
_fracs_env = os.environ.get("AUDIOCRAFT_CACHE_GROWTH_FRACS")
if _fracs_env:
    try:
        _CACHE_GROWTH_FRACS = tuple(float(x) for x in _fracs_env.split(","))
    except ValueError as e:
        raise ValueError(
            f"AUDIOCRAFT_CACHE_GROWTH_FRACS={_fracs_env!r}: comma-separated "
            f"floats expected ({e})") from None
    if (not _CACHE_GROWTH_FRACS
            or any(not 0.0 < f <= 1.0 for f in _CACHE_GROWTH_FRACS)
            or list(_CACHE_GROWTH_FRACS) != sorted(set(_CACHE_GROWTH_FRACS))
            or _CACHE_GROWTH_FRACS[-1] != 1.0):
        raise ValueError(
            f"AUDIOCRAFT_CACHE_GROWTH_FRACS={_fracs_env!r}: fractions must "
            f"be strictly increasing in (0, 1] and end with 1.0")


def jit_compute_conditions(model: LMModel, params, tokenized):
    """Jitted conditioner forward (eager op dispatch on the axon platform is
    seconds per op; one compiled program per tokenized shape bucket)."""
    from ..modules.conditioners import WavCondition

    def sanitize(v):
        # strip non-array metadata so the pytree only holds jittable leaves
        if isinstance(v, WavCondition):
            return WavCondition(jnp.asarray(v.wav), jnp.asarray(v.length),
                                sample_rate=[], path=[], seek_time=[])
        return v

    tokenized = {k: sanitize(v) for k, v in tokenized.items()}
    entry = _COND_JIT_CACHE.get(id(model))
    if entry is None or entry[0] is not model:
        fn = jax.jit(lambda p, t: model.apply(p, t,
                                              method=LMModel.compute_conditions))
        _cache_put(_COND_JIT_CACHE, id(model), (model, fn))
    else:
        fn = entry[1]
    return fn(params, tokenized)


def _get_decode_fn(model: LMModel, pattern, S: int, start: int, cfg_mult: int,
                   B: int, gen: GenParams, cfg_coef: float, cache_dtype,
                   cond_struct: tp.Tuple):
    """Build (and cache) the jitted prefill+scan program for one shape bucket."""
    key = (id(model), S, start, cfg_mult, B, gen, str(cache_dtype),
           cond_struct, _CACHE_GROWTH_FRACS)
    entry = _GEN_JIT_CACHE.get(key)
    if entry is not None and entry[0] is model:
        _GEN_JIT_CACHE.move_to_end(key)
        return entry[1]

    unknown_token = -1
    special = model.special_token_id
    cfg_coef_beta = gen.cfg_coef_beta
    # pattern index tables are host constants baked into the program
    _, seq_mask_np = pattern._build_pattern_sequence_scatter_indexes(
        pattern.timesteps, model.n_q, keep_only_valid_steps=False)

    def run(params, rng, gen_sequence, condition_tensors):
        seq_mask = jnp.asarray(seq_mask_np)  # [K, S]
        # two-step CFG (`lm.py:343-354`): conditional/null tensors arrive as
        # a tuple of separately-padded streams, each with its own KV caches
        # and its own forward per step; batched CFG is one stream of
        # cfg_mult*B. Logits are concatenated before the CFG combine either
        # way, so _combine_cfg_logits is shared.
        if isinstance(condition_tensors, tuple):
            streams = list(condition_tensors)
            stream_batch = B
        else:
            streams = [condition_tensors]
            stream_batch = cfg_mult * B
        prepend_len = 0
        if model.fuser.has_prepend and streams[0]:
            prepend_len = sum(streams[0][name][0].shape[1]
                              for name in model.fuser.fuse2cond.get("prepend", [])
                              if name in streams[0])
        # Bucketed cache sizes: decode attention is HBM-bound on reading the
        # static KV buffers every step, so early steps run against smaller
        # buffers that are zero-padded up as decoding progresses (~25-35%
        # less cache traffic than one full-size buffer for the whole scan).
        # (two-step CFG streams may have different prepend lengths, so they
        # use one full-size cache each instead of shared growth buckets.)
        S_total = S + prepend_len
        min_first = prepend_len + start + 2  # prefill + first scan write
        bounds: tp.List[int] = []
        if len(streams) == 1:
            for frac in _CACHE_GROWTH_FRACS:
                cap = min(S_total, max(min_first,
                                       -(-int(S_total * frac) // 64) * 64))
                if not bounds or cap > bounds[-1]:
                    bounds.append(cap)
            bounds[-1] = S_total
        else:
            bounds = [S_total]

        def stream_prepend(ct):
            if not (model.fuser.has_prepend and ct):
                return 0
            return sum(ct[name][0].shape[1]
                       for name in model.fuser.fuse2cond.get("prepend", [])
                       if name in ct)

        caches_list = []
        for ct in streams:
            cap0 = bounds[0] if len(streams) == 1 else S + stream_prepend(ct)
            caches = init_lm_cache(model, stream_batch, cap0, cache_dtype)
            if model.cross_attention and ct:
                cross_src = None
                for name in model.fuser.fuse2cond.get("cross", []):
                    if name in ct:
                        c = ct[name][0]
                        cross_src = c if cross_src is None else \
                            jnp.concatenate([cross_src, c], axis=1)
                if cross_src is not None:
                    # cross K/V stay bf16 under int8 self-attn caches (tiny,
                    # and float->int8 astype would truncate garbage)
                    cross_dt = (jnp.bfloat16 if cache_dtype == jnp.int8
                                else cache_dtype)
                    caches = model.apply(params, cross_src.astype(cross_dt),
                                         caches,
                                         method=LMModel.precompute_cross_kv)
            caches_list.append(caches)

        def fwd(seq_chunk, caches_list, first_step):
            outs = []
            new_list = []
            for ct, caches in zip(streams, caches_list):
                seq_in = (jnp.concatenate([seq_chunk] * cfg_mult, axis=0)
                          if cfg_mult > 1 and len(streams) == 1 else seq_chunk)
                out, caches = model.apply(
                    params, seq_in, ct, caches=caches,
                    first_step=first_step)
                outs.append(out)
                new_list.append(caches)
            all_logits = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
            if cfg_mult > 1:
                logits = _combine_cfg_logits(all_logits, B, cfg_coef,
                                             cfg_coef_beta)
            else:
                logits = all_logits
            return logits, new_list

        def sample_step(rng, logits_last, offset):
            next_token = sample_tokens(
                rng, logits_last, use_sampling=gen.use_sampling, temp=gen.temp,
                top_k=gen.top_k, top_p=gen.top_p)[..., 0]  # [B, K]
            valid = jax.lax.dynamic_slice_in_dim(seq_mask, offset, 1, axis=1)[:, 0]
            return jnp.where(valid[None, :], next_token, special).astype(jnp.int32)

        # ---- prefill: feed steps [0, start), sample step `start`
        rng, r0 = jax.random.split(rng)
        logits, caches_list = fwd(gen_sequence[..., :start], caches_list, True)
        next_token = sample_step(r0, logits[:, :, -1], start)
        cur = gen_sequence[..., start]
        gen_sequence = gen_sequence.at[..., start].set(
            jnp.where(cur == unknown_token, next_token, cur))

        # ---- scan decode over offsets [start+1, S)
        def step(carry, offset):
            gen_sequence, caches_list, rng = carry
            rng, r = jax.random.split(rng)
            tok = jax.lax.dynamic_slice_in_dim(gen_sequence, offset - 1, 1, axis=2)
            logits, caches_list = fwd(tok, caches_list, False)
            next_token = sample_step(r, logits[:, :, -1], offset)
            cur = jax.lax.dynamic_slice_in_dim(gen_sequence, offset, 1,
                                               axis=2)[..., 0]
            write = jnp.where(cur == unknown_token, next_token, cur)
            gen_sequence = jax.lax.dynamic_update_slice_in_dim(
                gen_sequence, write[..., None], offset, axis=2)
            return (gen_sequence, caches_list, rng), None

        def grow(caches, new_len):
            from ..modules.transformer import KVCache
            def g(layer):
                sa = layer.self_attn
                pad = new_len - sa.k.shape[1]
                if pad <= 0:
                    return layer
                pads = ((0, 0), (0, pad), (0, 0), (0, 0))
                padded = KVCache(
                    k=jnp.pad(sa.k, pads), v=jnp.pad(sa.v, pads),
                    index=sa.index,
                    k_scale=None if sa.k_scale is None
                    else jnp.pad(sa.k_scale, pads),
                    v_scale=None if sa.v_scale is None
                    else jnp.pad(sa.v_scale, pads))
                return LayerCache(self_attn=padded,
                                  cross_k=layer.cross_k, cross_v=layer.cross_v)
            return [g(layer) for layer in caches]

        lo = start + 1
        for i, cap in enumerate(bounds):
            hi = min(S, cap - prepend_len)
            if hi > lo:
                offsets = jnp.arange(lo, hi)
                (gen_sequence, caches_list, rng), _ = jax.lax.scan(
                    step, (gen_sequence, caches_list, rng), offsets)
                lo = hi
            if i + 1 < len(bounds) and lo < S:
                caches_list = [grow(c, bounds[i + 1]) for c in caches_list]
        if S > lo:
            offsets = jnp.arange(lo, S)
            (gen_sequence, caches_list, rng), _ = jax.lax.scan(
                step, (gen_sequence, caches_list, rng), offsets)

        # masked positions must hold the special token (`lm.py:559-575`)
        gen_sequence = jnp.where(seq_mask[None], gen_sequence, special)
        return gen_sequence

    fn = jax.jit(run)
    _cache_put(_GEN_JIT_CACHE, key, (model, fn))
    return fn


def generate(model: LMModel, params, rng: jax.Array,
             prompt: tp.Optional[jax.Array] = None,
             conditions: tp.List[ConditioningAttributes] = [],
             condition_tensors: tp.Optional[ConditionTensors] = None,
             num_samples: tp.Optional[int] = None,
             max_gen_len: int = 256,
             gen: GenParams = GenParams(),
             cache_dtype=None,
             check: bool = False) -> jax.Array:
    """AR generation (`lm.py:420-587`): prefill + scan, CFG in batch dim.

    Returns codes [B, K, max_gen_len] with the prompt retained.
    """
    possible_num_samples = []
    if num_samples is not None:
        possible_num_samples.append(num_samples)
    elif prompt is not None:
        possible_num_samples.append(prompt.shape[0])
    elif conditions:
        possible_num_samples.append(len(conditions))
    else:
        possible_num_samples.append(1)
    assert all(x == possible_num_samples[0] for x in possible_num_samples), \
        "Inconsistent inputs shapes"
    num_samples = possible_num_samples[0]

    cfg_coef = model.cfg_coef if gen.cfg_coef is None else gen.cfg_coef
    two_step = (model.two_step_cfg if gen.two_step_cfg is None
                else gen.two_step_cfg)
    if condition_tensors is None:
        condition_tensors = prepare_cfg_conditions(
            model, params, conditions, cfg_coef_beta=gen.cfg_coef_beta,
            two_step=bool(two_step))

    K = model.num_codebooks
    if prompt is None:
        assert num_samples > 0
        prompt = jnp.zeros((num_samples, K, 0), jnp.int32)
    B, K, T = prompt.shape
    start_offset = T
    assert start_offset < max_gen_len

    pattern = model.pattern_provider.get_pattern(max_gen_len)
    unknown_token = -1
    special = model.special_token_id

    gen_codes = jnp.full((B, K, max_gen_len), unknown_token, jnp.int32)
    if T > 0:
        gen_codes = gen_codes.at[..., :T].set(prompt.astype(jnp.int32))
    gen_sequence, _, _ = pattern.build_pattern_sequence(gen_codes, special)
    S = gen_sequence.shape[-1]
    start = pattern.get_first_step_with_timesteps(start_offset)
    assert start is not None

    cfg_mult = 1
    if condition_tensors:
        cfg_mult = 3 if gen.cfg_coef_beta is not None else 2
    cache_dtype = cache_dtype or model.dtype
    if isinstance(condition_tensors, tuple):
        cond_struct = tuple(
            tuple(sorted((k, tuple(v[0].shape)) for k, v in ct.items()))
            for ct in condition_tensors)
    else:
        cond_struct = tuple(sorted(
            (k, tuple(v[0].shape)) for k, v in condition_tensors.items()))

    fn = _get_decode_fn(model, pattern, S, start, cfg_mult, B, gen,
                        float(cfg_coef), cache_dtype, cond_struct)
    gen_sequence = fn(params, rng, gen_sequence, condition_tensors)

    out_codes, _, out_mask = pattern.revert_pattern_sequence(
        gen_sequence, special_token=unknown_token)
    if check:
        oc = np.asarray(out_codes[..., :max_gen_len])
        assert (oc != unknown_token).all()
        assert (oc >= 0).all() and (oc <= special).all()
    return out_codes[..., :max_gen_len]


def quantize_lm_params(model: LMModel, params):
    """W8A8 int8 serving mode (opt-in): quantize the LM trunk's hot matmul
    weights to per-output-channel int8 `QTensor`s consumed by the native
    int8 MXU dot (`ops/quant.py`). Quantized: fused-qkv `in_proj_weight`,
    attention `out_proj`, FFN `linear1`/`linear2`, and the per-codebook
    output heads `linears`. Kept bf16: embeddings (a gather, not a matmul),
    norms, biases, and all conditioner params (run once per clip; quality
    headroom is not worth the risk there).

    Pass the result anywhere `params` goes (`generate`, `model.apply`) —
    call-sites dispatch on the leaf type. Measured win: ~1.25x on the
    weight-streaming-bound small-batch decode (B=1/B=8 latency axis);
    at the B=256 throughput headline weights are <5% of decode HBM traffic
    (the KV cache dominates), so the E2E gain there is marginal.
    Quality bound: see tests/models/test_lm_quant.py (logit drift vs bf16).
    """
    def walk(tree, path):
        if isinstance(tree, tp.Mapping):
            return {k: walk(v, path + (str(k),)) for k, v in tree.items()}
        name = path[-1] if path else ""
        # conditioner params live under "conditioners_<name>" (setup attr
        # naming) or "condition_provider" depending on the init path
        if any("condition" in p for p in path):
            return tree
        if name in ("in_proj_weight", "linears"):
            return quantize_weight(tree)
        if name == "kernel" and len(path) >= 2 and \
                path[-2] in ("out_proj", "linear1", "linear2"):
            return quantize_weight(tree)
        return tree

    return walk(params, ())


# ------------------------------------------------------------ initialization

def init_lm_params(model: LMModel, rng: jax.Array, seq_len: int = 8,
                   param_dtype=None):
    """Initialize all LM params, applying the reference's weight-init policy
    (`lm.py:179-211`: gaussian/uniform with optional depthwise rescale and
    zero bias init).

    The whole init (flax init + re-init policy + optional `param_dtype`
    cast) runs under ONE `jax.jit`: eagerly it is thousands of tiny device
    dispatches (~500 leaves x init+cast), which over a remote-device tunnel
    dominates model startup — measured 2026-08-19 on the 1.5B medium LM,
    eager init was ~450 s of an audiogen bench part's 538 s wall. One jitted
    program compiles once (persistent-cacheable) and runs in seconds."""
    text_conds = [k for k, v in model.conditioners.items()
                  if hasattr(v, "tokenize")]
    attrs = [ConditioningAttributes(text={name: "init" for name in text_conds})]
    tokenized = tokenize_conditions(model, attrs)
    rng, init_rng = jax.random.split(rng)

    @jax.jit
    def _init(init_rng, w_rng, tokenized):
        seq = jnp.zeros((1, model.n_q, seq_len), jnp.int32)
        params = model.init(init_rng, seq, tokenized,
                            method=LMModel.init_all)
        if model.weight_init is not None:
            params = apply_lm_weight_init(model, params, w_rng)
        if param_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        return params

    return _init(init_rng, rng, tokenized)


def apply_lm_weight_init(model: LMModel, params, rng: jax.Array):
    """Re-init matching the reference `_init_weights` (`lm.py:179-211`):
    every Linear kernel gets init std 1/sqrt(fan_in), rescaled by
    sqrt(2*depth) inside transformer layers (depthwise 'current' uses the
    layer index, 'global' the total layer count); embeddings use
    std 1/sqrt(dim); biases zeroed when `zero_bias_init`."""
    assert model.depthwise_init in (None, "current", "global")
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    rngs = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, leaf), lrng in zip(flat, rngs):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        spath = "/".join(str(n) for n in names)
        depth = None
        if "transformer" in spath and model.depthwise_init is not None:
            for n in names:
                if isinstance(n, str) and n.startswith("layers_"):
                    idx = int(n.split("_")[1])
                    depth = (idx + 1 if model.depthwise_init == "current"
                             else model.num_layers)
        is_bias = names[-1] in ("bias", "in_proj_bias", "linears_bias", "b_ih", "b_hh")
        is_norm = any("norm" in str(n) for n in names) or names[-1] in ("scale",)
        if is_norm or "conditioners" in spath:
            new_leaves.append(leaf)
            continue
        if is_bias:
            new_leaves.append(jnp.zeros_like(leaf) if model.zero_bias_init else leaf)
            continue
        if names[-1] == "emb":  # [K, V, D]: embedding init, input_dim = D
            init_fn = get_init_fn(model.weight_init, leaf.shape[-1], None)
            new_leaves.append(init_fn(lrng, leaf.shape, leaf.dtype))
        elif names[-1] == "linears":  # heads [K, D, card]
            init_fn = get_init_fn(model.weight_init, leaf.shape[1], None)
            new_leaves.append(init_fn(lrng, leaf.shape, leaf.dtype))
        elif names[-1] in ("kernel", "in_proj_weight") and leaf.ndim >= 2:
            init_fn = get_init_fn(model.weight_init, leaf.shape[0], depth)
            new_leaves.append(init_fn(lrng, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
