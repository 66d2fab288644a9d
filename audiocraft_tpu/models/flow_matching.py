"""Conditional flow matching over EnCodec latents (JASCO core).

Parity: `audiocraft/models/flow_matching.py:28-516` — UnetTransformer backbone
with sinusoidal time embedding added to the cross-attention input, temporal
conditions concatenated on the feature dim, multi-source CFG
(all/text-only/null terms with weights), Euler or dopri5 generation.

TPU design: Euler integration is a `lax.scan` over steps; dopri5 uses
`jax.experimental.ode.odeint` (adaptive RK45) instead of torchdiffeq.
"""
import math
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..modules.conditioners import (AttributeDropout, BaseConditioner,
                                    ClassifierFreeGuidanceDropout,
                                    ConditionFuser, ConditioningAttributes,
                                    ConditionType)
from ..modules.unet_transformer import UnetTransformer
from .lm import get_init_fn

ConditionTensors = tp.Dict[str, ConditionType]
JASCO_TEMPORAL_CONDS = ["chords", "self_wav", "melody"]  # order matters


@struct.dataclass
class FMOutput:
    latents: jax.Array  # [B, T, D]
    mask: jax.Array     # [B, T]


class CFGTerm:
    """Multi-source CFG term (`flow_matching.py:40-62`)."""

    def __init__(self, conditions, weight):
        self.conditions = conditions
        self.weight = weight

    def drop_irrelevant_conds(self, conditions):
        raise NotImplementedError("No base implementation for setting generation params.")


class AllCFGTerm(CFGTerm):
    """Keeps all conditions (`flow_matching.py:64-73`)."""

    def __init__(self, conditions, weight):
        super().__init__(conditions, weight)

    def drop_irrelevant_conds(self):
        pass


class NullCFGTerm(CFGTerm):
    """Drops all conditions (`flow_matching.py:76-90`)."""

    def __init__(self, conditions, weight):
        super().__init__(conditions, weight)
        self.conditions = ClassifierFreeGuidanceDropout(p=1.0)(
            samples=self.conditions, cond_types=["wav", "text", "symbolic"])


class TextCFGTerm(CFGTerm):
    """Keeps text, drops temporal conditions (`flow_matching.py:93-119`)."""

    def __init__(self, conditions, weight, model_att_dropout):
        super().__init__(conditions, weight)
        p = getattr(model_att_dropout, "p", {})
        drop_symbolics = {k: 1.0 for k in p.get("symbolic", {}).keys()}
        drop_wav = {k: 1.0 for k in p.get("wav", {}).keys()}
        dropper = AttributeDropout({"symbolic": drop_symbolics,
                                    "wav": drop_wav})
        dropper.active_on_eval = True
        self.conditions = dropper(self.conditions)


class FlowMatchingModel(nn.Module):
    """`flow_matching.py:121-343`."""
    conditioners: tp.Dict[str, BaseConditioner]
    fuser: ConditionFuser
    dim: int = 128
    num_heads: int = 8
    flow_dim: int = 128
    chords_dim: int = 0
    drums_dim: int = 0
    melody_dim: int = 0
    hidden_scale: int = 4
    norm_first: bool = False
    bias_proj: bool = True
    weight_init: tp.Optional[str] = None
    depthwise_init: tp.Optional[str] = None
    zero_bias_init: bool = False
    cfg_coef: float = 1.0
    time_embedding_dim: int = 128
    num_layers: int = 8
    skip_connections: bool = True
    causal: bool = False
    cross_attention: bool = True
    activation: str = "gelu"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    def setup(self):
        in_dim = (self.flow_dim + self.chords_dim + self.drums_dim
                  + self.melody_dim)
        self.emb = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            param_dtype=self.param_dtype)
        self.transformer = UnetTransformer(
            d_model=self.dim, num_heads=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim),
            norm_first=self.norm_first, causal=self.causal,
            cross_attention=self.cross_attention,
            skip_connections=self.skip_connections,
            activation=self.activation, dtype=self.dtype,
            param_dtype=self.param_dtype)
        if self.norm_first:
            self.out_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        self.linear = nn.Dense(self.flow_dim, use_bias=self.bias_proj,
                               dtype=self.dtype, param_dtype=self.param_dtype)
        # time-parameter MLP (`flow_matching.py:196-216`)
        self.temb_dense_0 = nn.Dense(4 * self.time_embedding_dim,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.temb_dense_1 = nn.Dense(4 * self.time_embedding_dim,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.temb_proj = nn.Dense(self.dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        from ..modules.conditioners import ConditioningProvider
        self.condition_provider = ConditioningProvider(self.conditioners)

    def _get_timestep_embedding(self, timesteps: jax.Array,
                                embedding_dim: int) -> jax.Array:
        """DDPM sinusoidal time embedding (`flow_matching.py:209-229`)."""
        assert timesteps.ndim == 1
        half_dim = embedding_dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
        if embedding_dim % 2 == 1:
            emb = jnp.pad(emb, ((0, 0), (0, 1)))
        return emb

    def _embed_time_parameter(self, t: jax.Array) -> jax.Array:
        """`flow_matching.py:231-242`."""
        temb = self._get_timestep_embedding(t.reshape(-1),
                                            self.time_embedding_dim)
        temb = self.temb_dense_0(temb)
        temb = temb * jax.nn.sigmoid(temb)  # swish
        return self.temb_dense_1(temb)

    def compute_conditions(self, tokenized: tp.Dict[str, tp.Any]
                           ) -> ConditionTensors:
        return self.condition_provider(tokenized)

    def _align_seq_length(self, cond: jax.Array, seq_len: int) -> jax.Array:
        """Trim/pad a temporal condition to seq_len (`flow_matching.py:290-300`)."""
        cond = cond[:, :seq_len, :]
        B, T, C = cond.shape
        if T < seq_len:
            cond = jnp.concatenate(
                [cond, jnp.zeros((B, seq_len - T, C), cond.dtype)], axis=1)
        return cond

    def __call__(self, latents: jax.Array, t: jax.Array,
                 condition_tensors: ConditionTensors,
                 deterministic: bool = True) -> jax.Array:
        """latents [B, T, D], t [B] or scalar -> vector field [B, T, D]
        (`flow_matching.py:302-343`)."""
        B, T, D = latents.shape
        x = latents.astype(self.dtype)

        # concat temporal conditions on the feature dim (`flow_matching.py:314-320`)
        for cond in JASCO_TEMPORAL_CONDS:
            if cond not in condition_tensors:
                continue
            c = self._align_seq_length(
                condition_tensors[cond][0].astype(self.dtype), T)
            x = jnp.concatenate([x, c], axis=-1)

        input_ = self.emb(x)
        # the fuser config lists temporal conds under 'ignore' (JASCO configs)
        input_, cross_attention_input = self.fuser(input_, condition_tensors)

        if jnp.ndim(t) == 0:
            t = jnp.full((B,), t)
        t_embs = self._embed_time_parameter(t)
        cross_attention_input = (cross_attention_input
                                 + self.temb_proj(t_embs)[:, None, :])

        out, _ = self.transformer(input_,
                                  cross_attention_src=cross_attention_input,
                                  deterministic=deterministic)
        if self.norm_first:
            out = self.out_norm(out)
        v_theta = self.linear(out)
        if len(self.fuser.fuse2cond.get("prepend", [])) > 0:
            v_theta = v_theta[:, -T:]
        return v_theta

    def init_all(self, latents, t, tokenized):
        condition_tensors = self.compute_conditions(tokenized)
        return self(latents, t, condition_tensors)


# --------------------------------------------------------------- generation

def multi_source_cfg_preprocess(model: FlowMatchingModel, params,
                                tokenize_fn,
                                conditions: tp.List[ConditioningAttributes],
                                cfg_coef_all: float, cfg_coef_txt: float,
                                att_dropout: tp.Optional[AttributeDropout] = None,
                                min_weight: float = 1e-6):
    """Build stacked CFG condition tensors (`flow_matching.py:345-385`)."""
    cfg_terms: tp.List[CFGTerm] = []
    condition_tensors: ConditionTensors = {}
    if conditions:
        cfg_terms = [AllCFGTerm(conditions=conditions, weight=cfg_coef_all),
                     TextCFGTerm(conditions=conditions, weight=cfg_coef_txt,
                                 model_att_dropout=att_dropout
                                 or AttributeDropout({}))]
        cfg_terms.append(NullCFGTerm(
            conditions=conditions,
            weight=1 - sum(ct.weight for ct in cfg_terms)))
        cfg_terms = [ct for ct in cfg_terms if abs(ct.weight) >= min_weight]
        conds = sum([ct.conditions for ct in cfg_terms], [])
        tokenized = tokenize_fn(conds)
        condition_tensors = model.apply(
            params, tokenized, method=FlowMatchingModel.compute_conditions)
    return condition_tensors, cfg_terms


def generate(model: FlowMatchingModel, params, rng: jax.Array,
             tokenize_fn,
             conditions: tp.List[ConditioningAttributes] = [],
             num_samples: tp.Optional[int] = None,
             max_gen_len: int = 256,
             cfg_coef_all: float = 3.0,
             cfg_coef_txt: float = 1.0,
             euler: bool = False,
             euler_steps: int = 100,
             ode_rtol: float = 1e-5,
             ode_atol: float = 1e-5,
             att_dropout: tp.Optional[AttributeDropout] = None) -> jax.Array:
    """Flow-matching generation (`flow_matching.py:419-516`)."""
    possible = []
    if num_samples is not None:
        possible.append(num_samples)
    elif conditions:
        possible.append(len(conditions))
    else:
        possible.append(1)
    num_samples = possible[0]

    condition_tensors, cfg_terms = multi_source_cfg_preprocess(
        model, params, tokenize_fn, conditions, cfg_coef_all, cfg_coef_txt,
        att_dropout)

    B, T, D = num_samples, max_gen_len, model.flow_dim
    z_0 = jax.random.normal(rng, (B, T, D))
    n_terms = max(len(cfg_terms), 1)
    weights = jnp.asarray([ct.weight for ct in cfg_terms]) if cfg_terms else None

    def vector_field(z, t):
        if n_terms > 1:
            z_in = jnp.concatenate([z] * n_terms, axis=0)
        else:
            z_in = z
        v = model.apply(params, z_in, t, condition_tensors)
        if n_terms > 1:
            vs = jnp.stack(jnp.split(v, n_terms, axis=0))  # [n, B, T, D]
            v = jnp.sum(weights[:, None, None, None] * vs, axis=0)
        return v

    if euler:
        dt = 1.0 / euler_steps

        def step(z, i):
            t = i.astype(jnp.float32) * dt
            return z + dt * vector_field(z, t), None

        z_1, _ = jax.lax.scan(step, z_0, jnp.arange(euler_steps))
        return z_1
    else:
        from jax.experimental.ode import odeint
        ts = jnp.asarray([0.0, 1.0 - 1e-5])
        zs = odeint(lambda z, t: vector_field(z, t), z_0, ts,
                    rtol=ode_rtol, atol=ode_atol)
        return zs[-1]
