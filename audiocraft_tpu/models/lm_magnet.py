"""MAGNeT: non-autoregressive masked-token LM over RVQ streams.

Parity: `audiocraft/models/lm_magnet.py:26-500` — per-stage restricted
self-attention for codebooks > 0, iterative masked decoding per RVQ level
(default 20/10/10/10 steps) with cosine mask schedule, span masking
(non-overlapping chunks or stride-1 least-probable spans), span scoring
max/prod, and annealed CFG (max->min) + temperature.

TPU notes: the mask schedule is static per decoding step, so each
(stage, step) becomes one compiled program with a static top-k; the reference
xformers align-8 mask padding (`lm_magnet.py:91-98`) is a CUDA artifact and is
dropped — mask semantics are preserved exactly.
"""
import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..modules.conditioners import (ClassifierFreeGuidanceDropout,
                                    ConditioningAttributes)
from ..utils.utils import sample_tokens
from .lm import ConditionTensors, LMModel, prepare_cfg_conditions

DONT_REMASK_ME_SCORE = -1e4


class MagnetLMModel(LMModel):
    """LMModel operating non-autoregressively (`lm_magnet.py:26-115`)."""
    subcodes_context: int = 5
    compression_model_framerate: int = 50
    segment_duration: int = 10
    span_len: int = 3

    def restricted_context_attn_bias(self, seq_len: int) -> np.ndarray:
        """Local (non-causal) attention bias [T, T] for codebooks > 0
        (`lm_magnet.py:48-70`)."""
        pos = np.arange(seq_len)
        delta = pos[:, None] - pos[None, :]
        valid = np.abs(delta) <= self.subcodes_context
        return np.where(valid, 0.0, float(np.finfo(np.float32).min)).astype(np.float32)

    def stage_attn_bias(self, stage: int, seq_len: int) -> tp.Optional[np.ndarray]:
        """Per-stage mask (`lm_magnet.py:71-99`); None = unrestricted."""
        if stage > 0 and self.subcodes_context > -1:
            return self.restricted_context_attn_bias(seq_len)
        return None


def _construct_spans_mask(span_starts: np.ndarray, T: int, span_len: int) -> np.ndarray:
    """[T] bool mask of overlapping spans (`lm_magnet.py:443-461`)."""
    mask = np.zeros(T, dtype=bool)
    mask[span_starts] = True
    shifted = mask.copy()
    for _ in range(span_len - 1):
        shifted = np.concatenate(([False], shifted[:-1]))
        mask = mask | shifted
    return mask


def least_probable_span_masking(scores: np.ndarray, num_masked_trg: int,
                                span_len: int) -> np.ndarray:
    """Binary-search the number of stride-1 spans whose total masked-token
    count best matches the target (`lm_magnet.py:463-500`). scores: [T]."""
    T = scores.shape[-1]
    windows = np.lib.stride_tricks.sliding_window_view(scores, span_len)
    span_scores = windows.sum(axis=-1)
    spans_by_scores = np.argsort(-span_scores)

    num_masked_trg = max(num_masked_trg, span_len)
    min_u = num_masked_trg // span_len
    max_u = num_masked_trg - span_len + 1
    mid = round(0.5 * (min_u + max_u))
    if mid == min_u or mid == max_u:
        return _construct_spans_mask(spans_by_scores[:mid], T, span_len)
    while min_u < mid < max_u:
        mask = _construct_spans_mask(spans_by_scores[:mid], T, span_len)
        n_masked = mask.sum()
        if n_masked > num_masked_trg:
            max_u = mid
        else:
            min_u = mid
        mid = round(0.5 * (min_u + max_u))
    return mask


_MAGNET_JIT_CACHE: tp.Dict[tp.Any, tp.Any] = {}


def _magnet_stage_scan(model: MagnetLMModel, stage: int, T: int, B: int,
                       has_cfg: bool, use_sampling: bool, top_k: int,
                       top_p: float, chunk_masking: bool, span_scoring: str,
                       prompt_length: int, n_steps: int, cond_struct):
    """One compiled `lax.scan` over a stage's decoding steps.

    The reference (and our former implementation) runs each step as its own
    device program with host-side masking between steps; on the tunnel-
    attached TPU the per-step host round-trips and the per-(cfg, temp)
    recompiles dominate. Here masking, sampling and span scoring are all
    traced, with the per-step quantities (num_masked, cfg coef, temperature)
    passed as scan inputs, so a whole stage is one XLA program and tokens
    never leave HBM. Exact same schedule semantics (`lm_magnet.py:151-441`).
    """
    key = ("scan", id(model), stage, T, B, has_cfg, use_sampling, top_k,
           top_p, chunk_masking, span_scoring, prompt_length, n_steps,
           cond_struct)
    if key in _MAGNET_JIT_CACHE:
        return _MAGNET_JIT_CACHE[key]
    attn_bias = model.stage_attn_bias(stage, T)
    bias_const = None if attn_bias is None else jnp.asarray(attn_bias)
    mask_id = model.special_token_id
    span = model.span_len if chunk_masking else 1
    n_scored = T // span  # chunks (nonoverlap) or tokens (span 1)

    def run(params, gen_sequence, scores0, condition_tensors, prompt, rng,
            num_masked, cfg_coefs, temps):
        stage_gen_seq0 = jnp.full((B, T), mask_id, jnp.int32)

        def step(carry, xs):
            gen_sequence, stage_gen_seq, scores, rng = carry
            n_mask, cfg_coef, t = xs
            # --- mask selection: top-num_masked scores ---------------------
            order = jnp.argsort(-scores, axis=-1)              # [B, n]
            rank_mask = jnp.arange(n_scored)[None, :] < n_mask  # [1, n]
            sel = jnp.zeros((B, n_scored), bool)
            sel = sel.at[jnp.arange(B)[:, None], order].set(
                jnp.broadcast_to(rank_mask, (B, n_scored)))
            tok_mask = (jnp.repeat(sel, span, axis=-1) if span > 1 else sel)
            stage_gen_seq = jnp.where(tok_mask, mask_id, stage_gen_seq)
            if prompt_length > 0:
                stage_gen_seq = stage_gen_seq.at[:, :prompt_length].set(
                    prompt[:, stage, :prompt_length])
            gen_sequence = gen_sequence.at[:, stage, :].set(stage_gen_seq)

            # --- forward + CFG + sample ------------------------------------
            seq = (jnp.concatenate([gen_sequence] * 2, axis=0) if has_cfg
                   else gen_sequence)
            all_logits, _ = model.apply(params, seq, condition_tensors,
                                        attn_bias=bias_const)
            if has_cfg:
                cond_l, uncond_l = all_logits[:B], all_logits[B:]
                logits = uncond_l + (cond_l - uncond_l) * cfg_coef
            else:
                logits = all_logits
            logits = logits[:, stage]                           # [B, T, card]
            probs = jax.nn.softmax(
                logits.astype(jnp.float32) / jnp.maximum(t, 1e-2), axis=-1)
            rng, r = jax.random.split(rng)
            if use_sampling:
                if top_p > 0.0:
                    from ..utils.utils import sample_top_p
                    sampled = sample_top_p(r, probs, p=top_p)
                elif top_k > 0:
                    from ..utils.utils import sample_top_k
                    sampled = sample_top_k(r, probs, k=top_k)
                else:
                    from ..utils.utils import multinomial
                    sampled = multinomial(r, probs)
            else:
                sampled = jnp.argmax(logits, axis=-1)[..., None]
            sampled_probs = jnp.take_along_axis(probs, sampled,
                                                axis=-1)[..., 0]
            sampled = sampled[..., 0]                           # [B, T]

            mask_tok = stage_gen_seq == mask_id
            stage_gen_seq = jnp.where(mask_tok, sampled, stage_gen_seq)
            gen_sequence = gen_sequence.at[:, stage, :].set(stage_gen_seq)

            # --- span scoring (`lm_magnet.py:414-436`) ---------------------
            if chunk_masking:
                if span_scoring == "max":
                    new_scores = 1.0 - sampled_probs.reshape(
                        B, n_scored, span).max(axis=-1)
                else:  # prod
                    new_scores = (-jnp.log(jnp.maximum(sampled_probs, 1e-20))
                                  ).reshape(B, n_scored, span).sum(axis=-1)
                new_scores = jnp.where(~sel, DONT_REMASK_ME_SCORE, new_scores)
            else:
                new_scores = -jnp.log(jnp.maximum(sampled_probs, 1e-20))
                new_scores = jnp.where(~mask_tok, DONT_REMASK_ME_SCORE,
                                       new_scores)
            return (gen_sequence, stage_gen_seq, new_scores, rng), None

        (gen_sequence, _, _, _), _ = jax.lax.scan(
            step, (gen_sequence, stage_gen_seq0, scores0, rng),
            (num_masked, cfg_coefs, temps))
        return gen_sequence

    fn = jax.jit(run)
    _MAGNET_JIT_CACHE[key] = fn
    return fn


def _magnet_fwd_sample(model: MagnetLMModel, stage: int, T: int, B: int,
                       has_cfg: bool, cfg_coef: float, t: float,
                       use_sampling: bool, top_k: int, top_p: float,
                       cond_struct):
    """Jitted (per static config): forward at `stage` + sample + token probs."""
    key = (id(model), stage, T, B, has_cfg, cfg_coef, t, use_sampling,
           top_k, top_p, cond_struct)
    if key in _MAGNET_JIT_CACHE:
        return _MAGNET_JIT_CACHE[key]
    attn_bias = model.stage_attn_bias(stage, T)
    bias_const = None if attn_bias is None else jnp.asarray(attn_bias)

    def run(params, gen_sequence, condition_tensors, rng):
        seq = (jnp.concatenate([gen_sequence] * 2, axis=0) if has_cfg
               else gen_sequence)
        all_logits, _ = model.apply(params, seq, condition_tensors,
                                    attn_bias=bias_const)
        if has_cfg:
            cond_logits, uncond_logits = all_logits[:B], all_logits[B:]
            logits = uncond_logits + (cond_logits - uncond_logits) * cfg_coef
        else:
            logits = all_logits
        logits = logits[:, stage]  # [B, T, card]
        probs = jax.nn.softmax(logits.astype(jnp.float32) / max(t, 1e-2), axis=-1)
        if use_sampling:
            if top_p > 0.0:
                from ..utils.utils import sample_top_p
                sampled = sample_top_p(rng, probs, p=top_p)
            elif top_k > 0:
                from ..utils.utils import sample_top_k
                sampled = sample_top_k(rng, probs, k=top_k)
            else:
                from ..utils.utils import multinomial
                sampled = multinomial(rng, probs)
        else:
            sampled = jnp.argmax(logits, axis=-1)[..., None]
        sampled_probs = jnp.take_along_axis(probs, sampled, axis=-1)[..., 0]
        return sampled[..., 0], sampled_probs  # [B, T], [B, T]

    fn = jax.jit(run)
    _MAGNET_JIT_CACHE[key] = fn
    return fn


def generate_magnet(model: MagnetLMModel, params, rng: jax.Array,
                    prompt: tp.Optional[jax.Array] = None,
                    conditions: tp.List[ConditioningAttributes] = [],
                    condition_tensors: tp.Optional[ConditionTensors] = None,
                    num_samples: tp.Optional[int] = None,
                    max_gen_len: int = 256,
                    use_sampling: bool = True,
                    temp: float = 3.0,
                    top_k: int = 0,
                    top_p: float = 0.9,
                    max_cfg_coef: float = 10.0,
                    min_cfg_coef: float = 1.0,
                    decoding_steps: tp.Sequence[int] = (20, 10, 10, 10),
                    anneal_temp: bool = True,
                    span_scoring: str = "max",
                    span_arrangement: str = "nonoverlap",
                    callback: tp.Optional[tp.Callable[[int, int], None]] = None
                    ) -> jax.Array:
    """MAGNeT iterative decoding over all RVQ levels
    (`lm_magnet.py:151-441`). Returns codes [B, K, max_gen_len]."""
    possible_num_samples = []
    if num_samples is not None:
        possible_num_samples.append(num_samples)
    elif prompt is not None:
        possible_num_samples.append(prompt.shape[0])
    elif conditions:
        possible_num_samples.append(len(conditions))
    else:
        possible_num_samples.append(1)
    num_samples = possible_num_samples[0]

    if condition_tensors is None:
        condition_tensors = prepare_cfg_conditions(model, params, conditions)
    has_cfg = bool(condition_tensors)
    cond_struct = tuple(sorted(
        (k, tuple(v[0].shape)) for k, v in condition_tensors.items()))

    K = model.num_codebooks
    if prompt is None:
        prompt = jnp.zeros((num_samples, K, 0), jnp.int32)
    B, K, prompt_length = prompt.shape
    assert prompt_length < max_gen_len
    mask_id = model.special_token_id

    gen_sequence = np.full((B, K, max_gen_len), mask_id, dtype=np.int32)
    gen_sequence[..., :prompt_length] = np.asarray(prompt)
    prompt_np = np.asarray(prompt)

    T = max_gen_len
    chunk_masking = model.span_len > 1 and span_arrangement == "nonoverlap"
    lps_masking = span_arrangement == "stride1" and model.span_len > 1
    assert span_arrangement in ("nonoverlap", "stride1")

    if chunk_masking:
        n_chunks = T // model.span_len
        if T % model.span_len != 0:
            T = model.span_len * n_chunks
            gen_sequence = gen_sequence[..., :T]

    curr_step = 0
    total_steps = sum(decoding_steps)
    gen_seq_dev = jnp.asarray(gen_sequence)

    if not lps_masking:
        # fast path: each stage runs as ONE compiled lax.scan (device-side
        # masking/sampling/scoring); the stride-1 least-probable-span policy
        # keeps the host loop below (data-dependent binary search)
        prompt_dev = jnp.asarray(prompt_np) if prompt_length > 0 else \
            jnp.zeros((B, K, 1), jnp.int32)
        for stage, n_steps in zip(range(model.n_q), decoding_steps):
            span = model.span_len if chunk_masking else 1
            n_scored = T // span
            n_prompt_scored = prompt_length // span
            num_to_gen = n_scored - n_prompt_scored
            scores0 = jnp.asarray(np.concatenate([
                np.full((B, n_prompt_scored), DONT_REMASK_ME_SCORE,
                        np.float32),
                np.zeros((B, n_scored - n_prompt_scored), np.float32)],
                axis=1))
            timesteps = np.linspace(0, 1, n_steps)
            mask_ps = np.cos(timesteps * np.pi * 0.5)
            num_masked = np.maximum((mask_ps * num_to_gen).astype(np.int32),
                                    1)
            cfg_coefs = (mask_ps * max_cfg_coef
                         + (1 - mask_ps) * min_cfg_coef).astype(np.float32)
            steps_left = np.arange(n_steps - 1, -1, -1)
            temps = (temp * steps_left / n_steps if anneal_temp
                     else np.full(n_steps, temp)).astype(np.float32)
            fwd = _magnet_stage_scan(
                model, stage, T, B, has_cfg, use_sampling, top_k, top_p,
                chunk_masking, span_scoring, prompt_length, n_steps,
                cond_struct)
            rng, r = jax.random.split(rng)
            gen_seq_dev = fwd(params, gen_seq_dev, scores0,
                              condition_tensors, prompt_dev, r,
                              jnp.asarray(num_masked),
                              jnp.asarray(cfg_coefs), jnp.asarray(temps))
            if callback is not None:
                curr_step += n_steps
                callback(curr_step, total_steps)
        return gen_seq_dev

    for stage, n_steps in zip(range(model.n_q), decoding_steps):
        stage_gen_seq = np.full((B, T), mask_id, dtype=np.int32)

        if chunk_masking:
            n_prompt_chunks = prompt_length // model.span_len
            scores = np.zeros((B, n_chunks), np.float32)
            scores[:, :n_prompt_chunks] = DONT_REMASK_ME_SCORE
            num_to_gen = n_chunks - n_prompt_chunks
        else:
            scores = np.zeros((B, T), np.float32)
            scores[:, :prompt_length] = DONT_REMASK_ME_SCORE
            num_to_gen = T - prompt_length

        timesteps = np.linspace(0, 1, n_steps)
        for step_idx, (timestep, steps_left) in enumerate(
                zip(timesteps, reversed(range(n_steps)))):
            mask_p = math.cos(timestep * math.pi * 0.5)
            num_masked = max(int(mask_p * num_to_gen), 1)

            # --- masking (host: data-dependent index logic) ----------------
            if lps_masking:
                # scores are -log(p): higher = less probable = mask first
                mask = np.stack([least_probable_span_masking(
                    scores[i], num_masked, model.span_len) for i in range(B)])
                stage_gen_seq[mask] = mask_id
            elif chunk_masking:
                masked = np.argsort(-scores, axis=-1)[:, :num_masked]  # top-k
                chunks_mask = np.zeros((B, n_chunks), bool)
                np.put_along_axis(chunks_mask, masked, True, axis=-1)
                mask = np.repeat(chunks_mask, model.span_len, axis=-1)
                stage_gen_seq[mask] = mask_id
            else:
                masked = np.argsort(-scores, axis=-1)[:, :num_masked]
                np.put_along_axis(stage_gen_seq, masked, mask_id, axis=-1)
                mask = stage_gen_seq == mask_id

            if prompt_length > 0:
                stage_gen_seq[:, :prompt_length] = prompt_np[:, stage, :prompt_length]

            gen_sequence[:, stage, :] = stage_gen_seq
            gen_seq_dev = jnp.asarray(gen_sequence)

            # --- forward + sample (device, one compiled program) ------------
            cfg_coef = float(mask_p) * max_cfg_coef + (1 - float(mask_p)) * min_cfg_coef
            t = temp * (steps_left / n_steps) if anneal_temp else temp
            rng, r = jax.random.split(rng)
            fwd = _magnet_fwd_sample(model, stage, T, B, has_cfg,
                                     round(cfg_coef, 6), round(t, 6),
                                     use_sampling, top_k, top_p, cond_struct)
            sampled, sampled_probs = fwd(params, gen_seq_dev,
                                         condition_tensors, r)
            sampled = np.asarray(sampled)
            sampled_probs = np.asarray(sampled_probs)

            # keep sampled tokens only at masked positions
            mask_tok = stage_gen_seq == mask_id
            stage_gen_seq = np.where(mask_tok, sampled, stage_gen_seq)
            gen_sequence[:, stage, :] = stage_gen_seq

            # --- span scoring (`lm_magnet.py:414-436`) ----------------------
            if chunk_masking:
                if span_scoring == "max":
                    scores = 1 - sampled_probs.reshape(B, n_chunks, -1).max(axis=-1)
                elif span_scoring == "prod":
                    scores = (-np.log(np.maximum(sampled_probs, 1e-20))
                              ).reshape(B, n_chunks, -1).sum(axis=-1)
                else:
                    raise NotImplementedError
                scores = np.where(~chunks_mask, DONT_REMASK_ME_SCORE, scores)
            else:
                scores = -np.log(np.maximum(sampled_probs, 1e-20))
                scores = np.where(~mask_tok, DONT_REMASK_ME_SCORE, scores)

            if callback is not None:
                curr_step += 1
                callback(curr_step, total_steps)

    return jnp.asarray(gen_sequence)
