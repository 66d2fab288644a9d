"""MAGNeT training: masked-LM CE on one random RVQ stage per step.

Parity: `audiocraft/solvers/magnet.py:21-276` — uniform random stage, cosine
mask-rate, span-mask LUT from the binomial expression, CE only on masked
positions of the chosen stage with all later codebooks fully masked.

TPU note: the stage index and the mask are computed host-side per step (one
int + one [B, T] bool) so the jitted step stays static; the per-stage
attention bias is baked per stage (n_q compiled variants).
"""
import math
import random
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .musicgen import (MusicGenSolver, TrainState, _with_trainable,
                       apply_condition_dropout, mask_padding,
                       trainable_params)


def calc_mean_maskrate_to_u_LUT(T: int, L: int) -> np.ndarray:
    """LUT mapping mask-% (0..100) -> number of span starts u
    (`magnet.py:53-86`, overflow-safe choose(T-L,u)/choose(T,u))."""
    u2mean = [0.0]
    v = (T - L) / float(T)
    for u in range(1, T):
        u2mean.append(1 - v)
        v *= (T - L - u) / (T - u)
    mean2u = []
    for maskperc in range(101):
        maskrate = maskperc / float(100)
        u = int(np.searchsorted(u2mean, maskrate))
        mean2u.append(u)
    return np.array(mean2u)


def non_spans_mask(rng: np.random.RandomState, mask_probs: np.ndarray,
                   B: int, T: int) -> np.ndarray:
    """Singleton-token random mask (`magnet.py:88-101`)."""
    num_token_masked = np.clip(np.round(T * mask_probs), 1, None)
    batch_randperm = rng.rand(B, T).argsort(axis=-1)
    return batch_randperm < num_token_masked[:, None]


def spans_mask(rng: np.random.RandomState, mask_probs: np.ndarray,
               B: int, T: int, span_len: int, lut: np.ndarray) -> np.ndarray:
    """Random span mask with LUT-corrected rate (`magnet.py:103-124`)."""
    rounded_probs = np.round(100 * mask_probs).astype(np.int64)
    k = np.clip(lut[rounded_probs], 1, None)
    batch_randperm = rng.rand(B, T).argsort(axis=-1)
    mask = batch_randperm < k[:, None]
    shifted = mask.copy()
    for _ in range(span_len - 1):
        shifted = np.concatenate(
            [np.zeros((B, 1), bool), shifted[:, :-1]], axis=1)
        mask = mask | shifted
    return mask


class MagnetSolver(MusicGenSolver):
    """`magnet.py:21-276`."""
    DATASET_TYPE = "music"

    def __init__(self, cfg: dict):
        super().__init__(cfg)
        masking = cfg.get("masking", {})
        self.span_len = masking.get("span_len", 3)
        seq_len = int(cfg.get("dataset", {}).get("segment_duration", 10)
                      * self.compression_model.frame_rate)
        self.mean_maskrate_to_u = calc_mean_maskrate_to_u_LUT(seq_len, self.span_len) \
            if self.span_len > 1 else None
        self._mask_rng = np.random.RandomState(cfg.get("seed", 2036))
        self._magnet_steps: tp.Dict[int, tp.Any] = {}

    def _get_mask(self, mask_probs: np.ndarray, B: int, T: int) -> np.ndarray:
        """`magnet.py:126-141`."""
        if self.span_len <= 1:
            return non_spans_mask(self._mask_rng, mask_probs, B, T)
        lut = self.mean_maskrate_to_u
        if lut is None or T != len(calc_mean_maskrate_to_u_LUT(T, self.span_len)):
            lut = calc_mean_maskrate_to_u_LUT(T, self.span_len)
        return spans_mask(self._mask_rng, mask_probs, B, T, self.span_len, lut)

    def _get_magnet_step(self, stage: int, T: int):
        """Jitted per-stage step with the stage attention bias baked in."""
        if stage in self._magnet_steps:
            return self._magnet_steps[stage]
        model = self.model
        optimizer = self.optimizer
        # bias must span the interleaved sequence (T + leading special step)
        pattern = model.pattern_provider.get_pattern(T)
        S = len(pattern.valid_layout)
        attn_bias = model.stage_attn_bias(stage, S)
        bias_const = None if attn_bias is None else jnp.asarray(attn_bias)

        def loss_fn(params, input_tokens, targets, loss_mask, tokenized):
            from ..models.lm import LMModel
            condition_tensors = model.apply(params, tokenized,
                                            method=LMModel.compute_conditions)
            out = model.apply(params, input_tokens, condition_tensors,
                              method=LMModel.compute_predictions,
                              attn_bias=bias_const)
            # CE only on the chosen stage's masked positions (`magnet.py:143-171`)
            logits_k = out.logits[:, stage]      # [B, T, card]
            targets_k = targets[:, stage]
            mask_k = loss_mask[:, stage].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits_k.astype(jnp.float32), axis=-1)
            ce_all = -jnp.take_along_axis(logp, targets_k[..., None], -1)[..., 0]
            ce_sel = jnp.where(mask_k.astype(bool), ce_all, 0.0)
            ce = jnp.sum(ce_sel) / jnp.maximum(jnp.sum(mask_k), 1.0)
            return ce

        def step(state, input_tokens, targets, loss_mask, tokenized):
            # differentiate only the flax "params" collection so the grad
            # tree matches the optimizer state (init_train_state inits the
            # moments on trainable_params; aux collections ride along)
            variables = state.params
            trainable = trainable_params(variables)

            def wrapped(tr, *args):
                return loss_fn(_with_trainable(variables, tr), *args)

            ce, grads = jax.value_and_grad(wrapped)(
                trainable, input_tokens, targets, loss_mask, tokenized)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            return TrainState(step=state.step + 1,
                              params=_with_trainable(variables, new_trainable),
                              opt_state=new_opt), {"ce": ce, "ppl": jnp.exp(ce)}

        fn = jax.jit(step, donate_argnums=(0,))
        self._magnet_steps[stage] = fn
        return fn

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        """`magnet.py:173-216`."""
        codes, tokenized, padding_mask = self._prepare_tokens_and_attributes(batch)
        audio_tokens = np.asarray(codes)
        B, K, T = audio_tokens.shape
        stage = random.randint(0, K - 1)

        rand_time = self._mask_rng.uniform(0, 1, size=(B,))
        rand_mask_probs = np.cos(rand_time * math.pi * 0.5)
        stage_mask = self._get_mask(rand_mask_probs, B, T)  # [B, T]

        mask = np.zeros((B, K, T), bool)
        mask[:, stage, :] = stage_mask
        mask[:, stage + 1:, :] = True  # mask all later codebooks
        mask_id = self.model.special_token_id
        input_tokens = np.where(mask, mask_id, audio_tokens)

        loss_mask = np.zeros((B, K, T), bool)
        loss_mask[:, stage, :] = stage_mask
        loss_mask &= np.asarray(padding_mask)[:, None, :].astype(bool)

        step = self._get_magnet_step(stage, T)
        self.state, m = step(self.state, jnp.asarray(input_tokens),
                             jnp.asarray(audio_tokens),
                             jnp.asarray(loss_mask), tokenized)
        metrics.update(m)
        return metrics


    def evaluate(self) -> dict:
        """Masked-CE eval averaged over all RVQ stages (`magnet.py:218-268`)
        with a deterministic mask per batch — the AR eval of the parent does
        not apply to the non-causal masked objective."""
        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}
        if not hasattr(self, "_magnet_eval_steps"):
            self._magnet_eval_steps: tp.Dict[tp.Tuple[int, int], tp.Any] = {}
        model = self.model

        def get_eval_step(stage: int, T: int):
            key = (stage, T)
            if key in self._magnet_eval_steps:
                return self._magnet_eval_steps[key]
            pattern = model.pattern_provider.get_pattern(T)
            S = len(pattern.valid_layout)
            attn_bias = model.stage_attn_bias(stage, S)
            bias_const = None if attn_bias is None else jnp.asarray(attn_bias)

            def eval_step(params, input_tokens, targets, loss_mask, tokenized):
                from ..models.lm import LMModel
                condition_tensors = model.apply(
                    params, tokenized, method=LMModel.compute_conditions)
                out = model.apply(params, input_tokens, condition_tensors,
                                  method=LMModel.compute_predictions,
                                  attn_bias=bias_const)
                logits_k = out.logits[:, stage]
                targets_k = targets[:, stage]
                mask_k = loss_mask[:, stage].astype(jnp.float32)
                logp = jax.nn.log_softmax(logits_k.astype(jnp.float32), -1)
                ce_all = -jnp.take_along_axis(
                    logp, targets_k[..., None], -1)[..., 0]
                ce_sel = jnp.where(mask_k.astype(bool), ce_all, 0.0)
                return jnp.sum(ce_sel) / jnp.maximum(jnp.sum(mask_k), 1.0)

            fn = jax.jit(eval_step)
            self._magnet_eval_steps[key] = fn
            return fn

        rng = np.random.RandomState(self.cfg.get("seed", 2036))
        ce_sum, n = 0.0, 0
        for batch in loader:
            codes, tokenized, padding_mask = \
                self._prepare_tokens_and_attributes(batch, training=False)
            audio_tokens = np.asarray(codes)
            B, K, T = audio_tokens.shape
            for stage in range(K):
                probs = np.cos(rng.uniform(0, 1, size=(B,)) * math.pi * 0.5)
                stage_mask = self._get_mask(probs, B, T)
                mask = np.zeros((B, K, T), bool)
                mask[:, stage, :] = stage_mask
                mask[:, stage + 1:, :] = True
                input_tokens = np.where(mask, self.model.special_token_id,
                                        audio_tokens)
                loss_mask = np.zeros((B, K, T), bool)
                loss_mask[:, stage, :] = stage_mask
                loss_mask &= np.asarray(padding_mask)[:, None, :].astype(bool)
                ce = get_eval_step(stage, T)(
                    self.state.params, jnp.asarray(input_tokens),
                    jnp.asarray(audio_tokens), jnp.asarray(loss_mask),
                    tokenized)
                ce_sum += float(np.asarray(ce))
                n += 1
        ce = ce_sum / max(n, 1)
        from ..parallel import distrib
        # average ce across hosts first, then derive ppl: the arithmetic
        # mean of per-host exp(ce) would disagree with exp(mean ce)
        metrics = distrib.average_metrics({"ce": ce}, n)
        if "ce" in metrics:
            metrics["ppl"] = float(np.exp(metrics["ce"]))
        return metrics


class AudioMagnetSolver(MagnetSolver):
    """Sound-dataset MAGNeT (`magnet.py:271-276`)."""
    DATASET_TYPE = "sound"
