"""MusicGen LM training: cross-entropy over the delay pattern, sharded with
pjit (dp + fsdp + tp).

Parity: `audiocraft/solvers/musicgen.py:32-749` — delay-pattern CE per
codebook over valid positions, condition dropout, padding -> special-token
masking. The distributed story is GSPMD: gradients sync implicitly through
sharded params; the reference's fsdp/eager-sync/scaler branches
(`musicgen.py:394-434`) collapse into one jitted step.
"""
import dataclasses
import logging
import typing as tp
from pathlib import Path
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lm import LMModel
from ..modules.conditioners import (AttributeDropout,
                                    ClassifierFreeGuidanceDropout,
                                    ConditioningAttributes)
from ..parallel.mesh import batch_sharding, constrain_batch, replicated
from ..parallel.sharding import infer_shardings

logger = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any


def compute_cross_entropy(logits: jax.Array, targets: jax.Array,
                          mask: jax.Array
                          ) -> tp.Tuple[jax.Array, jax.Array]:
    """CE over valid positions, per codebook (`solvers/musicgen.py:219-251`).

    logits [B, K, T, card], targets [B, K, T], mask [B, K, T].
    Returns (mean over codebooks, per-codebook CE [K]).
    """
    B, K, T = targets.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce_all = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # select-then-sum (jnp.where, not multiply): ce_all can be non-finite at
    # masked positions and NaN * 0 == NaN would poison forward AND grads
    ce_sel = jnp.where(mask.astype(bool), ce_all, 0.0)
    mask = mask.astype(jnp.float32)
    ce_per_codebook = (jnp.sum(ce_sel, axis=(0, 2))
                       / jnp.maximum(jnp.sum(mask, axis=(0, 2)), 1.0))  # [K]
    return jnp.mean(ce_per_codebook), ce_per_codebook


def apply_condition_dropout(attributes: tp.List[ConditioningAttributes],
                            cfg_dropout: tp.Optional[ClassifierFreeGuidanceDropout],
                            att_dropout: tp.Optional[AttributeDropout]
                            ) -> tp.List[ConditioningAttributes]:
    """Host-side CFG + attribute dropout before tokenization (`lm.py:253-255`)."""
    if cfg_dropout is not None:
        attributes = cfg_dropout(attributes)
    if att_dropout is not None:
        attributes = att_dropout(attributes)
    return attributes


def make_optimizer(learning_rate, optimizer: str = "adamw",
                   betas=(0.9, 0.95), weight_decay: float = 0.1,
                   eps: float = 1e-8, max_norm: float = 1.0):
    """AdamW + grad clip, matching `solvers/builders.py:95-139` defaults."""
    chain = []
    if max_norm:
        chain.append(optax.clip_by_global_norm(max_norm))
    if optimizer == "adamw":
        chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                 eps=eps, weight_decay=weight_decay))
    elif optimizer == "adam":
        chain.append(optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
    else:
        raise ValueError(f"Unsupported Optimizer: {optimizer}")
    return optax.chain(*chain)


def make_train_step(model: LMModel, optimizer: optax.GradientTransformation,
                    mesh: tp.Optional[Mesh] = None):
    """Build the jitted, sharded LM training step.

    step(state, codes [B,K,T], tokenized_conds, padding_mask [B,T], rng)
      -> (new_state, metrics)

    Padding positions in codes must already be replaced by the special token
    (`solvers/musicgen.py:333-344` — done host- or device-side by the caller
    via `mask_padding`).
    """

    def loss_fn(variables, codes, tokenized, padding_mask, rng):
        condition_tensors = model.apply(variables, tokenized,
                                        method=LMModel.compute_conditions)
        # pin conditioner activations to batch sharding (see
        # parallel/mesh.py:constrain_batch — kills an SPMD full-remat)
        condition_tensors = constrain_batch(condition_tensors, mesh)
        out = model.apply(variables, codes, condition_tensors,
                          method=LMModel.compute_predictions,
                          rngs={"dropout": rng}, deterministic=False)
        mask = out.mask & (codes != model.special_token_id)
        ce, ce_q = compute_cross_entropy(out.logits, codes, mask)
        return ce, ce_q

    def step(state: TrainState, codes, tokenized, padding_mask, rng):
        variables = state.params
        trainable = trainable_params(variables)

        # differentiate only the flax "params" collection: auxiliary
        # collections (e.g. the RVQ "quantizer" buffers of joint-embed
        # conditioners) carry bool/int leaves and are not optimizer targets
        def wrapped(tr, *args):
            return loss_fn(_with_trainable(variables, tr), *args)

        (ce, ce_q), grads = jax.value_and_grad(wrapped, has_aux=True)(
            trainable, codes, tokenized, padding_mask, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        grad_norm = optax.global_norm(grads)
        metrics = {
            "ce": ce,
            "ppl": jnp.exp(ce),
            "grad_norm": grad_norm,
            **{f"ce_q{k + 1}": ce_q[k] for k in range(model.n_q)},
            **{f"ppl_q{k + 1}": jnp.exp(ce_q[k]) for k in range(model.n_q)},
        }
        return TrainState(step=state.step + 1,
                          params=_with_trainable(variables, new_trainable),
                          opt_state=new_opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    def shard_the_step(state_shardings):
        data = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(state_shardings, data, rep, data, rep),
            out_shardings=(state_shardings, rep),
            donate_argnums=(0,))
    return shard_the_step


def make_eval_step(model: LMModel):
    """Jitted CE/PPL eval step (no dropout, no grads) —
    `solvers/musicgen.py:496-509`."""

    def eval_step(params, codes, tokenized, padding_mask):
        condition_tensors = model.apply(params, tokenized,
                                        method=LMModel.compute_conditions)
        out = model.apply(params, codes, condition_tensors,
                          method=LMModel.compute_predictions)
        mask = out.mask & (codes != model.special_token_id)
        ce, ce_q = compute_cross_entropy(out.logits, codes, mask)
        return {"ce": ce, "ppl": jnp.exp(ce),
                **{f"ce_q{k + 1}": ce_q[k] for k in range(model.n_q)}}

    return jax.jit(eval_step)


def trainable_params(variables):
    """The optimized sub-collection of a flax variables dict: "params" only.
    Auxiliary collections (e.g. the joint-embed RVQ "quantizer" buffers,
    which hold bool/int leaves) ride along in TrainState.params untouched."""
    if isinstance(variables, tp.Mapping) and "params" in variables:
        return variables["params"]
    return variables


def _with_trainable(variables, new_trainable):
    if isinstance(variables, tp.Mapping) and "params" in variables:
        out = dict(variables)
        out["params"] = new_trainable
        return out
    return new_trainable


def init_train_state(model: LMModel, params,
                     optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(trainable_params(params)))


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Shardings pytree mirroring a TrainState: params via the TP/FSDP rules,
    optimizer moments (which mirror the param tree) likewise, scalars
    replicated."""
    param_sh = infer_shardings(state.params, mesh)
    param_treedef = jax.tree_util.tree_structure(state.params)
    # optimizer moments mirror the trainable ("params") subtree only
    trainable_treedef = jax.tree_util.tree_structure(
        trainable_params(state.params))
    trainable_sh = trainable_params(param_sh)
    rep = NamedSharding(mesh, P())

    def rec(node):
        try:
            structure = jax.tree_util.tree_structure(node)
            if structure == param_treedef:
                return param_sh
            if structure == trainable_treedef:
                return trainable_sh
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return type(node)(*[rec(x) for x in node])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(x) for x in node)
        return jax.tree_util.tree_map(lambda _: rep, node)

    return TrainState(step=rep, params=param_sh, opt_state=rec(state.opt_state))


def mask_padding(codes: jax.Array, padding_mask: jax.Array,
                 special_token_id: int) -> jax.Array:
    """Replace padded positions with the special token
    (`solvers/musicgen.py:333-344`). codes [B,K,T], padding_mask [B,T]."""
    return jnp.where(padding_mask[:, None, :].astype(bool), codes,
                     special_token_id)


# ---------------------------------------------------------------- solver

from .base import SolverRunMixin


class MusicGenSolver(SolverRunMixin):
    """MusicGen training solver (`solvers/musicgen.py:32-749`).

    Composes: frozen compression model (encode-only), the LM with
    text conditioners, CE over the delay pattern, CFG/attribute dropout.
    """
    DATASET_TYPE = "music"

    def __init__(self, cfg: dict):
        from .base import StandardSolver
        from . import builders as solver_builders
        self.cfg = cfg
        self._base = None  # lazily share StandardSolver plumbing

        import jax
        from ..models import builders as model_builders
        from ..models.lm import init_lm_params
        from ..modules.conditioners import (AttributeDropout,
                                            ClassifierFreeGuidanceDropout)

        # datasets
        dtype_map = {"music": solver_builders.DatasetType.MUSIC,
                     "sound": solver_builders.DatasetType.SOUND,
                     "audio": solver_builders.DatasetType.AUDIO}
        self.dataloaders = solver_builders.get_audio_datasets(
            cfg, dtype_map[self.DATASET_TYPE]) if cfg.get("datasource") else {}

        # frozen compression model (`musicgen.py:140-160`)
        self.compression_model = None
        self.compression_variables = None
        ckpt = cfg.get("compression_model_checkpoint")
        if ckpt == "debug" or ckpt is None:
            self.compression_model, self.compression_variables = \
                model_builders.get_debug_compression_model(cfg.get("sample_rate", 32000))
        else:
            from .compression import CompressionSolver as CS
            self.compression_model, self.compression_variables = \
                CS.model_from_checkpoint(ckpt)

        # the LM
        if cfg.get("transformer_lm"):
            self.model = model_builders.get_lm_model(cfg)
        elif getattr(self, "DATASET_TYPE", "music") != "music" or \
                type(self).__name__.startswith(("Magnet", "AudioMagnet")):
            self.model, params = model_builders.get_debug_magnet_lm_model()
        else:
            self.model, params = model_builders.get_debug_lm_model()
        rng = jax.random.PRNGKey(cfg.get("seed", 2036))
        params = init_lm_params(self.model, rng)

        cls_free = cfg.get("classifier_free_guidance", {})
        self.cfg_dropout = ClassifierFreeGuidanceDropout(
            p=cls_free.get("training_dropout", 0.0))
        self.att_dropout = AttributeDropout(
            p=cfg.get("attribute_dropout", {}))

        optim_cfg = cfg.get("optim", {})
        total_updates = (optim_cfg.get("epochs", 1)
                         * optim_cfg.get("updates_per_epoch", 2000))
        from . import builders
        # per-module optim groups (`ref transformer.py:715-721` lr/wd
        # overrides flow through make_optim_group into the param groups)
        lm_cfg = cfg.get("transformer_lm", {}) or {}
        overrides = {k: v for k, v in
                     {"lr": lm_cfg.get("lr"),
                      "weight_decay": lm_cfg.get("weight_decay")}.items()
                     if v is not None}
        param_groups = None
        if overrides:
            # labels must span the same tree the optimizer sees: the step
            # differentiates/updates trainable_params(variables), not the
            # full variables dict
            param_groups = builders.get_optim_parameter_groups(
                trainable_params(params), {"transformer": overrides})
        self.optimizer = builders.get_optimizer(optim_cfg, total_updates,
                                                param_groups=param_groups)
        self.state = init_train_state(self.model, params, self.optimizer)
        self._step = make_train_step(self.model, self.optimizer)
        self._rng = jax.random.PRNGKey(cfg.get("seed", 2036))
        self.epoch = 1

        # precomputed EnCodec-token batch cache (`musicgen.py:50-63`):
        # cache.write populates; cache.path without write consumes, skipping
        # the codec encode on the step critical path
        self.cached_batch_writer = None
        self.cached_batch_loader = None
        cache_cfg = cfg.get("cache", {})
        if cache_cfg.get("path"):
            from ..utils.cache import CachedBatchLoader, CachedBatchWriter
            if cache_cfg.get("write"):
                self.cached_batch_writer = CachedBatchWriter(
                    Path(cache_cfg["path"]))
            else:
                self.cached_batch_loader = CachedBatchLoader(
                    Path(cache_cfg["path"]),
                    cfg.get("dataset", {}).get("batch_size", 1),
                    num_workers=cache_cfg.get("num_workers", 4))
                self.dataloaders["original_train"] = \
                    self.dataloaders.get("train")
                self.dataloaders["train"] = self.cached_batch_loader

    def _next_rng(self):
        import jax
        self._rng, r = jax.random.split(self._rng)
        return r

    def _prepare_tokens_and_attributes(self, batch, training: bool = True):
        """wav -> codes; infos -> dropped+tokenized conditions
        (`musicgen.py:259-361`)."""
        import jax.numpy as jnp
        from ..models.lm import tokenize_conditions
        wav, infos = batch
        codes, scale = self.compression_model.encode(
            self.compression_variables, jnp.asarray(wav))
        assert scale is None, "Scaled compression model not supported with LM."
        attributes = [info.to_condition_attributes() for info in infos]
        if training:
            attributes = apply_condition_dropout(attributes, self.cfg_dropout,
                                                 self.att_dropout)
        tokenized = tokenize_conditions(self.model, attributes)
        # padding -> special token (`musicgen.py:333-344`)
        lengths = jnp.asarray(np.array([i.n_frames for i in infos]))
        frame_rate = self.compression_model.frame_rate
        valid_frames = jnp.ceil(lengths / (infos[0].sample_rate / frame_rate))
        T = codes.shape[-1]
        padding_mask = (jnp.arange(T)[None, :] < valid_frames[:, None])
        codes = mask_padding(codes, padding_mask, self.model.special_token_id)
        return codes, tokenized, padding_mask

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        if isinstance(batch, tuple) and len(batch) == 1 \
                and isinstance(batch[0], dict):
            batch = batch[0]  # CachedBatchLoader yields the saved args tuple
        if isinstance(batch, dict) and "codes" in batch:
            # precomputed batch from the CachedBatchLoader
            codes = jnp.asarray(batch["codes"])
            tokenized = batch["tokenized"]
            padding_mask = jnp.asarray(batch["padding_mask"])
        else:
            codes, tokenized, padding_mask = \
                self._prepare_tokens_and_attributes(batch)
            if self.cached_batch_writer is not None:
                if idx == 0:
                    self.cached_batch_writer.start_epoch(self.epoch)
                self.cached_batch_writer.save(
                    {"codes": np.asarray(codes), "tokenized": tokenized,
                     "padding_mask": np.asarray(padding_mask)})
        self.state, step_metrics = self._step(self.state, codes, tokenized,
                                              padding_mask, self._next_rng())
        metrics.update(step_metrics)
        return metrics

    def _gen_model(self):
        """Wrap the current weights in the user-facing generation API."""
        from ..models.musicgen import MusicGen
        segment = self.cfg.get("dataset", {}).get("segment_duration") or 10.0
        mg = MusicGen("solver-gen", self.compression_model,
                      self.compression_variables, self.model,
                      self.state.params, max_duration=float(segment))
        gen_cfg = dict(self.cfg.get("generate", {}).get("lm", {}))
        duration = gen_cfg.get("gen_duration") or min(float(segment), 10.0)
        mg.set_generation_params(duration=float(duration),
                                 extend_stride=min(18, float(segment) / 2),
                                 **{k: v for k, v in gen_cfg.items()
                                    if k in ("use_sampling", "top_k", "top_p",
                                             "temperature", "cfg_coef")})
        return mg

    def evaluate(self) -> dict:
        """CE/PPL over the evaluate split (+ gated generative metrics) —
        `solvers/musicgen.py:636-739`."""
        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}
        if not hasattr(self, "_eval_step"):
            self._eval_step = make_eval_step(self.model)
        average: tp.Dict[str, float] = {}
        count = 0
        for idx, batch in enumerate(loader):
            codes, tokenized, padding_mask = \
                self._prepare_tokens_and_attributes(batch, training=False)
            m = self._eval_step(self.state.params, codes, tokenized,
                                padding_mask)
            count += 1
            for k, v in m.items():
                average[k] = average.get(k, 0.0) + float(np.asarray(v))
        metrics = {k: v / max(count, 1) for k, v in average.items()}

        gen_metrics, gen_weights = self.evaluate_audio_generation()
        metrics.update(gen_metrics)
        from ..parallel import distrib
        return distrib.average_metrics(metrics, count, weights=gen_weights)

    def evaluate_audio_generation(self) -> tp.Tuple[dict, dict]:
        """Off-the-shelf generative metrics over the evaluate split
        (`ref solvers/musicgen.py:636-739`): generate audio per batch and
        feed FAD / KLD / CLAP text consistency / chroma cosine.

        Each metric is built with per-metric availability probing
        (`solvers/builders.py`): a metric whose backing model has no local
        checkpoint is skipped with a precise log line instead of failing the
        stage. FAD degrades to the labeled `fad_logmel` fallback."""
        from . import builders as solver_builders
        metrics_cfg = (self.cfg.get("evaluate", {}) or {}).get("metrics", {})
        m_cfg = self.cfg.get("metrics", {}) or {}
        fad = kldiv = textcons = chroma = None
        if metrics_cfg.get("fad"):
            fad = solver_builders.get_fad(m_cfg.get("fad", {}) or {})
        if metrics_cfg.get("kld"):
            kldiv = solver_builders.get_kldiv(m_cfg.get("kld", {}) or {})
            if kldiv is None:
                logger.warning("kld requested but no local PaSST checkpoint "
                               "(see docs/METRICS.md); skipping")
        if metrics_cfg.get("text_consistency"):
            textcons = solver_builders.get_text_consistency(
                m_cfg.get("text_consistency", {}) or {})
            if textcons is None:
                logger.warning("text_consistency requested but no local CLAP "
                               "checkpoint (see docs/METRICS.md); skipping")
        if metrics_cfg.get("chroma_cosine"):
            sub = dict(m_cfg.get("chroma_cosine", {}) or {})
            sub.setdefault("chroma_base", {})
            sub["chroma_base"].setdefault(
                "sample_rate", self.compression_model.sample_rate)
            chroma = solver_builders.get_chroma_cosine_similarity(sub)
        if all(m is None for m in (fad, kldiv, textcons, chroma)):
            return {}, {}

        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}, {}
        mg = self._gen_model()
        sr = self.compression_model.sample_rate
        max_batches = (self.cfg.get("evaluate", {}) or {}).get(
            "max_generation_batches")

        def compressed_gt(ref):
            """use_gt path: ground truth through the codec
            (`ref musicgen.py:665-668`)."""
            codes, scale = self.compression_model.encode(
                self.compression_variables, jnp.asarray(ref))
            out = self.compression_model.decode(
                self.compression_variables, codes, scale)
            return np.asarray(out)[..., :ref.shape[-1]]

        for idx, (wav, infos) in enumerate(loader):
            if max_batches is not None and idx >= max_batches:
                break
            descs = [getattr(i, "description", None) or "" for i in infos]
            ref = np.asarray(wav, np.float32)
            gen = np.asarray(mg.generate(descs, progress=False))
            T = min(gen.shape[-1], ref.shape[-1])
            gen, ref = gen[..., :T], ref[..., :T]
            sizes = np.minimum(
                np.asarray([getattr(i, "n_frames", T) for i in infos]), T)
            srs = np.full((gen.shape[0],), sr)
            if fad is not None:
                y = compressed_gt(ref) if (m_cfg.get("fad", {}) or {}).get(
                    "use_gt") else gen
                fad.update(y, ref, sizes, srs)
            if kldiv is not None:
                y = compressed_gt(ref) if (m_cfg.get("kld", {}) or {}).get(
                    "use_gt") else gen
                kldiv.update(y, ref, sizes, srs)
            if textcons is not None:
                y = ref if (m_cfg.get("text_consistency", {}) or {}).get(
                    "use_gt") else gen
                textcons.update(y, descs, sizes, srs)
            if chroma is not None:
                y = compressed_gt(ref) if (m_cfg.get("chroma_cosine", {})
                                           or {}).get("use_gt") else gen
                chroma.update(y, ref, sizes, srs)

        # Each metric computes independently; a failure (e.g. an empty or
        # too-small evaluate shard) zero-weights that key rather than killing
        # the stage or the other metrics. The key set stays deterministic
        # given which metrics were constructed, so the cross-host allgather
        # in `distrib.average_metrics` sees consistent columns; weight-0 keys
        # drop out of the averaged result.
        results: tp.Dict[str, float] = {}
        weights: tp.Dict[str, float] = {}

        def emit(keys: tp.List[str], compute: tp.Callable[[], tp.Dict[str, float]]):
            try:
                vals = compute()
            except (AssertionError, ValueError) as exc:
                logger.warning("generative metric %s incomplete on this "
                               "shard: %s", "/".join(keys), exc)
                vals = {k: 0.0 for k in keys}
                weights.update({k: 0.0 for k in keys})
            else:
                weights.update({k: 1.0 for k in keys})
            results.update({k: float(v) for k, v in vals.items()})

        if fad is not None:
            key = "fad" if fad.embed_kind != "logmel-fallback" \
                else "fad_logmel"
            emit([key], lambda: {key: fad.compute()})
        if kldiv is not None:
            emit(["kld", "kld_pq", "kld_qp", "kld_both"], kldiv.compute)
        if textcons is not None:
            emit(["text_consistency"],
                 lambda: {"text_consistency": textcons.compute()})
        if chroma is not None:
            emit(["chroma_cosine"],
                 lambda: {"chroma_cosine": chroma.compute()})
        return results, weights

    def generate(self) -> dict:
        """Sample generation stage with SampleManager storage
        (`solvers/musicgen.py:511-615`)."""
        import types
        loader = (self.dataloaders.get("generate")
                  or self.dataloaders.get("evaluate")
                  or self.dataloaders.get("valid"))
        if loader is None:
            return {}
        from ..utils.samples.manager import SampleManager
        xp = types.SimpleNamespace(folder=self._folder, cfg=self.cfg)
        manager = SampleManager(xp)
        gen_cfg = self.cfg.get("generate", {}).get("lm", {})
        mg = self._gen_model()
        sample_rate = self.compression_model.sample_rate
        n_done = 0
        for wav, infos in loader:
            descs = [getattr(i, "description", None) or "" for i in infos]
            conds = [{"description": d} for d in descs]
            if gen_cfg.get("unprompted_samples", True):
                gen = np.asarray(mg.generate(descs, progress=False))
                manager.add_samples(gen, self.epoch, conditioning=conds,
                                    ground_truth_wavs=np.asarray(wav))
                # media logging (`ref solvers/base.py:51-54` tensorboard/wandb)
                for gi, g in enumerate(gen[:4]):
                    self.writers.write_audio(
                        f"generate/sample_{n_done + gi}", g, sample_rate,
                        self.epoch)
            if gen_cfg.get("prompted_samples", False):
                prompt_duration = float(gen_cfg.get("prompt_duration")
                                        or mg.duration / 4)
                P = int(prompt_duration * sample_rate)
                prompt = np.asarray(wav, np.float32)[..., :P]
                gen = np.asarray(mg.generate_continuation(
                    prompt, sample_rate, descs, progress=False))
                manager.add_samples(gen, self.epoch, conditioning=conds,
                                    prompt_wavs=prompt)
            n_done += len(infos)
            if n_done >= int(gen_cfg.get("num_samples", len(infos))):
                break
        logger.info("Generated %d samples under %s", n_done,
                    manager.base_folder)
        return {"generated_samples": n_done}

    def run_epoch(self, split: str = "train", max_updates: int = 0) -> dict:
        loader = self.dataloaders[split]
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(self.epoch)
        average: tp.Dict[str, float] = {}
        count = 0
        for idx, batch in enumerate(loader):
            if max_updates and idx >= max_updates:
                break
            m = self.run_step(idx, batch, {})
            count += 1
            for k, v in m.items():
                average[k] = average.get(k, 0.0) + float(np.asarray(v))
        return {k: v / max(count, 1) for k, v in average.items()}
