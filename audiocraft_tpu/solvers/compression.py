"""EnCodec GAN training: multi-discriminator adversarial + balanced aux losses.

Parity: `audiocraft/solvers/compression.py:27-328`. One jitted step does what
the reference's run_step does with several backwards:
  * generator forward (with EMA codebook updates) via `jax.vjp`,
  * probabilistic discriminator update (lax.cond on the 1/every bernoulli),
  * balanced losses' gradients wrt y_pred combined by the Balancer,
  * penalty gradient folded into the same vjp pull (tuple cotangent), matching
    `other_loss.backward(retain_graph=True)` + `balancer.backward`.
"""
import logging
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..adversarial import (AdversarialLoss, AdversaryState,
                           FeatureMatchingLoss, MultiScaleSTFTDiscriminator,
                           get_adv_criterion, get_fake_criterion,
                           get_real_criterion)
from ..losses import (Balancer, BalancerState, MRSTFTLoss,
                      MelSpectrogramL1Loss, MultiScaleMelSpectrogramLoss, SISNR)
from ..models.encodec import EncodecModel

logger = logging.getLogger(__name__)


@struct.dataclass
class CompressionTrainState:
    step: jax.Array
    gen_vars: tp.Any                    # {'params': ..., 'quantizer': RVQState}
    gen_opt_state: tp.Any
    adv_states: tp.Dict[str, AdversaryState]
    balancer_state: BalancerState


def get_aux_losses(cfg: dict, sample_rate: int) -> tp.Dict[str, tp.Callable]:
    """Loss factory (`solvers/builders.py:227-248`); cfg like the reference's
    loss hyperparameter groups."""
    def l1(x, y):
        return jnp.mean(jnp.abs(x - y))

    def l2(x, y):
        return jnp.mean(jnp.square(x - y))

    out: tp.Dict[str, tp.Callable] = {"l1": l1, "l2": l2}
    out["mrstft"] = MRSTFTLoss(**cfg.get("mrstft", {}))
    mel_cfg = dict(cfg.get("mel", {}))
    mel_cfg.setdefault("sample_rate", sample_rate)
    out["mel"] = MelSpectrogramL1Loss(**mel_cfg)
    msspec_cfg = dict(cfg.get("msspec", {}))
    msspec_cfg.setdefault("sample_rate", sample_rate)
    out["msspec"] = MultiScaleMelSpectrogramLoss(**msspec_cfg)
    sisnr_cfg = dict(cfg.get("sisnr", {}))
    sisnr_cfg.setdefault("sample_rate", sample_rate)
    out["sisnr"] = SISNR(**sisnr_cfg)
    return out


def get_adversarial_losses(cfg: dict, sample_rate: int
                           ) -> tp.Dict[str, AdversarialLoss]:
    """Adversary factory (`solvers/builders.py:250-279`)."""
    adv_cfg = cfg.get("adversarial", {})
    adversaries = adv_cfg.get("adversaries", ["msstftd"])
    adv_loss_name = adv_cfg.get("adv_loss", "hinge")
    feat_loss_name = adv_cfg.get("feat_loss", "l1")
    out = {}
    for name in adversaries:
        if name == "msstftd":
            kw = dict(cfg.get("msstftd", {}))
            kw.pop("activation", None)
            slope = kw.pop("activation_params", {}).get("negative_slope", 0.2)
            for k in ("n_ffts", "hop_lengths", "win_lengths"):
                if k in kw:
                    kw[k] = tuple(kw[k])
            adversary = MultiScaleSTFTDiscriminator(**kw)
        elif name == "msd":
            from ..adversarial.discriminators.msd import MultiScaleDiscriminator
            adversary = MultiScaleDiscriminator(**cfg.get("msd", {}))
        elif name == "mpd":
            from ..adversarial.discriminators.mpd import MultiPeriodDiscriminator
            adversary = MultiPeriodDiscriminator(**cfg.get("mpd", {}))
        else:
            raise ValueError(f"Unknown adversary: {name}")
        optimizer = optax.adam(cfg.get("optim", {}).get("lr", 3e-4),
                               b1=0.5, b2=0.9)
        out[name] = AdversarialLoss(
            adversary, optimizer,
            loss=get_adv_criterion(adv_loss_name),
            loss_real=get_real_criterion(adv_loss_name),
            loss_fake=get_fake_criterion(adv_loss_name),
            loss_feat=FeatureMatchingLoss() if feat_loss_name else None,
            normalize=adv_cfg.get("normalize", True))
    return out


def make_compression_train_step(
        model: EncodecModel,
        adv_losses: tp.Dict[str, AdversarialLoss],
        aux_losses: tp.Dict[str, tp.Callable],
        loss_weights: tp.Dict[str, float],
        balancer: Balancer,
        optimizer: optax.GradientTransformation,
        disc_every: int = 1,
        max_norm: float = 0.0,
        mesh=None):
    """Build the jitted EnCodec GAN step:
    step(state, x [B,C,T], rng) -> (new_state, metrics).

    `loss_weights` holds adv/feat/<aux> weights; weight-0 aux losses are
    computed as info metrics only (`solvers/builders.py:227-248`).

    With `mesh`, the step is data-parallel over the mesh: batch sharded over
    dp+fsdp, generator/discriminator state replicated (the codec is small —
    dp-only, like the reference's `compression.py:40` FSDP refusal); XLA
    inserts the gradient all-reduce.
    """
    balanced_names = ([f"adv_{n}" for n in adv_losses]
                      + [f"feat_{n}" for n in adv_losses]
                      + [k for k, w in loss_weights.items()
                         if k in aux_losses and w > 0])
    info_names = [k for k, w in loss_weights.items()
                  if k in aux_losses and w == 0]
    bal_weights = {}
    for n in adv_losses:
        bal_weights[f"adv_{n}"] = loss_weights.get("adv", 1.0)
        bal_weights[f"feat_{n}"] = loss_weights.get("feat", 1.0)
    for k in balanced_names:
        if k in aux_losses:
            bal_weights[k] = loss_weights[k]
    balancer.weights = bal_weights

    def step(state: CompressionTrainState, x: jax.Array, rng: jax.Array):
        metrics: tp.Dict[str, jax.Array] = {}
        rng_q, rng_disc = jax.random.split(rng)

        # ---- generator forward with vjp wrt (params, output) --------------
        def gen_fwd(params):
            qres, new_vars = model.forward(
                {"params": params, "quantizer": state.gen_vars["quantizer"]},
                x, training=True, rng=rng_q)
            penalty = qres.penalty if qres.penalty is not None else jnp.zeros(())
            return (qres.x, penalty), (qres, new_vars)

        (y_pred, penalty), vjp_fn, (qres, new_vars) = jax.vjp(
            gen_fwd, state.gen_vars["params"], has_aux=True)
        metrics["bandwidth"] = jnp.mean(qres.bandwidth)
        metrics["penalty"] = penalty

        # ---- discriminator step with probability 1/every ------------------
        y_pred_sg = jax.lax.stop_gradient(y_pred)
        do_disc = jax.random.uniform(rng_disc, ()) <= (1.0 / disc_every)
        new_adv_states = {}
        d_total = jnp.zeros(())
        for name, adversary in adv_losses.items():
            def train_branch(s, adversary=adversary):
                return adversary.train_adv(s, y_pred_sg, x)

            def skip_branch(s):
                return s, jnp.zeros(())

            new_s, d_loss = jax.lax.cond(do_disc, train_branch, skip_branch,
                                         state.adv_states[name])
            new_adv_states[name] = new_s
            metrics[f"d_{name}"] = d_loss
            d_total = d_total + d_loss
        if adv_losses:
            metrics["d_loss"] = d_total

        # ---- balanced generator losses wrt y_pred --------------------------
        loss_fns: tp.Dict[str, tp.Callable] = {}
        for name, adversary in adv_losses.items():
            params_d = new_adv_states[name].params
            loss_fns[f"adv_{name}"] = (
                lambda y, a=adversary, p=params_d: a.forward(p, y, x)[0])
            loss_fns[f"feat_{name}"] = (
                lambda y, a=adversary, p=params_d: a.forward(p, y, x)[1])
        for k in balanced_names:
            if k in aux_losses:
                loss_fns[k] = lambda y, f=aux_losses[k]: f(y, x)

        out_grad, g_loss, losses, new_bal_state, bal_metrics = \
            balancer.backward(loss_fns, y_pred, state.balancer_state)
        metrics.update(losses)
        metrics.update(bal_metrics)
        metrics["g_loss"] = g_loss

        # ---- one pull: balanced grad + penalty grad (cotangent 1) ----------
        (param_grads,) = vjp_fn((out_grad, jnp.ones(())))

        if max_norm:
            param_grads = optax.clip_by_global_norm(max_norm).update(
                param_grads, optax.EmptyState())[0]
        updates, new_opt = optimizer.update(param_grads, state.gen_opt_state,
                                            state.gen_vars["params"])
        new_params = optax.apply_updates(state.gen_vars["params"], updates)

        # ---- info losses ----------------------------------------------------
        for k in info_names:
            metrics[k] = aux_losses[k](y_pred_sg, x)
        if adv_losses:
            metrics["adv"] = sum(metrics[f"adv_{n}"] for n in adv_losses)
            metrics["feat"] = sum(metrics[f"feat_{n}"] for n in adv_losses)

        gen_vars = {"params": new_params, "quantizer": new_vars["quantizer"]}
        new_state = CompressionTrainState(
            step=state.step + 1, gen_vars=gen_vars, gen_opt_state=new_opt,
            adv_states=new_adv_states, balancer_state=new_bal_state)
        return new_state, metrics

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated
        rep = replicated(mesh)
        return jax.jit(step,
                       in_shardings=(rep, batch_sharding(mesh), rep),
                       out_shardings=(rep, rep),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def make_compression_valid_step(model: EncodecModel,
                                aux_losses: tp.Dict[str, tp.Callable],
                                adv_losses: tp.Dict[str, AdversarialLoss]):
    """Eval step: losses only, no updates (`compression.py:83-174` eval path)."""

    def step(gen_vars, adv_states, x: jax.Array):
        qres, _ = model.forward(gen_vars, x, training=False)
        y_pred = qres.x
        metrics = {"bandwidth": jnp.mean(qres.bandwidth)}
        if qres.penalty is not None:
            metrics["penalty"] = qres.penalty
        for name, adversary in adv_losses.items():
            adv, feat = adversary.forward(adv_states[name].params, y_pred, x)
            metrics[f"adv_{name}"] = adv
            metrics[f"feat_{name}"] = feat
        for k, f in aux_losses.items():
            metrics[k] = f(y_pred, x)
        return metrics

    return jax.jit(step)


# ---------------------------------------------------------------- solver

from .base import SolverRunMixin


class CompressionSolver(SolverRunMixin):
    """EnCodec training solver (`solvers/compression.py:27-328`).

    Note: like the reference (`compression.py:40`), parameter sharding (fsdp)
    is unsupported here — the codec is small; dp-only.
    """

    def __init__(self, cfg: dict):
        import jax
        from ..models import builders as model_builders
        from . import builders as solver_builders

        self.cfg = cfg
        self.sample_rate = cfg.get("sample_rate", 32000)
        self.dataloaders = solver_builders.get_audio_datasets(cfg) \
            if cfg.get("datasource") else {}

        if cfg.get("compression_model") == "encodec":
            self.model = model_builders.get_compression_model(cfg)
            variables = self.model.init(jax.random.PRNGKey(cfg.get("seed", 2036)))
        else:
            self.model, variables = model_builders.get_debug_compression_model(
                self.sample_rate)

        loss_weights = dict(cfg.get("losses", {"adv": 4.0, "feat": 4.0,
                                               "l1": 0.1, "msspec": 2.0,
                                               "mel": 0.0, "sisnr": 0.0}))
        self.aux_losses = get_aux_losses(cfg, self.sample_rate)
        self.adv_losses = get_adversarial_losses(cfg, self.sample_rate)
        self.balancer = Balancer({}, **cfg.get("balancer", {}))
        optim_cfg = cfg.get("optim", {})
        self.optimizer = optax.adam(float(optim_cfg.get("lr", 3e-4)), b1=0.5, b2=0.9)
        self._step = make_compression_train_step(
            self.model, self.adv_losses, self.aux_losses, loss_weights,
            self.balancer, self.optimizer,
            disc_every=cfg.get("adversarial", {}).get("every", 1),
            max_norm=optim_cfg.get("max_norm", 0.0))
        self._valid_step = make_compression_valid_step(
            self.model, self.aux_losses, self.adv_losses)

        segment = cfg.get("dataset", {}).get("segment_duration", 1.0)
        example = jnp.zeros((1, self.model.channels,
                             int(self.sample_rate * segment)), jnp.float32)
        adv_states = {n: a.init(jax.random.PRNGKey(1), example)
                      for n, a in self.adv_losses.items()}
        self.state = CompressionTrainState(
            step=jnp.zeros((), jnp.int32), gen_vars=variables,
            gen_opt_state=self.optimizer.init(variables["params"]),
            adv_states=adv_states, balancer_state=self.balancer.init_state())
        self._rng = jax.random.PRNGKey(cfg.get("seed", 2036))
        self.epoch = 1

    def _next_rng(self):
        import jax
        self._rng, r = jax.random.split(self._rng)
        return r

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        wav = batch[0] if isinstance(batch, tuple) else batch
        x = jnp.asarray(wav)
        self.state, m = self._step(self.state, x, self._next_rng())
        metrics.update(m)
        return metrics

    def evaluate(self) -> dict:
        """Reconstruction metrics over the evaluate split
        (`compression.py:183-238`): SI-SNR + RVM always; ViSQOL/PESQ are
        external binaries and stay gated."""
        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}
        from ..losses.sisnr import SISNR
        from ..metrics.rvm import RelativeVolumeMel
        sisnr = SISNR(sample_rate=self.model.sample_rate)
        rvm = RelativeVolumeMel(sample_rate=self.model.sample_rate)
        variables = self.state.gen_vars
        totals: tp.Dict[str, float] = {}
        count = 0
        for batch in loader:
            wav = batch[0] if isinstance(batch, tuple) else batch
            x = jnp.asarray(np.asarray(wav, np.float32))
            codes, scale = self.model.encode(variables, x)
            y = self.model.decode(variables, codes, scale)
            y = y[..., :x.shape[-1]]
            totals["sisnr"] = totals.get("sisnr", 0.0) - float(
                np.asarray(jnp.mean(sisnr(y, x))))
            for k, v in rvm(y, x).items():
                totals[k] = totals.get(k, 0.0) + float(np.asarray(v))
            count += 1
        if self.cfg.get("evaluate", {}).get("metrics", {}).get("visqol"):
            logger.warning("ViSQOL is an external binary; skipping "
                           "(see docs/METRICS.md)")
        from ..parallel import distrib
        return distrib.average_metrics(
            {k: v / max(count, 1) for k, v in totals.items()}, count)

    def generate(self) -> dict:
        """Store reconstructions next to their references
        (`compression.py:240-266`)."""
        import types
        loader = (self.dataloaders.get("generate")
                  or self.dataloaders.get("evaluate")
                  or self.dataloaders.get("valid"))
        if loader is None:
            return {}
        from ..utils.samples.manager import SampleManager
        xp = types.SimpleNamespace(folder=self._folder, cfg=self.cfg)
        manager = SampleManager(xp, map_reference_to_sample_id=True)
        variables = self.state.gen_vars
        n = 0
        for batch in loader:
            wav = batch[0] if isinstance(batch, tuple) else batch
            x = jnp.asarray(np.asarray(wav, np.float32))
            codes, scale = self.model.encode(variables, x)
            y = np.asarray(self.model.decode(variables, codes, scale))
            manager.add_samples(y[..., :x.shape[-1]], self.epoch,
                                ground_truth_wavs=np.asarray(x))
            n += y.shape[0]
            break  # one batch of reconstructions per generate stage
        logger.info("Stored %d codec reconstructions under %s", n,
                    manager.base_folder)
        return {"generated_samples": n}

    @staticmethod
    def model_from_checkpoint(checkpoint_path, **kwargs):
        """Load a trained codec for downstream solvers
        (`compression.py:268-301`)."""
        from ..models import loaders
        return loaders.load_compression_model(str(checkpoint_path))
