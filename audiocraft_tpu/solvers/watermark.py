"""AudioSeal watermark training.

Parity: `audiocraft/solvers/watermark.py:76-716` — joint generator/detector
training with random messages, crop/pad/mix augmentation pipeline + audio
effects (incl. EnCodec re-compression with straight-through grad), balanced
perceptual losses wrt the watermarked audio, detection + decoding losses.
"""
import random
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..losses import Balancer
from ..losses.loudnessloss import TFLoudnessRatio
from ..losses.specloss import MultiScaleMelSpectrogramLoss
from ..losses.sisnr import SISNR
from ..losses.wmloss import WMDetectionLoss, WMMbLoss
from ..models.watermark import AudioSeal, AudioSealDetector, AudioSealWM
from ..modules.watermark import mix, pad
from ..utils.audio_effects import AudioEffects, get_audio_effects, select_audio_effects


@struct.dataclass
class WatermarkTrainState:
    step: jax.Array
    params: tp.Any        # {'generator': ..., 'detector': ...}
    opt_state: tp.Any
    balancer_state: tp.Any


def random_message(rng: np.random.RandomState, nbits: int, batch_size: int
                   ) -> np.ndarray:
    """`solvers/watermark.py:69-74`."""
    if nbits == 0:
        return np.zeros((batch_size, 0), np.int32)
    return rng.randint(0, 2, size=(batch_size, nbits)).astype(np.int32)


from .base import SolverRunMixin


class WatermarkSolver(SolverRunMixin):
    """`solvers/watermark.py:76-716`."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.sample_rate = cfg.get("sample_rate", 16000)
        seed = cfg.get("seed", 2036)
        self._np_rng = np.random.RandomState(seed)
        self._rng = jax.random.PRNGKey(seed)

        wm_cfg = dict(cfg.get("audioseal", {}))
        self.nbits = wm_cfg.pop("nbits", 16)
        arch = dict(dimension=wm_cfg.pop("dimension", 32),
                    n_filters=wm_cfg.pop("n_filters", 4),
                    n_residual_layers=wm_cfg.pop("n_residual_layers", 1),
                    ratios=tuple(wm_cfg.pop("ratios", (8, 5, 4, 2))))
        generator = AudioSealWM(nbits=self.nbits, **arch)
        detector = AudioSealDetector(nbits=self.nbits, **arch)
        self.model = AudioSeal(generator, detector, nbits=self.nbits)

        segment = cfg.get("dataset", {}).get("segment_duration", 1.0)
        T = int(self.sample_rate * segment)
        example = jnp.zeros((1, 1, T), jnp.float32)
        params = self.model.init(jax.random.PRNGKey(seed), example)

        losses_cfg = dict(cfg.get("losses", {}))
        self.loss_weights = {
            "l1": losses_cfg.get("l1", 0.1),
            "msspec": losses_cfg.get("msspec", 2.0),
            "sisnr": losses_cfg.get("sisnr", 0.0),
            "tf_loudnessratio": losses_cfg.get("tf_loudnessratio", 10.0),
        }
        self.wm_detection_weight = losses_cfg.get("wm_detection", 1.0)
        self.wm_mb_weight = losses_cfg.get("wm_mb", 1.0)
        self.percep_losses: tp.Dict[str, tp.Callable] = {
            "l1": lambda x, y: jnp.mean(jnp.abs(x - y)),
            "msspec": MultiScaleMelSpectrogramLoss(
                self.sample_rate, **cfg.get("msspec", {"range_start": 6,
                                                       "range_end": 9,
                                                       "n_mels": 16})),
            "sisnr": SISNR(self.sample_rate, segment=min(segment, 0.5)),
            "tf_loudnessratio": TFLoudnessRatio(
                self.sample_rate, **cfg.get("tf_loudnessratio",
                                            {"segment": 0.5, "n_bands": 4})),
        }
        self.detection_loss = WMDetectionLoss(
            **cfg.get("wm_detection", {"p_weight": 1.0, "n_weight": 1.0}))
        self.decoding_loss = WMMbLoss(
            **cfg.get("wm_mb", {"temperature": 0.1, "loss_type": "bce"}))

        self.balancer = Balancer(
            {k: w for k, w in self.loss_weights.items() if w > 0},
            **cfg.get("balancer", {}))

        self.optimizer = optax.adam(float(cfg.get("optim", {}).get("lr", 5e-5)))
        self.state = WatermarkTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.optimizer.init(params),
            balancer_state=self.balancer.init_state())

        # attack suite (`watermark.py:185-250`)
        if "aug_weights" in cfg and "audio_effects" in cfg:
            self.aug_weights = dict(cfg["aug_weights"])
            self.augmentations = get_audio_effects(cfg)
        else:
            self.augmentations = {
                "identity": AudioEffects.identity,
                "random_noise": AudioEffects.random_noise,
                "boost_audio": AudioEffects.boost_audio,
                "duck_audio": AudioEffects.duck_audio,
            }
            self.aug_weights = {k: 0.5 for k in self.augmentations}
            self.aug_weights["identity"] = 1.0
        self._steps_cache: tp.Dict[str, tp.Any] = {}
        from . import builders as solver_builders
        self.dataloaders = solver_builders.get_audio_datasets(
            cfg, solver_builders.DatasetType.AUDIO) if cfg.get("datasource") else {}
        self.epoch = 1

    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    # codec round trips run on the host (no TPU callback support); the jitted
    # step receives the precomputed attack delta and applies it additively,
    # which is exactly the straight-through semantics of the reference
    # (`utils/audio_effects.py:146-175`): value = codec(y), grad = identity.
    CODEC_EFFECTS = ("mp3_compression", "aac_compression")

    def _get_step(self, effect_name: str):
        """One jitted train step per sampled augmentation."""
        if effect_name in self._steps_cache:
            return self._steps_cache[effect_name]
        model = self.model
        if effect_name in self.CODEC_EFFECTS:
            effect = None  # replaced by the additive host-computed delta
        else:
            effect = self.augmentations[effect_name]
        balancer = self.balancer
        optimizer = self.optimizer
        percep = {k: f for k, f in self.percep_losses.items()
                  if self.loss_weights.get(k, 0) > 0}
        det_w, mb_w = self.wm_detection_weight, self.wm_mb_weight
        detection_loss, decoding_loss = self.detection_loss, self.decoding_loss

        def step(state: WatermarkTrainState, x, message, mask, rng,
                 attack_delta=None):
            def loss_fn(params, y_wm):
                # mask is true_predictions-ordered [B, 2, T]: channel 0 =
                # non-watermarked, channel 1 = watermarked (matching the
                # detector's class order, `modules/watermark.py:28`)
                wm_mask = mask[:, 1:2]
                attacked = y_wm * wm_mask
                if effect is not None:
                    attacked = effect(attacked, mask=None)
                if attack_delta is not None:
                    attacked = attacked + jax.lax.stop_gradient(attack_delta)
                positive = model.detect_watermark(params, attacked)
                negative = model.detect_watermark(params, x)
                loss_det = detection_loss(positive, negative, wm_mask)
                loss_mb = decoding_loss(positive, negative, wm_mask, message)
                return det_w * loss_det + mb_w * loss_mb, (loss_det, loss_mb)

            # generator fwd with vjp for the balancer
            def gen_fwd(params):
                wm = model.generator.apply(params["generator"], x, message,
                                           method=AudioSealWM.get_watermark)
                return x + wm

            y_wm, vjp_fn = jax.vjp(gen_fwd, state.params)

            # balanced perceptual losses wrt y_wm
            loss_fns = {k: (lambda y, f=f: f(y, x)) for k, f in percep.items()}
            out_grad, g_loss, losses, new_bal, _ = balancer.backward(
                loss_fns, y_wm, state.balancer_state)
            (percep_grads,) = vjp_fn(out_grad)

            # detection/decoding losses back through generator AND detector
            (wm_loss, (loss_det, loss_mb)), wm_grads = jax.value_and_grad(
                lambda p: loss_fn(p, gen_fwd(p)), has_aux=True)(state.params)

            grads = jax.tree.map(lambda a, b: a + b, percep_grads, wm_grads)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics = {"d_loss": loss_det, "mb_loss": loss_mb,
                       "percep_loss": g_loss, **losses}
            return WatermarkTrainState(step=state.step + 1, params=new_params,
                                       opt_state=new_opt,
                                       balancer_state=new_bal), metrics

        fn = jax.jit(step, donate_argnums=(0,))
        self._steps_cache[effect_name] = fn
        return fn

    def evaluate(self) -> dict:
        """Detection/decoding metrics over the evaluate split
        (`solvers/watermark.py:400-533`): detection accuracy + FPR/FNR on
        watermarked-vs-clean clips, message bit accuracy, localization mIoU
        on half-watermarked clips, and SI-SNR of the watermarked audio.
        PESQ/STOI stay gated (external C extensions)."""
        loader = self.dataloaders.get("evaluate")
        if loader is None:
            return {}
        import jax
        from ..losses.sisnr import SISNR
        from ..metrics.miou import calculate_miou
        sisnr = SISNR(sample_rate=self.sample_rate)
        model, params = self.model, self.state.params

        @jax.jit
        def fwd(params, x, message):
            y = model.forward(params, x, message)
            pos = model.detect_watermark(params, y)
            neg = model.detect_watermark(params, x)
            return y, pos, neg

        totals: tp.Dict[str, float] = {}
        count = 0
        for batch in loader:
            wav = batch[0] if isinstance(batch, tuple) else batch
            x = jnp.asarray(np.asarray(wav, np.float32))
            B, _, T = x.shape
            message = jnp.asarray(random_message(self._np_rng, self.nbits, B))
            y, pos, neg = fwd(params, x, message)
            pos, neg = np.asarray(pos), np.asarray(neg)
            # presence probability = softmax over the first two channels
            det_pos = (pos[:, 1] > pos[:, 0]).mean()        # TPR
            det_neg = (neg[:, 1] > neg[:, 0]).mean()        # FPR
            totals["detection_acc"] = totals.get("detection_acc", 0.0) \
                + float((det_pos + (1 - det_neg)) / 2)
            totals["fnr"] = totals.get("fnr", 0.0) + float(1 - det_pos)
            totals["fpr"] = totals.get("fpr", 0.0) + float(det_neg)
            if self.nbits:
                bits = (pos[:, 2:] > 0).mean(axis=-1) > 0.5  # [B, nbits]
                totals["bit_acc"] = totals.get("bit_acc", 0.0) + float(
                    (bits == (np.asarray(message) > 0.5)).mean())
            # localization: watermark only the first half of each clip
            half = np.concatenate([np.asarray(y)[..., :T // 2],
                                   np.asarray(x)[..., T // 2:]], axis=-1)
            det_half = np.asarray(self.model.detect_watermark(
                params, jnp.asarray(half)))
            pred = (det_half[:, 1] > det_half[:, 0]).astype(np.float32)
            truth = np.concatenate([np.ones((B, T // 2)),
                                    np.zeros((B, T - T // 2))], axis=1)
            totals["miou"] = totals.get("miou", 0.0) + calculate_miou(pred, truth)
            totals["sisnr_wm"] = totals.get("sisnr_wm", 0.0) - float(
                np.asarray(jnp.mean(sisnr(y, x))))
            count += 1
        if self.cfg.get("evaluate", {}).get("metrics", {}).get("pesq"):
            import logging
            logging.getLogger(__name__).warning(
                "PESQ/STOI need external C extensions; skipping")
        from ..parallel import distrib
        return distrib.average_metrics(
            {k: v / max(count, 1) for k, v in totals.items()}, count)

    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        """`watermark.py:252-399`."""
        wav = batch[0] if isinstance(batch, tuple) else batch
        x = np.asarray(wav, np.float32)
        B = x.shape[0]
        message = random_message(self._np_rng, self.nbits, B)

        # localized-watermark augmentation: pad or mix (`watermark.py:185-250`)
        mode = self._np_rng.choice(["pad", "mix", "none"], p=[0.2, 0.2, 0.6])
        if mode == "pad":
            _, true_predictions = pad(x, central=self._np_rng.rand() < 0.5)
            mask = true_predictions[:, 1:2]
        elif mode == "mix":
            _, true_predictions = mix(x, x, window_size=0.5)
            mask = true_predictions[:, 1:2]
        else:
            mask = np.ones_like(x[:, :1])
        mask2 = np.concatenate([1 - mask, mask], axis=1)

        effects = select_audio_effects(self.augmentations, self.aug_weights,
                                       mode="weighted", max_length=1)
        effect_name = list(effects.keys())[0]
        step = self._get_step(effect_name)
        rng = self._next_rng()
        attack_delta = None
        if effect_name in self.CODEC_EFFECTS:
            # host codec round trip on the (deterministically recomputed)
            # watermarked batch; the jitted step adds the delta with a
            # stop_gradient = straight-through attack
            if not hasattr(self, "_gen_fwd_jit"):
                model = self.model
                self._gen_fwd_jit = jax.jit(lambda p, a, msg: a + (
                    model.generator.apply(p["generator"], a, msg,
                                          method=AudioSealWM.get_watermark)))
            y_wm = np.asarray(self._gen_fwd_jit(
                self.state.params, jnp.asarray(x), jnp.asarray(message)))
            y_masked = y_wm * mask
            from ..data.audio_utils import get_aac, get_mp3
            cfg = getattr(self.augmentations[effect_name], "keywords", {})
            codec = get_mp3 if effect_name == "mp3_compression" else get_aac
            try:
                attacked = codec(y_masked.astype(np.float32),
                                 int(cfg.get("sample_rate", self.sample_rate)),
                                 cfg.get("bitrate", "128k"))
                attack_delta = jnp.asarray(attacked - y_masked)
            except Exception as e:  # codec unavailable: identity attack
                logger.warning("codec attack %s failed (%s); using identity",
                               effect_name, e)
                attack_delta = jnp.zeros_like(jnp.asarray(y_masked))
        self.state, m = step(self.state, jnp.asarray(x), jnp.asarray(message),
                             jnp.asarray(mask2), rng,
                             attack_delta=attack_delta)
        metrics.update({k: float(np.asarray(v)) for k, v in m.items()})
        return metrics
