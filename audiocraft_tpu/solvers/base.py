"""StandardSolver: the abstract training loop shared by every task.

Parity: `audiocraft/solvers/base.py:27-631` — stages
(train/valid/evaluate/generate), stateful registry, best-state manager, EMA
swap for eval stages, checkpoint save/restore incl. `//sig/` and
`//pretrained/` sources, epoch loop with logging, `run_one_stage`.

The flashy BaseSolver machinery is replaced with a compact native loop:
metrics averaging is plain accumulation (already global under SPMD), logging
goes to the standard logger, and all mutable training state is an explicit
pytree the solver owns.
"""
import logging
import time
import typing as tp
from abc import ABC, abstractmethod
from pathlib import Path

import jax
import numpy as np

from ..optim.ema import EMAState, ema_init, ema_params, ema_update
from ..utils import checkpoint
from ..utils.utils import jsonable, model_hash

logger = logging.getLogger(__name__)


class StandardSolver(ABC):
    """Base solver (`base.py:27-146`).

    Subclasses implement `build_model`, `build_dataloaders`, `run_step`,
    and optionally `generate`/`evaluate`. Training state lives in
    `self.state` (a pytree the subclass defines); extra host-side state in
    `self.extra_state` (dict of json-ables).
    """

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.folder = Path(cfg.get("folder", "/tmp/audiocraft_tpu/xp"))
        self.folder.mkdir(parents=True, exist_ok=True)
        self.logger = logger
        self.device = jax.devices()[0]
        self.epoch = 1
        self.history: tp.List[tp.Dict[str, tp.Any]] = []
        self.best_state: tp.Optional[tp.Any] = None
        self._best_metric_value: tp.Optional[float] = None
        self.state: tp.Any = None         # device pytree (params/opt/...)
        self.ema_state: tp.Optional[EMAState] = None
        self.ema_decay = cfg.get("optim", {}).get("ema", {}).get("decay", 0.99)
        self.ema_use = cfg.get("optim", {}).get("ema", {}).get("use", False)
        self.ema_every = cfg.get("optim", {}).get("ema", {}).get("updates", 1)
        self.dataloaders: tp.Dict[str, tp.Any] = {}
        self.rng = np.random.RandomState(cfg.get("seed", 2036))
        self._log_updates = cfg.get("logging", {}).get("log_updates", 10)
        self.train_updates_per_epoch = cfg.get("optim", {}).get(
            "updates_per_epoch", 0) or 0
        from ..utils.writers import ExperimentWriters
        self.writers = ExperimentWriters(cfg, self.folder)
        self.build_dataloaders()
        self.build_model()

    # ----------------------------------------------------------- abstract
    @abstractmethod
    def build_model(self):
        ...

    @abstractmethod
    def build_dataloaders(self):
        ...

    @abstractmethod
    def run_step(self, idx: int, batch, metrics: dict) -> dict:
        """One train/valid step; returns updated metrics."""
        ...

    def show(self):
        """Log model/dataset info (`base.py:196`)."""
        self.logger.info("Solver: %s", self.__class__.__name__)

    @property
    def best_metric_name(self) -> tp.Optional[str]:
        """Metric used for best-state tracking (`base.py:148-158`)."""
        return None

    # ------------------------------------------------------------- stages
    def _is_training(self) -> bool:
        return self.current_stage == "train"

    def common_train_valid(self, dataset_split: str) -> dict:
        """The hot loop shared by train/valid (`base.py:517-557`)."""
        loader = self.dataloaders[dataset_split]
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(self.epoch)
        self.current_stage = dataset_split
        metrics: tp.Dict[str, float] = {}
        average: tp.Dict[str, float] = {}
        count = 0
        updates = self.train_updates_per_epoch if dataset_split == "train" else 0
        begin = time.time()
        for idx, batch in enumerate(loader):
            if updates and idx >= updates:
                break
            metrics = self.run_step(idx, batch, {})
            count += 1
            for k, v in metrics.items():
                average[k] = average.get(k, 0.0) + float(np.asarray(v))
            if self._is_training() and self.ema_use and \
                    (idx + 1) % self.ema_every == 0:
                self.ema_state = ema_update(self.ema_state, self._ema_source(),
                                            self.ema_decay)
            if (idx + 1) % self._log_updates == 0:
                speed = (idx + 1) / (time.time() - begin)
                short = {k: round(average[k] / count, 4)
                         for k in list(average)[:6]}
                self.logger.info("%s epoch %d [%d/%d] %.2f it/s %s",
                                 dataset_split, self.epoch, idx + 1,
                                 len(loader), speed, short)
        if count == 0:
            return {}
        return {k: v / count for k, v in average.items()}

    def train(self) -> dict:
        return self.common_train_valid("train")

    def valid(self) -> dict:
        with self.swap_ema():
            return self.common_train_valid("valid")

    def evaluate(self) -> dict:
        """Override for task metrics (`base.py:199`)."""
        return {}

    def generate(self) -> dict:
        """Override for sample generation (`base.py:203`)."""
        return {}

    # ---------------------------------------------------------------- EMA
    def _ema_source(self):
        """Pytree tracked by EMA; default: `self.state.params`."""
        return getattr(self.state, "params", self.state)

    def init_ema(self):
        if self.ema_use:
            self.ema_state = ema_init(self._ema_source())
            self.logger.info("Initializing EMA on the model with decay = %.4f"
                             " every %d updates", self.ema_decay, self.ema_every)

    class _EmaSwap:
        def __init__(self, solver):
            self.solver = solver
            self.saved = None

        def __enter__(self):
            s = self.solver
            if s.ema_use and s.ema_state is not None and \
                    float(s.ema_state.count) > 0:
                self.saved = s._ema_source()
                s._set_ema_params(ema_params(s.ema_state, s.ema_decay))
            return self

        def __exit__(self, *a):
            if self.saved is not None:
                self.solver._set_ema_params(self.saved)

    def _set_ema_params(self, params):
        if hasattr(self.state, "params"):
            self.state = self.state.replace(params=params)
        else:
            self.state = params

    def swap_ema(self):
        """EMA swap context for valid/eval stages (`base.py:197-223`)."""
        return self._EmaSwap(self)

    # --------------------------------------------------------- checkpoints
    def state_dict(self) -> tp.Dict[str, tp.Any]:
        """`base.py:122-146`: everything needed to resume."""
        out: tp.Dict[str, tp.Any] = {"state": self.state}
        if self.ema_state is not None:
            out["ema"] = self.ema_state
        if self.best_state is not None:
            out["best_state"] = self.best_state
        return out

    def extra_state_dict(self) -> dict:
        return {"epoch": self.epoch, "history": jsonable(self.history),
                "model_hash": model_hash(self._ema_source()),
                "best_metric_value": self._best_metric_value}

    def checkpoint_path(self, name: tp.Optional[str] = None) -> Path:
        return self.folder / checkpoint.checkpoint_name(name)

    def save_checkpoints(self):
        """Save checkpoint + json sidecar (`base.py:282-312`)."""
        if jax.process_index() != 0:
            return
        path = self.checkpoint_path()
        checkpoint.save_checkpoint(self.state_dict()["state"], path)
        import json
        with open(str(path) + ".json", "w") as f:
            json.dump(self.extra_state_dict(), f)
        if self.ema_state is not None:
            checkpoint.save_checkpoint(self.ema_state,
                                       self.folder / "checkpoint_ema.th")
        if self.best_state is not None:
            checkpoint.save_checkpoint(self.best_state,
                                       self.folder / "checkpoint_best.th")
        self.logger.info("Checkpoint saved to %s", path)

    def restore(self, continue_from: tp.Optional[str] = None) -> bool:
        """Restore from the XP folder or `continue_from` (`base.py:314-430`)."""
        path: tp.Optional[Path] = self.checkpoint_path()
        # The XP's own checkpoint wins over `continue_from`: a preempted run
        # restarted with the same config (which still names the donor) must
        # resume its own progress, not reload the donor (`ref base.py:364-377`
        # only falls back to continue_from when no own checkpoint exists).
        own = path is not None and Path(path).exists()
        if continue_from is not None and not own:
            path = checkpoint.resolve_checkpoint_path(continue_from)
            assert path is not None, f"Could not resolve {continue_from}"
        if path is None or not Path(path).exists():
            return False
        self.state = checkpoint.restore_pytree(path, self.state)
        import json
        sidecar = Path(str(path) + ".json")
        if sidecar.exists() and (continue_from is None or own):
            extra = json.loads(sidecar.read_text())
            self.epoch = extra.get("epoch", 1)
            self.history = extra.get("history", [])
            self._best_metric_value = extra.get("best_metric_value")
        else:
            # Warm start from an external checkpoint: params only. run()
            # advances the epoch by one after a successful restore, so start
            # from 0 to make the new run train its full schedule from 1.
            self.epoch = 0
        ema_path = Path(path).parent / "checkpoint_ema.th"
        if self.ema_state is not None and ema_path.exists():
            self.ema_state = checkpoint.restore_pytree(ema_path, self.ema_state)
        self.logger.info("Restored checkpoint from %s at epoch %d",
                         path, self.epoch)
        return True

    # ---------------------------------------------------------- best state
    def update_best_state(self, stage_metrics: dict):
        """Track the best params by metric (`base.py:147-187`)."""
        name = self.best_metric_name
        if name is None or name not in stage_metrics:
            self.best_state = self._ema_source()
            return
        value = float(stage_metrics[name])
        if self._best_metric_value is None or value < self._best_metric_value:
            self._best_metric_value = value
            self.best_state = jax.tree.map(lambda x: x, self._ema_source())
            self.logger.info("New best state with %s=%.4f", name, value)

    # ------------------------------------------------------------ run loop
    def should_run_stage(self, stage: str) -> bool:
        """`base.py:478-487`."""
        is_last = self.epoch == self.cfg.get("optim", {}).get("epochs", 1)
        every = self.cfg.get(stage, {}).get("every", None)
        run_at = (every is not None and self.epoch % every == 0)
        return is_last or run_at

    def run_epoch(self):
        """`base.py:466-476`."""
        self.logger.info("-" * 70)
        self.logger.info("Starting epoch %d...", self.epoch)
        metrics: tp.Dict[str, dict] = {}
        metrics["train"] = self.train()
        if "valid" in self.dataloaders:
            metrics["valid"] = self.valid()
            self.update_best_state(metrics["valid"])
        else:
            self.update_best_state(metrics["train"])
        if self.should_run_stage("evaluate"):
            metrics["evaluate"] = self.evaluate()
        if self.should_run_stage("generate"):
            metrics["generate"] = self.generate()
        for stage, stage_metrics in metrics.items():
            self.writers.write_scalars(stage, stage_metrics, self.epoch)
        self.history.append(jsonable(metrics))
        return metrics

    def run(self):
        """Full training: restore + epoch loop + commit (`base.py:489-515`)."""
        from ..parallel import distrib
        self.init_ema()
        restored = self.restore(self.cfg.get("continue_from"))
        if restored:
            self.epoch += 1
        distrib.check_epoch_consistency(self.epoch)
        self.show()
        epochs = self.cfg.get("optim", {}).get("epochs", 1)
        while self.epoch <= epochs:
            self.run_epoch()
            self.save_checkpoints()
            self.epoch += 1
        self.logger.info("Training done.")

    def run_one_stage(self, stage_name: str):
        """Debug helper (`base.py:577-600`)."""
        fn = {"train": self.train, "valid": self.valid,
              "evaluate": self.evaluate, "generate": self.generate}[stage_name]
        self.init_ema()
        return fn()


class SolverRunMixin:
    """Shared run loop for the concrete solvers (epoching, logging,
    checkpointing) — the non-abstract half of StandardSolver for solvers that
    hold their own device `state` pytree and `run_step`."""
    cfg: tp.Dict[str, tp.Any]
    epoch: int = 1

    @property
    def _folder(self) -> Path:
        folder = Path(self.cfg.get("folder", "/tmp/audiocraft_tpu/xp"))
        folder.mkdir(parents=True, exist_ok=True)
        return folder

    @property
    def writers(self):
        if not hasattr(self, "_writers"):
            from ..utils.writers import ExperimentWriters
            self._writers = ExperimentWriters(self.cfg, self._folder)
        return self._writers

    def _aux_tools(self):
        """Profiler + deadlock watchdog from cfg (`base.py:517-557`)."""
        if not hasattr(self, "_profiler"):
            from ..utils.profiler import Profiler
            from ..utils.deadlock import DeadlockDetect
            pcfg = self.cfg.get("profiler", {}) or {}
            dcfg = self.cfg.get("deadlock", {}) or {}
            self._profiler = Profiler(
                enabled=pcfg.get("enabled", False),
                output_dir=pcfg.get("output_dir", "/tmp/audiocraft_tpu_profile"),
                num_steps=pcfg.get("num_steps", 20))
            self._deadlock = DeadlockDetect(use=dcfg.get("use", False),
                                            timeout=dcfg.get("timeout", 600))
        return self._profiler, self._deadlock

    def _iter_split(self, split: str, max_updates: int) -> dict:
        loader = self.dataloaders.get(split)
        if loader is None:
            return {}
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(self.epoch)
        average: tp.Dict[str, float] = {}
        count = 0
        log_every = self.cfg.get("logging", {}).get("log_updates", 10)
        begin = time.time()
        profiler, deadlock = self._aux_tools()
        with profiler, deadlock:
            for idx, batch in enumerate(loader):
                if max_updates and idx >= max_updates:
                    break
                deadlock.update("batch")
                m = self.run_step(idx, batch, {})
                deadlock.update("step")
                if split == "train":
                    profiler.step()
                count += 1
                for k, v in m.items():
                    try:
                        average[k] = average.get(k, 0.0) + float(np.asarray(v))
                    except Exception:
                        pass
                if (idx + 1) % log_every == 0:
                    speed = (idx + 1) / (time.time() - begin)
                    short = {k: round(average[k] / count, 4)
                             for k in list(average)[:6]}
                    logger.info("%s epoch %d [%d] %.2f it/s %s", split,
                                self.epoch, idx + 1, speed, short)
        return {k: v / max(count, 1) for k, v in average.items()}

    @property
    def history(self) -> tp.List[tp.Dict[str, tp.Any]]:
        """Per-epoch metric dicts, persisted in the checkpoint sidecar
        (`ref base.py:122-146` puts history in the solver state_dict)."""
        if not hasattr(self, "_history"):
            self._history: tp.List[tp.Dict[str, tp.Any]] = []
        return self._history

    def save_checkpoints(self):
        import jax as _jax
        if _jax.process_index() != 0:
            return
        path = self._folder / checkpoint.checkpoint_name()
        checkpoint.save_checkpoint(self.state, path)
        import json
        with open(str(path) + ".json", "w") as f:
            json.dump({"epoch": self.epoch,
                       "history": jsonable(self.history)}, f)
        logger.info("Checkpoint saved to %s", path)

    def restore(self, continue_from: tp.Optional[str] = None) -> bool:
        path: tp.Optional[Path] = self._folder / checkpoint.checkpoint_name()
        # Own XP checkpoint wins over continue_from (see StandardSolver.restore).
        own = path is not None and Path(path).exists()
        if continue_from is not None and not own:
            path = checkpoint.resolve_checkpoint_path(continue_from)
        if path is None or not Path(path).exists():
            return False
        self.state = checkpoint.restore_pytree(path, self.state)
        import json
        sidecar = Path(str(path) + ".json")
        # Warm starts (`continue_from`) take only the params: restoring the
        # donor's epoch would make a new run whose `optim.epochs` <= the
        # donor's silently train zero epochs (ref base.py:352-361 likewise
        # drops the run-loop state for external checkpoints).
        if sidecar.exists() and (continue_from is None or own):
            extra = json.loads(sidecar.read_text())
            self.epoch = extra.get("epoch", 1)
            self._history = extra.get("history", [])
        else:
            self.epoch = 0  # warm start: params only (see StandardSolver)
        logger.info("Restored from %s (epoch %d)", path, self.epoch)
        return True

    def should_run_stage(self, stage: str) -> bool:
        """`base.py:478-487`: on the last epoch, or every `stage.every`."""
        is_last = self.epoch == self.cfg.get("optim", {}).get("epochs", 1)
        every = self.cfg.get(stage, {}).get("every", None)
        return is_last or (every is not None and self.epoch % every == 0)

    def evaluate(self) -> dict:
        """Override for task eval metrics (`base.py:199`)."""
        return {}

    def generate(self) -> dict:
        """Override for sample generation (`base.py:203`)."""
        return {}

    def run(self):
        from ..parallel import distrib
        restored = self.restore(self.cfg.get("continue_from"))
        if restored:
            self.epoch += 1
        distrib.check_epoch_consistency(self.epoch)
        optim_cfg = self.cfg.get("optim", {})
        epochs = optim_cfg.get("epochs", 1)
        updates = optim_cfg.get("updates_per_epoch", 0) or 0
        history = []
        execute_only = self.cfg.get("execute_only")
        if execute_only:
            logger.info("Running single stage: %s", execute_only)
            return [{execute_only: self.run_one_stage(execute_only)}]
        while self.epoch <= epochs:
            logger.info("Starting epoch %d...", self.epoch)
            metrics = {"train": self._iter_split("train", updates)}
            if "valid" in getattr(self, "dataloaders", {}):
                metrics["valid"] = self._iter_split("valid", 0)
            if self.should_run_stage("evaluate"):
                metrics["evaluate"] = self.evaluate()
            if self.should_run_stage("generate"):
                metrics["generate"] = self.generate()
            for stage, stage_metrics in metrics.items():
                self.writers.write_scalars(stage, stage_metrics, self.epoch)
            history.append(metrics)
            self.history.append(jsonable(metrics))
            self.save_checkpoints()
            self.epoch += 1
        logger.info("Training done.")
        return history

    def run_one_stage(self, stage_name: str):
        if stage_name == "evaluate":
            return self.evaluate()
        if stage_name == "generate":
            return self.generate()
        optim_cfg = self.cfg.get("optim", {})
        updates = optim_cfg.get("updates_per_epoch", 0) or 0
        return self._iter_split(stage_name, updates)
