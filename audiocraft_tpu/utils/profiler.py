"""Training profiler.

Parity: `audiocraft/utils/profiler.py:17-38` — the reference wraps the
xformers profiler for the first ~20 updates. The TPU equivalent traces with
`jax.profiler` (xplane, viewable in TensorBoard/xprof).
"""
import logging
import typing as tp
from pathlib import Path

import jax

logger = logging.getLogger(__name__)


class Profiler:
    """Context-manager profiler for the first N updates of training."""

    def __init__(self, enabled: bool = False,
                 output_dir: tp.Union[str, Path] = "/tmp/audiocraft_tpu_profile",
                 num_steps: int = 20):
        self.enabled = enabled
        self.output_dir = str(output_dir)
        self.num_steps = num_steps
        self._step = 0
        self._active = False

    def step(self):
        """Call once per training update (`solvers/base.py:549`)."""
        if not self.enabled:
            return
        self._step += 1
        if self._active and self._step >= self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("Profiler trace written to %s", self.output_dir)

    def __enter__(self):
        # only the first num_steps updates are ever traced (re-entering after
        # a completed trace is a no-op, so solvers can wrap every split)
        if self.enabled and self._step < self.num_steps and not self._active:
            Path(self.output_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.output_dir)
            self._active = True
            logger.info("Profiler enabled: tracing first %d steps", self.num_steps)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
