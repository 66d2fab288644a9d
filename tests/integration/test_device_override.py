"""`device=cpu` must pin the jax platform from config alone (no env vars) —
the reference moves models with `cfg.device` (`train.py:119`); here the
equivalent is platform selection before the first computation."""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent.parent


def test_device_cpu_pins_platform():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    code = (
        "from audiocraft_tpu.train import init_seed_and_system\n"
        "init_seed_and_system({'device': 'cpu', 'seed': 1})\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('BACKEND', jax.default_backend())\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout
    assert "BACKEND cpu" in proc.stdout
