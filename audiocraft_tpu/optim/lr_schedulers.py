"""LR schedulers as optax schedules.

Parity: `audiocraft/optim/` — CosineLRScheduler (`cosine_lr_scheduler.py:13`),
PolynomialDecayLRScheduler, InverseSquareRootLRScheduler, LinearWarmupLR.
"""
import math
import typing as tp

import optax


def cosine_with_warmup(lr: float, warmup_steps: int, total_steps: int,
                       lr_min_ratio: float = 0.0, cycle_length: float = 1.0):
    """`cosine_lr_scheduler.py:13-52`."""
    def schedule(step):
        import jax.numpy as jnp
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        s = jnp.minimum((step - warmup_steps)
                        / jnp.maximum(total_steps - warmup_steps, 1), 1.0)
        cos = lr_min_ratio + (1 - lr_min_ratio) * 0.5 * (
            1 + jnp.cos(jnp.pi * s / cycle_length))
        return jnp.where(step < warmup_steps, warm, lr * cos)
    return schedule


def polynomial_decay(lr: float, warmup_steps: int, total_steps: int,
                     end_lr: float = 0.0, power: float = 1.0,
                     zero_lr_warmup_steps: int = 0):
    """`polynomial_decay_lr_scheduler.py`."""
    def schedule(step):
        import jax.numpy as jnp
        step_w = jnp.maximum(step - zero_lr_warmup_steps, 0)
        warm = lr * step_w / jnp.maximum(warmup_steps, 1)
        frac = 1 - (jnp.minimum(step, total_steps) - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1)
        decayed = (lr - end_lr) * jnp.maximum(frac, 0.0) ** power + end_lr
        return jnp.where(step < zero_lr_warmup_steps, 0.0,
                         jnp.where(step < warmup_steps + zero_lr_warmup_steps,
                                   warm, decayed))
    return schedule


def inverse_sqrt(lr: float, warmup_steps: int, warmup_init_lr: float = 0.0):
    """`inverse_sqrt_lr_scheduler.py`."""
    def schedule(step):
        import jax.numpy as jnp
        lr_step = (lr - warmup_init_lr) / jnp.maximum(warmup_steps, 1)
        warm = warmup_init_lr + step * lr_step
        decay = lr * (warmup_steps ** 0.5) / jnp.sqrt(jnp.maximum(step, 1))
        return jnp.where(step < warmup_steps, warm, decay)
    return schedule


def linear_warmup(lr: float, warmup_steps: int):
    """`linear_warmup_lr_scheduler.py`."""
    def schedule(step):
        import jax.numpy as jnp
        return jnp.where(step < warmup_steps,
                         lr * step / jnp.maximum(warmup_steps, 1), lr)
    return schedule


def get_lr_scheduler(name: tp.Optional[str], lr: float, total_updates: int,
                     cfg: tp.Optional[dict] = None):
    """Scheduler factory mirroring `solvers/builders.py:141-188`."""
    cfg = cfg or {}
    if name is None or name == "none":
        return lr
    if name == "cosine":
        return cosine_with_warmup(lr, cfg.get("warmup", 0), total_updates,
                                  cfg.get("lr_min_ratio", 0.0),
                                  cfg.get("cycle_length", 1.0))
    if name == "polynomial_decay":
        return polynomial_decay(lr, cfg.get("warmup", 0), total_updates,
                                cfg.get("end_lr", 0.0), cfg.get("power", 1.0),
                                cfg.get("zero_lr_warmup_steps", 0))
    if name == "inverse_sqrt":
        return inverse_sqrt(lr, cfg.get("warmup", 0),
                            cfg.get("warmup_init_lr", 0.0))
    if name == "linear_warmup":
        return linear_warmup(lr, cfg.get("warmup", 0))
    raise ValueError(f"Unsupported LR Scheduler: {name}")
