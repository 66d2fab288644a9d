"""Optimization: EMA, LR schedulers, DAdaptAdam (layer 5).

The reference's FSDP wrapper (`audiocraft/optim/fsdp.py`) has no equivalent
here by design: parameter sharding is a GSPMD annotation
(`parallel/sharding.py`), not a module wrapper.
"""
# flake8: noqa
from .dadam import dadapt_adam
from .ema import EMAState, ema_init, ema_params, ema_update
from .lr_schedulers import (cosine_with_warmup, get_lr_scheduler,
                            inverse_sqrt, linear_warmup, polynomial_decay)
