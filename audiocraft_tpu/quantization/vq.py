"""Residual Vector Quantizer (`audiocraft/quantization/vq.py:16-115`).

Static config object + pure methods over an explicit `RVQState`.
"""
import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from .base import BaseQuantizer, QuantizedResult
from .core_vq import RVQState, init_rvq, rvq_decode, rvq_encode, rvq_forward


@dataclasses.dataclass
class ResidualVectorQuantizer(BaseQuantizer):
    """RVQ with quantizer-dropout and EMA k-means codebooks.

    Args mirror `vq.py:16-50`. `n_q` is the active codebook count
    (mutable via `set_num_codebooks`), `max_n_q` the allocated count.
    """
    dimension: int = 256
    n_q: int = 8
    q_dropout: bool = False
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 10
    threshold_ema_dead_code: float = 2.0
    orthogonal_reg_weight: float = 0.0
    orthogonal_reg_active_codes_only: bool = False
    orthogonal_reg_max_codes: tp.Optional[int] = None

    def __post_init__(self):
        self.max_n_q = self.n_q

    def init(self, rng: jax.Array) -> RVQState:
        return init_rvq(rng, self.max_n_q, self.bins, self.dimension, self.kmeans_init)

    def forward(self, state: RVQState, x: jax.Array, frame_rate: int, *,
                training: bool = False, rng: tp.Optional[jax.Array] = None
                ) -> tp.Tuple[QuantizedResult, RVQState]:
        """x: [B, T, D]. Applies quantizer dropout at train time
        (`vq.py:79-82`): a random number of active quantizers in [1, n_q].
        """
        n_q = jnp.asarray(self.n_q)
        if training and self.q_dropout:
            assert rng is not None
            rng, drng = jax.random.split(rng)
            n_q = jax.random.randint(drng, (), 1, self.n_q + 1)
        bw_per_q = math.log2(self.bins) * frame_rate / 1000
        quantized, codes, commits, new_state = rvq_forward(
            state, x, n_q_active=n_q, training=training, rng=rng,
            decay=self.decay, threshold_ema_dead_code=self.threshold_ema_dead_code)
        # reference takes the mean over the n_q active levels (`vq.py:84-87`)
        penalty = jnp.sum(commits) / jnp.maximum(n_q.astype(jnp.float32), 1.0)
        bw = (n_q.astype(x.dtype) * bw_per_q)
        return QuantizedResult(quantized, codes, bw, penalty=penalty), new_state

    def encode(self, state: RVQState, x: jax.Array) -> jax.Array:
        """x [B, T, D] -> codes [B, K, T] with K = active n_q (`vq.py:89-98`)."""
        return rvq_encode(state, x, self.n_q)

    def decode(self, state: RVQState, codes: jax.Array,
               dtype=jnp.float32) -> jax.Array:
        """codes [B, K, T] -> [B, T, D] (`vq.py:100-105`)."""
        return rvq_decode(state, codes, dtype)

    @property
    def total_codebooks(self) -> int:
        return self.max_n_q

    @property
    def num_codebooks(self) -> int:
        return self.n_q

    def set_num_codebooks(self, n: int):
        assert 0 < n <= self.max_n_q
        self.n_q = n
