"""EMA k-means vector quantization core.

Parity: `audiocraft/quantization/core_vq.py:87-404` (EuclideanCodebook with
kmeans init on first batch, EMA cluster/embed updates with Laplace smoothing,
dead-code expiry by resampling batch vectors; ResidualVectorQuantization
cascading quantizers over residuals).

TPU-first design:
  * All codebook levels are **stacked** ``[n_q, C, D]`` and the residual
    cascade is a single `lax.scan` over levels — one compiled program, no
    Python loop over modules.
  * Nearest-code search is one ``[N, D] @ [D, C]`` MXU matmul per level
    (the ``|x|^2`` term is constant across codes and dropped from the argmin).
  * All state transitions are pure: `(state, x, rng) -> (out, new_state)`.
    Under pjit the arrays have global semantics, so the reference's
    `broadcast_tensors` sync (`core_vq.py:140,158`) is unnecessary — every
    replica computes the same update by construction.
  * kmeans init / expiry run in f32 under `lax.cond` so they cost nothing
    after the first step.
"""
import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CodebookState:
    """EMA codebook buffers (`core_vq.py:123-127`), stacked over levels.

    Shapes (single level): inited ``[]`` bool, cluster_size ``[C]``,
    embed / embed_avg ``[C, D]``. Under RVQ these carry a leading ``[n_q]``.
    """
    inited: jax.Array
    cluster_size: jax.Array
    embed: jax.Array
    embed_avg: jax.Array


def uniform_init(rng: jax.Array, shape: tp.Sequence[int]) -> jax.Array:
    """Kaiming-uniform init matching `core_vq.py:36-39`."""
    fan_in = shape[-1]
    bound = jnp.sqrt(3.0) * jnp.sqrt(2.0 / fan_in)  # kaiming_uniform gain for leaky_relu(0)
    return jax.random.uniform(rng, tuple(shape), jnp.float32, -bound, bound)


def sample_vectors(rng: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Pick `num` vectors from `samples` [N, D] (`core_vq.py:42-50`).

    If N >= num: a random subset without replacement; else with replacement.
    N is static under jit so the branch is compile-time.
    """
    num_samples = samples.shape[0]
    if num_samples >= num:
        indices = jax.random.permutation(rng, num_samples)[:num]
    else:
        indices = jax.random.randint(rng, (num,), 0, num_samples)
    return samples[indices]


def kmeans(rng: jax.Array, samples: jax.Array, num_clusters: int,
           num_iters: int = 10) -> tp.Tuple[jax.Array, jax.Array]:
    """Plain k-means on [N, D] (`core_vq.py:53-75`). Returns (means, bins)."""
    dim = samples.shape[-1]
    means = sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        # nearest cluster per sample via one MXU matmul
        dots = samples @ means.T                                # [N, C]
        dists = dots * 2 - jnp.sum(jnp.square(means), axis=-1)  # argmax == nearest
        buckets = jnp.argmax(dists, axis=-1)                    # [N]
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)  # [N, C]
        bins = jnp.sum(onehot, axis=0)                          # [C]
        new_sums = onehot.T @ samples                           # [C, D]
        new_means = new_sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    dots = samples @ means.T
    dists = dots * 2 - jnp.sum(jnp.square(means), axis=-1)
    buckets = jnp.argmax(dists, axis=-1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype), axis=0)
    return means, bins


def init_codebook(rng: jax.Array, codebook_size: int, dim: int,
                  kmeans_init: bool = True) -> CodebookState:
    """`core_vq.py:113-127`: zeros when kmeans-initialized (filled on first
    training batch), kaiming-uniform otherwise."""
    if kmeans_init:
        embed = jnp.zeros((codebook_size, dim), jnp.float32)
    else:
        embed = uniform_init(rng, (codebook_size, dim))
    return CodebookState(
        inited=jnp.asarray(not kmeans_init),
        cluster_size=jnp.zeros((codebook_size,), jnp.float32),
        embed=embed,
        embed_avg=embed,
    )


def quantize_codes(embed: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest code indices for x [..., D] against embed [C, D]
    (`core_vq.py:164-172`). The |x|^2 term is omitted — constant in the argmin.
    """
    flat = x.reshape(-1, x.shape[-1])
    dots = flat @ embed.T.astype(flat.dtype)
    dists = dots * 2 - jnp.sum(jnp.square(embed), axis=-1).astype(flat.dtype)
    return jnp.argmax(dists, axis=-1).reshape(x.shape[:-1])


def dequantize(embed: jax.Array, codes: jax.Array) -> jax.Array:
    """Codebook lookup (`core_vq.py:177-179`)."""
    return embed[codes]


def ema_codebook_update(state: CodebookState, flat: jax.Array, codes: jax.Array,
                        rng: jax.Array, *, decay: float, epsilon: float,
                        threshold_ema_dead_code: float) -> CodebookState:
    """One EMA + expiry + (first-step) kmeans-init transition.

    Mirrors `core_vq.py:129-158,195-219`: on first call run kmeans on the
    batch; every training step, expire dead codes by resampling batch vectors,
    then EMA-update cluster sizes and embed sums and renormalize with Laplace
    smoothing.
    """
    codebook_size, dim = state.embed.shape
    flat = flat.astype(jnp.float32)
    rng_init, rng_expire = jax.random.split(rng)

    def do_init(_):
        embed, cluster_size = kmeans(rng_init, flat, codebook_size)
        return CodebookState(inited=jnp.asarray(True), cluster_size=cluster_size,
                             embed=embed, embed_avg=embed)

    state = jax.lax.cond(state.inited, lambda s: s, do_init, state)

    # recompute codes if we just initialized (cheap relative to model fwd)
    codes = quantize_codes(state.embed, flat)
    onehot = jax.nn.one_hot(codes, codebook_size, dtype=jnp.float32)  # [N, C]

    # dead-code expiry (`core_vq.py:146-158`)
    if threshold_ema_dead_code > 0:
        expired = state.cluster_size < threshold_ema_dead_code
        replacement = sample_vectors(rng_expire, flat, codebook_size)
        embed = jnp.where(expired[:, None], replacement, state.embed)
    else:
        embed = state.embed

    # EMA updates (`core_vq.py:205-217`)
    cluster_size = state.cluster_size * decay + jnp.sum(onehot, axis=0) * (1 - decay)
    embed_sum = onehot.T @ flat  # [C, D]
    embed_avg = state.embed_avg * decay + embed_sum * (1 - decay)
    smoothed = ((cluster_size + epsilon)
                / (jnp.sum(cluster_size) + codebook_size * epsilon)
                * jnp.sum(cluster_size))
    embed_normalized = embed_avg / smoothed[:, None]
    # expired codes take the replacement vector, not the EMA value
    if threshold_ema_dead_code > 0:
        embed_normalized = jnp.where(expired[:, None], embed, embed_normalized)
        embed_avg = jnp.where(expired[:, None], embed, embed_avg)
        cluster_size = jnp.where(expired, threshold_ema_dead_code, cluster_size)
    return CodebookState(inited=state.inited, cluster_size=cluster_size,
                         embed=embed_normalized, embed_avg=embed_avg)


def orthogonal_loss_fn(embed: jax.Array) -> jax.Array:
    """Eq (2) of arXiv 2112.00384 (`core_vq.py:78-84`)."""
    n = embed.shape[0]
    normed = embed / jnp.maximum(jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12)
    cosine_sim = normed @ normed.T
    return jnp.sum(jnp.square(cosine_sim - jnp.eye(n, dtype=embed.dtype))) / (n ** 2)


@struct.dataclass
class RVQState:
    """Residual VQ state: stacked codebooks [n_q, C, D]."""
    codebooks: CodebookState


def init_rvq(rng: jax.Array, n_q: int, codebook_size: int, dim: int,
             kmeans_init: bool = True) -> RVQState:
    rngs = jax.random.split(rng, n_q)
    states = [init_codebook(r, codebook_size, dim, kmeans_init) for r in rngs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return RVQState(codebooks=stacked)


def rvq_encode(state: RVQState, x: jax.Array, n_q: int) -> jax.Array:
    """Residual encode (`core_vq.py:387-397`): x [B, T, D] -> codes [B, K, T].

    `lax.scan` over the first n_q stacked levels; each step is one MXU matmul.
    """
    cb = jax.tree.map(lambda a: a[:n_q], state.codebooks)

    def step(residual, level):
        embed = level.embed.astype(x.dtype)
        codes = quantize_codes(embed, residual)     # [B, T]
        quantized = dequantize(embed, codes)
        return residual - quantized, codes

    _, codes = jax.lax.scan(step, x, cb)            # codes [K, B, T]
    return jnp.transpose(codes, (1, 0, 2))


def rvq_decode(state: RVQState, codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Residual decode (`core_vq.py:399-405`): codes [B, K, T] -> [B, T, D]."""
    n_q = codes.shape[1]
    cb = jax.tree.map(lambda a: a[:n_q], state.codebooks)
    codes_kbt = jnp.transpose(codes, (1, 0, 2))

    def step(acc, inp):
        level, c = inp
        return acc + dequantize(level.embed.astype(dtype), c), None

    B, _, T = codes.shape
    D = state.codebooks.embed.shape[-1]
    acc0 = jnp.zeros((B, T, D), dtype)
    out, _ = jax.lax.scan(step, acc0, (cb, codes_kbt))
    return out


def rvq_forward(state: RVQState, x: jax.Array, *, n_q_active: jax.Array,
                training: bool, rng: tp.Optional[jax.Array] = None,
                decay: float = 0.99, epsilon: float = 1e-5,
                threshold_ema_dead_code: float = 2.0,
                orthogonal_reg_weight: float = 0.0,
                ) -> tp.Tuple[jax.Array, jax.Array, jax.Array, RVQState]:
    """Training/eval forward over all max_n_q levels with masking.

    Returns (quantized_out [B,T,D], codes [B,K,T], commit_losses [K], new state).

    The reference runs a Python loop over the first ``n_q`` modules
    (`core_vq.py:351-385`); here ``n_q_active`` may be a traced scalar
    (quantizer dropout, `vq.py:79-82`) so we always scan over all levels and
    mask out contributions of levels >= n_q_active — static shapes, one
    compiled program.
    """
    max_n_q = state.codebooks.embed.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, max_n_q)
    level_idx = jnp.arange(max_n_q)
    active = (level_idx < n_q_active)  # [K] bool

    def step(carry, inp):
        residual, quantized_out = carry
        level, lrng, is_active = inp
        embed = level.embed.astype(x.dtype)
        codes = quantize_codes(embed, residual)
        quantized = dequantize(embed, codes)
        quantized = jax.lax.stop_gradient(quantized)
        # commitment loss per level: mse(stop_grad(quantized), residual),
        # gradient flows into the residual/encoder (`core_vq.py:324-327`)
        commit = jnp.mean(jnp.square(quantized - residual))
        if training:
            flat = jax.lax.stop_gradient(residual).reshape(-1, residual.shape[-1])
            new_level = ema_codebook_update(
                level, flat, codes, lrng, decay=decay, epsilon=epsilon,
                threshold_ema_dead_code=threshold_ema_dead_code)
            new_level = jax.tree.map(
                lambda new, old: jnp.where(is_active, new, old), new_level, level)
        else:
            new_level = level
        gate = is_active.astype(x.dtype)
        new_residual = residual - quantized * gate
        new_quantized_out = quantized_out + quantized * gate
        return (new_residual, new_quantized_out), (codes, commit * gate.astype(jnp.float32), new_level)

    carry0 = (x, jnp.zeros_like(x))
    (_, quantized_out), (codes, commits, new_levels) = jax.lax.scan(
        step, carry0, (state.codebooks, rngs, active))

    if training:
        # STE through the full cascade (`core_vq.py:380-382`)
        quantized_out = x + jax.lax.stop_gradient(quantized_out - x)

    codes = jnp.transpose(codes, (1, 0, 2))  # [B, K, T]
    return quantized_out, codes, commits, RVQState(codebooks=new_levels)
