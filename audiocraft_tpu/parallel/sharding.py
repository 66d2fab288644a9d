"""Parameter sharding rules: FSDP + tensor parallelism as GSPMD annotations.

Replaces the reference's torch FSDP wrapper (`audiocraft/optim/fsdp.py:51-117`)
— no wrapper classes or state-dict hacks: each parameter gets a
`NamedSharding`, XLA inserts the all-gathers/reduce-scatters.

Rules:
  * tp: transformer matmul weights split on the model-parallel dimension
    (in_proj/linear1 on columns, out_proj/linear2 on rows; per-codebook heads
    on cardinality).
  * fsdp: every remaining (or remaining-dim) large parameter is additionally
    sharded on its largest divisible axis, ZeRO-3 style.
  * small params (norms, biases) stay replicated.
"""
import logging
import re
import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# (path regex, partition spec builder) — first match wins. Specs name mesh
# axes per tensor dimension; None = replicated dim.
_TP_RULES: tp.List[tp.Tuple[str, tp.Callable[[tuple], tuple]]] = [
    # fused qkv projection [E, E + 2*kv]: split output columns over tp
    (r"self_attn/in_proj_weight$", lambda s: (("fsdp",), ("tp",))),
    (r"cross_attn/in_proj_weight$", lambda s: (("fsdp",), ("tp",))),
    # attention output projection [E, E]: split input rows over tp
    (r"(self_attn|cross_attn)/out_proj/kernel$", lambda s: (("tp",), ("fsdp",))),
    # FFN up [E, F(+F)] / down [F, E]
    (r"linear1/kernel$", lambda s: (("fsdp",), ("tp",))),
    (r"linear2/kernel$", lambda s: (("tp",), ("fsdp",))),
    # conditioner lookup tables: gather targets — sharding the vocab axis
    # makes SPMD fully rematerialize around every take (see XLA b/433785288),
    # so they stay replicated
    (r"conditioners_.*/(embed|embedding)$", lambda s: tuple(None for _ in s)),
    # LM embeddings [K, V, D] and heads [K, D, card]
    (r"(^|/)emb$", lambda s: (None, ("fsdp",), None)),
    (r"(^|/)linears$", lambda s: (None, ("fsdp",), ("tp",))),
    (r"(^|/)linears_bias$", lambda s: (None, ("tp",))),
]

_MIN_SHARD_SIZE = 2 ** 12  # below this, replicate


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def _fsdp_only_spec(shape: tuple, mesh: Mesh) -> P:
    """Shard the largest divisible dim over fsdp; replicate otherwise."""
    fsdp = mesh.shape.get("fsdp", 1)
    if fsdp == 1 or int(np.prod(shape)) < _MIN_SHARD_SIZE:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def _apply_rule(spec_builder, shape: tuple, mesh: Mesh) -> P:
    dims = spec_builder(shape)
    out: tp.List[tp.Any] = []
    for i, axes in enumerate(dims):
        if axes is None:
            out.append(None)
            continue
        axes = tuple(a for a in axes if mesh.shape.get(a, 1) > 1)
        if not axes:
            out.append(None)
            continue
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if shape[i] % size != 0:
            out.append(None)
            continue
        out.append(axes if len(axes) > 1 else axes[0])
    while len(out) < len(shape):
        out.append(None)
    return P(*out)


def infer_param_spec(path, leaf, mesh: Mesh) -> P:
    s = _path_str(path)
    shape = getattr(leaf, "shape", ())
    if len(shape) <= 1:
        return P()
    for pattern, builder in _TP_RULES:
        if re.search(pattern, s):
            return _apply_rule(builder, shape, mesh)
    return _fsdp_only_spec(shape, mesh)


def infer_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, infer_param_spec(path, leaf, mesh)),
        params)


def shard_params(params, mesh: Mesh):
    """Device-put params with inferred shardings."""
    shardings = infer_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings
