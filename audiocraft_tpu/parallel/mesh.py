"""Device mesh construction for dp/fsdp/tp sharding.

Replaces the reference's torch.distributed/NCCL world (`SURVEY.md` §2.8) with
a GSPMD mesh: data parallel ('dp'), parameter sharding ('fsdp', ZeRO-style),
and tensor parallel ('tp'). Collectives ride ICI within a slice; on multi-
slice deployments put 'dp' on DCN by listing it first (axis order = device
order = outermost axis crosses slices).
"""
import logging
import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

AXES = ("dp", "fsdp", "tp")


def create_mesh(dp: int = -1, fsdp: int = 1, tp: int = 1,
                devices: tp.Optional[tp.Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('dp', 'fsdp', 'tp') mesh. One axis may be -1 (inferred)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = {"dp": dp, "fsdp": fsdp, "tp": tp}
    unknown = [k for k, v in sizes.items() if v == -1]
    assert len(unknown) <= 1, "at most one mesh axis may be -1"
    known = int(np.prod([v for v in sizes.values() if v != -1]))
    if unknown:
        assert n % known == 0, (n, sizes)
        sizes[unknown[0]] = n // known
    total = sizes["dp"] * sizes["fsdp"] * sizes["tp"]
    assert total == n, f"mesh {sizes} does not cover {n} devices"
    arr = np.asarray(devices).reshape(sizes["dp"], sizes["fsdp"], sizes["tp"])
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch dim sharded over both data-like axes."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(tree, mesh: tp.Optional[Mesh]):
    """Pin every leaf of an activation pytree to batch sharding (dim 0 over
    dp+fsdp, other dims replicated).

    Used on conditioner outputs inside the sharded LM step: without the
    explicit constraint, XLA's sharding propagation pulls the tp sharding of
    the cross-attention projections backwards through the conditioner embed
    gather and settles on an 'involuntary full rematerialization'
    (spmd_partitioner warning, XLA b/433785288)."""
    if mesh is None:
        return tree
    import jax.numpy as jnp

    def pin(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        spec = P(*((("dp", "fsdp"),) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(pin, tree)
