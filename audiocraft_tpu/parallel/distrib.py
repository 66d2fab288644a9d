"""Distributed facade: the reference's `flashy.distrib` verbs, TPU-native.

Parity: SURVEY.md §2.8/§5 — init/rank/world_size/barrier/average_metrics/
average_tensors/sync_model/broadcast_tensors over torch.distributed+NCCL
become mostly no-ops under single-controller SPMD: gradient sync is implicit
in pjit-sharded grads, buffers are replicated by construction, and metric
averaging is a jnp.mean over the global (sharded) array.
"""
import logging
import os
import typing as tp

import jax
import numpy as np

logger = logging.getLogger(__name__)
_INITIALIZED = False


def init(coordinator_address: tp.Optional[str] = None,
         num_processes: tp.Optional[int] = None,
         process_id: tp.Optional[int] = None):
    """Initialize multi-host JAX if env vars / args request it
    (replaces `flashy.distrib.init`, `train.py:138`)."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=num_processes,
                                   process_id=process_id)
    _INITIALIZED = True


def rank() -> int:
    return jax.process_index()


def world_size() -> int:
    return jax.process_count()


def is_distributed() -> bool:
    return world_size() > 1


def barrier(name: str = "barrier"):
    """Cross-host barrier (`ref utils/checkpoint.py:137-161` relies on it
    around the sharded-save `.tmp.done` protocol).

    `multihost_utils.sync_global_devices` runs a psum over one device per
    process — every process must reach the same named point before any
    proceeds. A process-local jitted op would NOT synchronize anything."""
    if is_distributed():
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def average_metrics(metrics: tp.Dict[str, tp.Any], count: float = 1.0,
                    weights: tp.Optional[tp.Dict[str, float]] = None
                    ) -> tp.Dict[str, float]:
    """Cross-process weighted mean of host-side metrics
    (`flashy.distrib.average_metrics`, `ref solvers/base.py:556`).

    jit-computed metrics over GSPMD-sharded batches are already global, but
    the host-side evaluate/generate loops (chroma cosine, SI-SNR, ViSQOL,
    PESQ, FAD/KLD/CLAP) each run over the process-local dataloader shard:
    without this reduction every host would log different eval numbers and
    `update_best_state` could pick different best epochs per host. The
    reduction is a psum of (value*weight, weight) over one device per process
    via `multihost_utils.process_allgather`.

    `weights` optionally overrides `count` per key: a host whose shard could
    not produce a metric (e.g. too few FAD embedding windows) passes weight 0
    for that key so it still participates in the allgather with a consistent
    key set, contributing nothing to the mean. Keys whose *global* weight is
    zero are dropped from the result — identically on every host, since the
    totals are global. A CRC of the sorted key tuple rides along so a
    per-host key-set divergence (e.g. differing local checkpoints switching
    `fad` to `fad_logmel`) fails loudly instead of averaging mismatched
    columns."""
    keys = sorted(metrics.keys())
    w = {k: float(count if weights is None else weights.get(k, count))
         for k in keys}
    if not is_distributed():
        return {k: float(np.asarray(metrics[k])) for k in keys if w[k] > 0}
    from jax.experimental import multihost_utils
    import zlib
    crc = float(zlib.crc32(";".join(keys).encode()))
    local = np.asarray(
        [crc] + [float(np.asarray(metrics[k])) * w[k] for k in keys]
        + [w[k] for k in keys], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    assert (gathered[:, 0] == crc).all(), \
        "average_metrics: metric key sets differ across hosts — check that " \
        "every host has the same metric checkpoints installed"
    total = gathered.sum(axis=0)
    n = len(keys)
    out = {}
    for i, k in enumerate(keys):
        denom = total[1 + n + i]
        if denom > 0:
            out[k] = float(total[1 + i] / denom)
    return out


def check_epoch_consistency(epoch: int):
    """Guard against out-of-sync checkpoint restores across hosts
    (`ref solvers/base.py:389-397`): the cross-process mean of the epoch must
    equal every process's local epoch, else at least one host restored a
    different checkpoint."""
    if not is_distributed():
        return
    avg = average_metrics({"epoch": float(epoch)})["epoch"]
    if avg != float(epoch):
        raise RuntimeError(
            f"Inconsistent checkpoint restore: our epoch is {epoch} but the "
            f"cross-process average is {avg}; at least one host restored a "
            "different epoch.")


def sync_model(params):
    """Gradient sync is implicit under pjit; no-op (`musicgen.py:402-409`)."""
    return params


def eager_sync_model(params):
    return params


def broadcast_tensors(tensors):
    """Replication is structural under GSPMD; no-op (`core_vq.py:140`)."""
    return tensors


def is_rank_zero() -> bool:
    return rank() == 0
