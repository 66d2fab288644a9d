"""One composed multi-host flow exercising every distributed verb together
(SURVEY §4: do better than the reference's untested multi-node story):

    sharded train steps -> per-process sharded checkpoint save (`.tmp.done`
    two-phase commit) -> restore in every process -> epoch-consistency
    guard -> one more step (bitwise-deterministic vs the un-restarted run)
    -> cross-host metric averaging.

Run from N processes that already called `jax.distributed.initialize` (the
2-process CPU test harness in tests/parallel/test_multihost_composed.py, or
`__graft_entry__.dryrun_multichip(..., n_processes=2)`).
"""
import typing as tp
from pathlib import Path

import numpy as np


def run_composed_check(tmpdir: tp.Union[str, Path],
                       dp: int = 2, fsdp: int = 2, tp_size: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    from ..models.lm import init_lm_params
    from ..models.presets import musicgen_lm
    from . import distrib
    from .checkpoint import restore_sharded, save_sharded
    from .mesh import create_mesh
    from ..solvers.musicgen import (init_train_state, make_optimizer,
                                    make_train_step, state_shardings)

    n_devices = dp * fsdp * tp_size
    assert jax.device_count() == n_devices, \
        (jax.device_count(), n_devices)
    mesh = create_mesh(dp=dp, fsdp=fsdp, tp=tp_size, devices=jax.devices())

    model = musicgen_lm("xsmall", n_q=4, card=64, dim=64, num_heads=4,
                        num_layers=2)
    params = init_lm_params(model, jax.random.PRNGKey(0), seq_len=4)
    optimizer = make_optimizer(1e-4)
    state = init_train_state(model, params, optimizer)
    shardings = state_shardings(state, mesh)

    def put(tree, sh):
        # multi-host device_put: every process holds identical host values,
        # each materializes only its addressable shards
        return jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_callback(
                np.shape(x), s, lambda idx, _x=np.asarray(x): _x[idx]),
            tree, sh)

    state = put(state, shardings)
    step_fn = make_train_step(model, optimizer, mesh)(shardings)

    # identical global batch on every process; multi-host jit rejects raw
    # numpy under non-trivial shardings, so batch args become global arrays
    from .mesh import batch_sharding, replicated
    data_sh, rep = batch_sharding(mesh), replicated(mesh)
    B, K, T = n_devices, model.n_q, 16
    rs = np.random.RandomState(7)
    codes = put(rs.randint(0, model.card, (B, K, T)).astype(np.int32),
                data_sh)
    tok = rs.randint(0, 2048, (B, 4)).astype(np.int32)
    tokenized = {"description": (put(tok, rep),
                                 put(np.ones((B, 4), np.int32), rep))}
    pad = put(np.ones((B, T), np.int32), data_sh)
    rngs = [put(np.asarray(k), rep)
            for k in jax.random.split(jax.random.PRNGKey(3), 4)]

    # ---- N sharded train steps
    for i in range(2):
        state, metrics = step_fn(state, codes, tokenized, pad, rngs[i])
    ce2 = float(metrics["ce"])

    # ---- sharded save with the .tmp.done protocol, then keep training to
    # get the ground-truth step-3 loss of an uninterrupted run
    ckdir = Path(tmpdir) / "composed_ckpt"
    save_sharded(state, ckdir, name="composed")
    distrib.barrier("composed-saved")
    cont_state, cont_metrics = step_fn(state, codes, tokenized, pad, rngs[2])
    ce3 = float(cont_metrics["ce"])

    # ---- restart: fresh init, restore every process from its own shards
    fresh = put(init_train_state(
        model, init_lm_params(model, jax.random.PRNGKey(9), seq_len=4),
        optimizer), shardings)
    restored = restore_sharded(ckdir, fresh, shardings, name="composed")
    assert int(np.asarray(restored.step)) == 2, int(np.asarray(restored.step))

    # ---- epoch-consistency guard across hosts (ref solvers/base.py:389-397)
    distrib.check_epoch_consistency(int(np.asarray(restored.step)))
    desync_raised = False
    try:
        distrib.check_epoch_consistency(
            int(np.asarray(restored.step)) + distrib.rank())
    except RuntimeError:
        desync_raised = True
    assert desync_raised or distrib.world_size() == 1, \
        "epoch guard missed a desynchronized restore"

    # ---- the restored run must continue bitwise like the uninterrupted one
    restored, r_metrics = step_fn(restored, codes, tokenized, pad, rngs[2])
    ce3_restored = float(r_metrics["ce"])
    assert abs(ce3_restored - ce3) < 1e-6, (ce3, ce3_restored)

    # ---- cross-host weighted metric averaging on the eval result
    avg = distrib.average_metrics({"ce": ce3 + distrib.rank()}, count=1)
    if distrib.world_size() == 2:
        assert abs(avg["ce"] - (ce3 + 0.5)) < 1e-6, (avg, ce3)

    return {"ce2": ce2, "ce3": ce3, "ce3_restored": ce3_restored,
            "avg_ce": avg["ce"], "rank": distrib.rank()}
