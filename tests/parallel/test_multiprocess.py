"""Real 2-process distributed tests on CPU: barrier semantics and the
sharded-checkpoint `.tmp.done` two-phase protocol
(`ref utils/checkpoint.py:125-161`, SURVEY §4 'the TPU build should do
better: a multi-process CPU test harness')."""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent.parent


def _run_two(script: str, tmp_path, timeout=120):
    """Launch the script in 2 JAX processes sharing a coordinator."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
                   XLA_FLAGS="", JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid),
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   TMPDIR=str(tmp_path))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(pid), str(port),
             str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker timed out; output so far:\n{out}")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


HEADER = textwrap.dedent("""
    import os, sys, time
    pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.getcwd())
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    from audiocraft_tpu.parallel import distrib
    distrib._INITIALIZED = True
    assert distrib.world_size() == 2 and distrib.rank() == pid
""")


def test_barrier_actually_synchronizes(tmp_path):
    script = HEADER + textwrap.dedent("""
        t0 = time.time()
        if pid == 1:
            time.sleep(2.0)
        distrib.barrier("sync-test")
        dt = time.time() - t0
        assert pid == 1 or dt > 1.5, f"rank0 passed the barrier early: {dt}"
        print(f"OK {pid} {dt:.2f}")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o for o in outs), outs


def test_sharded_checkpoint_tmp_done_protocol(tmp_path):
    """Every rank writes its shard; the .tmp.done token only appears after
    all shards are complete, and never coexists with a half-written set."""
    script = HEADER + textwrap.dedent("""
        from pathlib import Path
        import numpy as np
        from audiocraft_tpu.utils.checkpoint import (checkpoint_name,
                                                     save_checkpoint)
        ckdir = Path(tmp) / "xp"
        ckdir.mkdir(exist_ok=True)
        name = checkpoint_name(rank=pid, use_fsdp=False)
        path = ckdir / name
        state = {"w": np.full((4,), float(pid), np.float32)}
        if pid == 1:
            time.sleep(1.0)   # rank 1 writes late
        save_checkpoint(state, path, is_sharded=True)
        distrib.barrier("after-save")
        token = ckdir / (checkpoint_name(rank=0, use_fsdp=False) + ".tmp.done")
        rank0_path = ckdir / checkpoint_name(rank=0, use_fsdp=False)
        rank1_path = ckdir / checkpoint_name(rank=1, use_fsdp=False)
        assert token.exists(), "missing .tmp.done after sharded save"
        assert rank0_path.exists() and rank1_path.exists()
        # the token must be younger than every shard (two-phase commit)
        assert token.stat().st_mtime_ns >= rank0_path.stat().st_mtime_ns
        assert token.stat().st_mtime_ns >= rank1_path.stat().st_mtime_ns
        from audiocraft_tpu.utils.checkpoint import load_flat
        mine = load_flat(ckdir / checkpoint_name(rank=pid, use_fsdp=False))
        assert float(mine["w"][0]) == float(pid)
        print(f"OK {pid}")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o for o in outs), outs


def test_average_metrics_cross_process(tmp_path):
    """Host-side eval metrics must average across processes with batch-count
    weights so every host logs identical numbers and best-state selection
    agrees (`flashy.distrib.average_metrics`, `ref solvers/base.py:556`)."""
    script = HEADER + textwrap.dedent("""
        # rank 0 saw 3 batches averaging 1.0; rank 1 saw 1 batch of 5.0
        local = {"sisnr": 1.0 if pid == 0 else 5.0, "rvm": 2.0 * (pid + 1)}
        count = 3 if pid == 0 else 1
        out = distrib.average_metrics(local, count)
        expect_sisnr = (1.0 * 3 + 5.0 * 1) / 4
        expect_rvm = (2.0 * 3 + 4.0 * 1) / 4
        assert abs(out["sisnr"] - expect_sisnr) < 1e-9, out
        assert abs(out["rvm"] - expect_rvm) < 1e-9, out
        print(f"OK {pid} {out['sisnr']:.4f} {out['rvm']:.4f}")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o for o in outs), outs
    # both processes report the identical averaged values (find the OK line;
    # grpc teardown chatter may follow it)
    vals = {ln.split(" ", 2)[-1] for o in outs
            for ln in o.splitlines() if ln.startswith("OK ")}
    assert len(vals) == 1, outs


def test_average_metrics_per_key_weights(tmp_path):
    """A host whose shard couldn't produce a metric passes weight 0 for that
    key (e.g. too few FAD windows): the key set stays consistent for the
    allgather and the other host's value carries the mean."""
    script = HEADER + textwrap.dedent("""
        # both hosts have ce over `count` batches; only rank 1 produced fad
        local = {"ce": 2.0 if pid == 0 else 4.0,
                 "fad": 0.0 if pid == 0 else 7.5}
        count = 1
        out = distrib.average_metrics(
            local, count, weights={"fad": 0.0 if pid == 0 else 1.0})
        assert abs(out["ce"] - 3.0) < 1e-9, out
        assert abs(out["fad"] - 7.5) < 1e-9, out
        print(f"OK {pid} {out['ce']:.4f} {out['fad']:.4f}")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o for o in outs), outs
    vals = {ln.split(" ", 2)[-1] for o in outs
            for ln in o.splitlines() if ln.startswith("OK ")}
    assert len(vals) == 1, outs


def test_epoch_consistency_guard(tmp_path):
    """Out-of-sync restores must raise on every host
    (`ref solvers/base.py:389-397`)."""
    script = HEADER + textwrap.dedent("""
        distrib.check_epoch_consistency(3)  # consistent: no raise
        try:
            distrib.check_epoch_consistency(3 if pid == 0 else 5)
        except RuntimeError as e:
            print("OK", pid, "raised")
        else:
            print("FAIL", pid, "no raise")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o and "FAIL" not in o for o in outs), outs
