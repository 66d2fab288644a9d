"""THE composed multi-host test (VERDICT r3 #4): 2 processes x 4 CPU devices
each run sharded train steps on a dp=2/fsdp=2/tp=2 mesh, save a sharded
checkpoint through the `.tmp.done` two-phase protocol, restore it in both
processes, pass the epoch-consistency guard, continue bitwise-identically to
the uninterrupted run, and cross-host-average an eval metric — all verbs in
one flow (`audiocraft_tpu/parallel/composed_check.py`)."""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent.parent


def _run_two(script: str, tmp_path, timeout=420, local_devices=4):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
            TMPDIR=str(tmp_path))
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
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


def test_composed_train_checkpoint_restore_metrics(tmp_path):
    script = textwrap.dedent("""
        import os, sys
        pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path.insert(0, os.getcwd())
        import jax
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=2, process_id=pid)
        assert jax.device_count() == 8 and jax.local_device_count() == 4
        from audiocraft_tpu.parallel import distrib
        distrib._INITIALIZED = True
        from audiocraft_tpu.parallel.composed_check import run_composed_check
        out = run_composed_check(tmp)
        print(f"OK {pid} ce3={out['ce3']:.6f} "
              f"restored={out['ce3_restored']:.6f} avg={out['avg_ce']:.6f}")
    """)
    outs = _run_two(script, tmp_path)
    assert all("OK" in o for o in outs), outs
    # both processes computed identical losses and identical averaged metrics
    vals = {ln.split(" ", 2)[-1] for o in outs
            for ln in o.splitlines() if ln.startswith("OK ")}
    assert len(vals) == 1, outs
