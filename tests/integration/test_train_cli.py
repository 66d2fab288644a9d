"""CLI-chained end-to-end smoke, the `make tests_integ` equivalent
(`ref Makefile:34-39`): real `python -m audiocraft_tpu.train` runs on
egs/example chaining a trained+exported codec into a MusicGen training,
through the config -> CLI -> solver -> checkpoint -> export seams."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent.parent


def _run(args, tmp_path, timeout=600):
    env = dict(os.environ)
    # JAX_PLATFORM_NAME too: the axon TPU plugin ignores JAX_PLATFORMS, and
    # dispatching these tiny runs over the TPU tunnel stalls for minutes.
    env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               AUDIOCRAFT_DORA_DIR=str(tmp_path / "dora"),
               AUDIOCRAFT_COMPILE_CACHE=str(tmp_path / "xla_cache"),
               XLA_FLAGS="")
    proc = subprocess.run([sys.executable, *args], env=env, cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, f"{' '.join(args)} failed:\n{proc.stdout}"
    return proc.stdout


@pytest.mark.integration
def test_cli_compression_to_musicgen_chain(tmp_path):
    dora = tmp_path / "dora"

    # 1. train the debug codec on the shipped example manifest (CLI)
    _run(["-m", "audiocraft_tpu.train", "solver=compression/debug",
          "dset=audio/example", "sample_rate=32000",
          "encodec.sample_rate=32000",
          "optim.epochs=1", "optim.updates_per_epoch=2",
          "dataset.batch_size=2", "dataset.num_workers=0",
          "dataset.train.num_samples=4", "dataset.valid.num_samples=2",
          "dataset.evaluate.num_samples=2", "dataset.generate.num_samples=2"],
         tmp_path)
    xps = sorted((dora / "xps").iterdir())
    assert len(xps) == 1, f"expected one xp, got {xps}"
    comp_xp = xps[0]
    assert (comp_xp / "checkpoint.th").exists()
    assert json.loads((comp_xp / "config.json").read_text())[
        "solver"] == "compression"

    # 2. export the trained codec into the standalone inference format
    exported = tmp_path / "exported_codec.npz"
    _run(["-c", (
        "import sys; sys.argv=['export']\n"
        "from audiocraft_tpu.train import get_solver_from_sig\n"
        "from audiocraft_tpu.utils.export import export_encodec, "
        "encodec_model_cfg\n"
        f"solver = get_solver_from_sig({comp_xp.name!r})\n"
        "assert solver.restore(), 'no checkpoint restored'\n"
        "export_encodec(solver.state.gen_vars, "
        f"encodec_model_cfg(solver.model), {str(exported)!r})\n")],
         tmp_path)
    assert exported.exists()

    # 3. train a MusicGen LM against the exported codec (CLI), ending with
    #    the evaluate + generate stages on the last epoch
    out = _run(["-m", "audiocraft_tpu.train", "solver=musicgen/debug",
                "dset=audio/example",
                f"compression_model_checkpoint={exported}",
                # LM shape must match the exported codec, as in the
                # reference chain (`ref Makefile:6-7`)
                "transformer_lm.n_q=2", "transformer_lm.card=48",
                "optim.epochs=1", "optim.updates_per_epoch=2",
                "dataset.batch_size=2", "dataset.num_workers=0",
                "dataset.segment_duration=1", "dataset.train.num_samples=4",
                "dataset.valid.num_samples=2",
                "dataset.evaluate.num_samples=2",
                "dataset.generate.num_samples=2",
                "generate.lm.gen_duration=0.5"],
               tmp_path)
    lm_xps = [p for p in sorted((dora / "xps").iterdir()) if p != comp_xp]
    assert len(lm_xps) == 1, f"expected one LM xp, got {lm_xps}"
    lm_xp = lm_xps[0]
    assert (lm_xp / "checkpoint.th").exists()
    # the generate stage stored samples through the SampleManager
    wavs = list((lm_xp / "samples").rglob("*.wav"))
    assert wavs, f"no generated samples under {lm_xp}:\n{out}"
    # history carries train + evaluate metrics
    sidecar = json.loads((lm_xp / "checkpoint.th.json").read_text())
    history = sidecar.get("history") or []
    assert history and "train" in history[-1], history
    assert np.isfinite(history[-1]["train"].get("ce", np.inf))

    # 4. AudioGen against the same exported codec (`ref Makefile:8-9`)
    _run(["-m", "audiocraft_tpu.train", "solver=audiogen/debug",
          "dset=audio/example", "sample_rate=32000",
          f"compression_model_checkpoint={exported}",
          "transformer_lm.n_q=2", "transformer_lm.card=48",
          "optim.epochs=1", "optim.updates_per_epoch=2",
          "dataset.batch_size=2", "dataset.num_workers=0",
          "dataset.segment_duration=1", "dataset.train.num_samples=4",
          "dataset.valid.num_samples=2", "dataset.evaluate.num_samples=2",
          "dataset.generate.num_samples=2", "generate.lm.gen_duration=0.5"],
         tmp_path)
    ag_xps = [p for p in sorted((dora / "xps").iterdir())
              if p not in (comp_xp, lm_xp)]
    assert len(ag_xps) == 1 and (ag_xps[0] / "checkpoint.th").exists()


@pytest.mark.integration
def test_cli_mbd_and_watermark(tmp_path):
    """`ref Makefile:10-14`: MBD diffusion and watermark debug trainings
    through the same CLI surface."""
    _run(["-m", "audiocraft_tpu.train", "solver=diffusion/debug",
          "dset=audio/example", "optim.epochs=1",
          "optim.updates_per_epoch=2", "dataset.batch_size=2",
          "dataset.num_workers=0", "dataset.train.num_samples=4",
          "dataset.valid.num_samples=2", "dataset.evaluate.num_samples=2",
          "dataset.generate.num_samples=2"], tmp_path)
    _run(["-m", "audiocraft_tpu.train", "solver=watermark/debug",
          "dset=audio/example", "optim.epochs=1",
          "optim.updates_per_epoch=2", "dataset.batch_size=2",
          "dataset.num_workers=0", "dataset.train.num_samples=4",
          "dataset.valid.num_samples=2", "dataset.evaluate.num_samples=2",
          "dataset.generate.num_samples=2"], tmp_path)
    xps = sorted((tmp_path / "dora" / "xps").iterdir())
    assert len(xps) == 2
    for xp in xps:
        assert (xp / "checkpoint.th").exists(), xp


@pytest.mark.integration
def test_cli_rerun_resumes_from_checkpoint(tmp_path):
    """Re-running the identical command resumes the XP from checkpoint.th
    (`ref docs/TRAINING.md:284-288`: Dora reuses the XP folder)."""
    args = ["-m", "audiocraft_tpu.train", "solver=musicgen/debug",
            "dset=audio/example", "compression_model_checkpoint=debug",
            "optim.epochs=2", "optim.updates_per_epoch=2",
            "dataset.batch_size=2", "dataset.num_workers=0",
            "dataset.segment_duration=1", "dataset.train.num_samples=4",
            "dataset.valid.num_samples=2", "dataset.evaluate.num_samples=2",
            "dataset.generate.num_samples=2", "generate.lm.gen_duration=0.5"]
    out1 = _run(args, tmp_path)
    assert "Restored" not in out1
    xps = sorted((tmp_path / "dora" / "xps").iterdir())
    assert len(xps) == 1
    sidecar = json.loads((xps[0] / "checkpoint.th.json").read_text())
    assert sidecar["epoch"] == 2 and len(sidecar["history"]) == 2

    out2 = _run(args, tmp_path)  # same sig -> restore, nothing left to train
    assert "Restored" in out2
    assert "Starting epoch" not in out2
    sidecar2 = json.loads((xps[0] / "checkpoint.th.json").read_text())
    assert sidecar2["epoch"] == 2 and len(sidecar2["history"]) == 2


@pytest.mark.integration
def test_cli_single_stage_and_bad_override(tmp_path):
    """--run_stage executes exactly one stage; an unknown solver fails
    loudly (CLI arg-surface checks)."""
    _run(["-m", "audiocraft_tpu.train", "solver=musicgen/debug",
          "dset=audio/example", "compression_model_checkpoint=debug",
          "dataset.batch_size=2", "dataset.num_workers=0",
          "dataset.segment_duration=1", "dataset.evaluate.num_samples=2",
          "--run_stage", "evaluate"], tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               AUDIOCRAFT_DORA_DIR=str(tmp_path / "dora2"))
    proc = subprocess.run(
        [sys.executable, "-m", "audiocraft_tpu.train", "solver=nonexistent"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=120)
    assert proc.returncode != 0
