"""Grid declarations: job enumeration, binding semantics, CLI plan."""
import importlib

import pytest

from audiocraft_tpu.grids import BaseExplorer, Launcher

ALL_GRIDS = [
    "musicgen.musicgen_base_32khz",
    "musicgen.musicgen_base_cached_32khz",
    "musicgen.musicgen_melody_32khz",
    "musicgen.musicgen_stereo_finetune_32khz",
    "musicgen.musicgen_style_32khz",
    "musicgen.musicgen_clapemb_32khz",
    "musicgen.musicgen_pretrained_32khz_eval",
    "audiogen.audiogen_base_16khz",
    "audiogen.audiogen_pretrained_16khz_eval",
    "compression.debug",
    "compression.encodec_base_24khz",
    "compression.encodec_musicgen_32khz",
    "compression.encodec_audiogen_16khz",
    "magnet.magnet_32khz",
    "magnet.audio_magnet_16khz",
    "magnet.magnet_pretrained_32khz_eval",
    "magnet.audio_magnet_pretrained_16khz_eval",
    "diffusion.4_bands_base_32khz",
    "watermarking.audioseal",
    "watermarking.kbits",
]


@pytest.mark.parametrize("name", ALL_GRIDS)
def test_grid_collects_jobs(name):
    mod = importlib.import_module(f"audiocraft_tpu.grids.{name}")
    explorer = next(v for v in vars(mod).values()
                    if isinstance(v, BaseExplorer))
    jobs = explorer.collect()
    assert len(jobs) >= 1
    for job in jobs:
        assert job.solver is not None
        assert job.chips >= 1
        assert len(job.sig) == 8
        # argv round-trips into train-CLI overrides
        assert all("=" in a for a in job.argv())
    # signatures are stable across collections
    assert [j.sig for j in explorer.collect()] == [j.sig for j in jobs]


def test_launcher_bind_semantics():
    launcher = Launcher()
    launcher.bind_(solver="musicgen", **{"optim.lr": 1.0e-4})
    child = launcher.bind({"optim.lr": 2.0e-4})
    job_child = child()
    job_parent = launcher()
    # child override does not leak into the parent
    assert job_parent.overrides["optim.lr"] == 1.0e-4
    assert job_child.overrides["optim.lr"] == 2.0e-4
    # nested dicts flatten to dotted keys
    job = launcher.bind({"fsdp": {"use": True}})()
    assert job.overrides["fsdp.use"] is True
    # distinct overrides -> distinct signatures
    assert job_parent.sig != job_child.sig


def test_job_array_tags():
    launcher = Launcher()
    launcher.bind_(solver="musicgen")
    with launcher.job_array():
        launcher()
        launcher()
    launcher()
    jobs = launcher.jobs
    assert jobs[0].array_id == jobs[1].array_id == 1
    assert jobs[2].array_id is None


def test_cli_plan(capsys):
    from audiocraft_tpu.grids.__main__ import main
    jobs = main(["musicgen.musicgen_base_32khz"])
    out = capsys.readouterr().out
    assert "3 job(s)" in out
    assert len(jobs) == 3
    assert {j.chips for j in jobs} == {32, 64, 128}
