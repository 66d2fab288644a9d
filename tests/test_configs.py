"""Config-tree coverage: every yaml composes, and every solver config
builds its model objects from yaml alone (`ref config/` tree,
`docs/TRAINING.md:206-219`)."""
from pathlib import Path

import pytest

from audiocraft_tpu.config import CONFIG_ROOT, load_config

ALL_YAMLS = sorted(p.relative_to(CONFIG_ROOT).with_suffix("")
                   for p in CONFIG_ROOT.rglob("*.yaml"))
SOLVER_CONFIGS = sorted(
    str(p.relative_to(CONFIG_ROOT).with_suffix("")).replace("\\", "/")
    for p in (CONFIG_ROOT / "solver").rglob("*.yaml")
    if "evaluation" not in p.parts and p.stem != "default")


def test_tree_size():
    # the reference ships ~68 group yamls; ours must be comparable
    assert len(ALL_YAMLS) >= 40, f"config tree too small: {len(ALL_YAMLS)}"


@pytest.mark.parametrize("name", [str(p).replace("\\", "/")
                                  for p in ALL_YAMLS])
def test_yaml_composes(name):
    cfg = load_config(name)
    assert isinstance(cfg, dict)


def _tiny_lm_overrides(cfg):
    cfg["transformer_lm"].update(dim=16, num_heads=2, num_layers=1)
    # avoid heavyweight external towers in construction-only tests
    conds = cfg.get("conditioners", {})
    for cname, ccfg in list(conds.items()):
        if not isinstance(ccfg, dict):
            continue
        if ccfg.get("model") == "t5":
            ccfg["t5"]["name"] = "t5-small"
    return cfg


@pytest.mark.parametrize("name", SOLVER_CONFIGS)
def test_solver_config_builds_model(name):
    from audiocraft_tpu.models import builders

    cfg = load_config(name)
    solver = cfg.get("solver")
    assert solver, f"{name} missing solver key"
    if solver == "compression":
        model = builders.get_compression_model(cfg)
        assert model.sample_rate == cfg["sample_rate"]
        hop = 1
        for r in cfg["encodec"]["seanet"]["ratios"]:
            hop *= r
        assert model.frame_rate == cfg["sample_rate"] // hop
    elif solver in ("musicgen", "audiogen", "magnet", "audio_magnet"):
        cfg = _tiny_lm_overrides(cfg)
        model = builders.get_lm_model(cfg)
        assert model.n_q == cfg["transformer_lm"]["n_q"]
        assert model.card == cfg["transformer_lm"]["card"]
        fuse = cfg["fuser"]
        for method in ("cross", "prepend"):
            for cond in fuse.get(method, []):
                assert cond in cfg["conditioners"], \
                    f"{name}: fused condition {cond} has no conditioner"
    elif solver == "jasco":
        cfg = _tiny_lm_overrides(cfg)
        model = builders.get_jasco_model(cfg)
        assert model.cross_attention
        for cond in cfg["fuser"].get("ignore", []):
            assert cond in cfg["conditioners"]
    elif solver == "diffusion":
        from audiocraft_tpu.models.unet import DiffusionUnet
        ucfg = dict(cfg["diffusion_unet"])
        allowed = set(DiffusionUnet.__dataclass_fields__)
        model = DiffusionUnet(
            chin=cfg.get("channels", 1),
            num_steps=cfg["schedule"]["num_steps"],
            **{k: v for k, v in ucfg.items() if k in allowed})
        assert model.depth == ucfg["depth"]
    elif solver == "watermarking":
        from audiocraft_tpu.models.watermark import (AudioSealDetector,
                                                     AudioSealWM)
        seanet = cfg.get("seanet", {})
        gen = AudioSealWM(nbits=cfg["audioseal"]["nbits"],
                          dimension=seanet.get("dimension", 128),
                          n_filters=seanet.get("n_filters", 32),
                          ratios=tuple(seanet.get("ratios", (8, 5, 4, 2))))
        det = AudioSealDetector(nbits=cfg["audioseal"]["nbits"])
        assert gen.nbits == det.nbits
    else:
        pytest.fail(f"unknown solver {solver} in {name}")


def test_score_model_group_composes_into_diffusion_solver():
    """`configs/model/score/basic.yaml` must be the source of the diffusion
    solver's unet + noise schedule (the group exists for MBD; a solver that
    shadowed it entirely would make the group dead config)."""
    import yaml
    score = load_config("model/score/basic")
    solver = load_config("solver/diffusion/default")
    root = Path(__file__).parent.parent / "configs"
    raw = yaml.safe_load(
        (root / "solver/diffusion/default.yaml").read_text())
    own = set((raw.get("diffusion_unet") or {}))  # solver-level overrides
    for key, val in score["diffusion_unet"].items():
        assert key in solver["diffusion_unet"], key
        if key not in own:
            assert solver["diffusion_unet"][key] == val, key
    assert solver["schedule"]["repartition"] == \
        score["schedule"]["repartition"]
    assert solver["schedule"]["variable_step_batch"] == \
        score["schedule"]["variable_step_batch"]


def test_example_dset_manifest():
    import json
    root = Path(__file__).parent.parent
    cfg = load_config("dset/audio/example")
    manifest = root / cfg["datasource"]["train"] / "data.jsonl"
    assert manifest.exists()
    lines = [json.loads(line) for line in manifest.read_text().splitlines()]
    assert len(lines) >= 2
    for meta in lines:
        assert (root / meta["path"]).exists()


def test_example_dataset_loads_audio():
    from audiocraft_tpu.data.audio_dataset import AudioDataset
    root = Path(__file__).parent.parent
    ds = AudioDataset.from_meta(root / "egs/example/data.jsonl",
                                segment_duration=1.0, sample_rate=32000,
                                channels=1, num_samples=4, pad=True)
    wav = ds[0]
    assert wav.shape == (1, 32000)
