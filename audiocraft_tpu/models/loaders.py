"""Checkpoint loading: exported AC checkpoints, HF hub dirs, torch conversion.

Parity: `audiocraft/models/loaders.py:40-268`. In a zero-egress environment
checkpoints must already be on disk: either our native orbax/npz exports or a
local HF snapshot (torch .bin/.safetensors) that gets converted through
`utils/torch_port.py`. `AUDIOCRAFT_CACHE_DIR` controls the default cache
location (`loaders.py:36`).
"""
import logging
import os
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)


def get_audiocraft_cache_dir() -> tp.Optional[str]:
    return os.environ.get("AUDIOCRAFT_CACHE_DIR", None)


def _resolve(name: str) -> Path:
    cache = get_audiocraft_cache_dir()
    p = Path(name)
    if p.exists():
        return p
    if cache is not None and (Path(cache) / name).exists():
        return Path(cache) / name
    raise FileNotFoundError(
        f"Checkpoint {name!r} not found locally. This environment has no "
        f"network egress; place an exported checkpoint or HF snapshot under "
        f"AUDIOCRAFT_CACHE_DIR and retry.")


def load_compression_model(name: str):
    """Load a compression model + variables from a local path
    (`loaders.py:78-109`). Accepts audiocraft exports (compression_state_dict
    / *.th) and HF EnCodec snapshot dirs (config.json + safetensors), the
    format MusicGen/AudioGen HF checkpoints ship their codec in."""
    path = _resolve(name)
    from ..utils import torch_port
    if path.is_dir() and (path / "config.json").exists():
        import json
        hf_cfg = json.loads((path / "config.json").read_text())
        if hf_cfg.get("model_type") == "encodec":
            return torch_port.load_hf_encodec_from_dir(path)
    return torch_port.load_compression_model_from_dir(path)


def load_lm_model(name: str):
    """Load (LMModel, params, cfg) from a local path (`loaders.py:111-127`)."""
    path = _resolve(name)
    from ..utils import torch_port
    return torch_port.load_lm_model_from_dir(path)


def load_lm_model_magnet(name: str, compression_model_frame_rate: int = 50):
    """MAGNeT LM loading (`loaders.py:129-156`): same package format with
    MAGNeT-specific cfg fixups (span masking / compression-model frame rate
    are runtime params, not weights)."""
    path = _resolve(name)
    from ..utils import torch_port
    model, params, cfg = torch_port.load_lm_model_from_dir(path)
    cfg.setdefault("masking", {})["span_len"] = cfg.get(
        "masking", {}).get("span_len", 3)
    cfg["compression_model_framerate"] = compression_model_frame_rate
    return model, params, cfg


def load_diffusion_models(name: str, filename: tp.Optional[str] = None):
    """Load the multi-band diffusion bundle (`loaders.py:181-204`): one
    (DiffusionUnet, params) + NoiseSchedule(processor) per band.

    The torch bundle layout is ``{'sample_rate', 'n_bands',
    i: {'cfg', 'model_state', 'processor_state'}}``. Returns
    ``(models, schedules, processor_states, cfgs, sample_rate)`` where
    ``models[i] = (DiffusionUnet, params)``."""
    import numpy as np
    from ..models.unet import DiffusionUnet
    from ..modules.diffusion_schedule import (MultiBandProcessor,
                                              NoiseSchedule, SampleProcessor)
    from ..utils import torch_port
    path = _resolve(name)
    if path.is_dir():
        cands = list(path.glob(filename or "*.th")) + list(path.glob("*.pt"))
        assert cands, f"no MBD checkpoint found in {path}"
        path = cands[0]
    import torch
    torch_port._ensure_omegaconf_importable()
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    sample_rate = pkg["sample_rate"]
    models, schedules, proc_states, cfgs = [], [], [], []
    for i in range(pkg["n_bands"]):
        cfg = torch_port._plain_container(pkg[i]["cfg"])
        unet_cfg = dict(cfg.get("diffusion_unet", {}))
        schedule_cfg = dict(cfg.get("schedule", {}))
        processor_cfg = dict(cfg.get("processor", {}))
        num_steps = schedule_cfg.get("num_steps", 1000)
        channels = cfg.get("channels", 1)
        allowed = set(DiffusionUnet.__dataclass_fields__)
        model = DiffusionUnet(
            chin=channels, num_steps=num_steps,
            **{k: v for k, v in unet_cfg.items() if k in allowed})
        state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                 for k, v in pkg[i]["model_state"].items()}
        params = torch_port.convert_diffusion_unet(
            state, depth=model.depth, emb_all_layers=model.emb_all_layers,
            bilstm=model.bilstm, use_transformer=model.use_transformer,
            cross_attention=model.cross_attention,
            res_blocks=model.res_blocks, codec_dim=model.codec_dim)
        use_proc = processor_cfg.pop("use", False)
        processor_cfg.pop("name", None)
        if use_proc:
            processor = MultiBandProcessor(sample_rate=sample_rate,
                                           **processor_cfg)
            proc_state = torch_port.convert_mbp_state(
                {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                 for k, v in pkg[i]["processor_state"].items()})
        else:
            processor = SampleProcessor()
            proc_state = None
        sched_allowed = {"beta_t0", "beta_t1", "num_steps", "variance",
                         "clip", "rescale", "beta_exp", "repartition",
                         "alpha_sigmoid", "n_bands", "noise_scale"}
        schedule = NoiseSchedule(
            sample_processor=processor,
            **{k: v for k, v in schedule_cfg.items() if k in sched_allowed})
        models.append((model, params))
        schedules.append(schedule)
        proc_states.append(proc_state)
        cfgs.append(cfg)
    return models, schedules, proc_states, cfgs, sample_rate


def load_audioseal_models(name: str, filename: str = "base"):
    """Load AudioSeal generator+detector (`loaders.py:206-268`): the torch
    layout is ``generator_<filename>.pth`` / ``detector_<filename>.pth``
    each holding ``{'model': state_dict}``, plus an optional
    ``<filename>.yaml`` config. Returns an `AudioSeal` wrapper + params."""
    import json
    import numpy as np
    from .watermark import AudioSeal, AudioSealDetector, AudioSealWM
    from ..utils import torch_port
    path = _resolve(name)
    assert path.is_dir(), f"expected an audioseal snapshot dir, got {path}"
    import torch

    def _state(fname):
        ckpt = torch.load(path / fname, map_location="cpu",
                          weights_only=True)
        assert "model" in ckpt, f"no model state dict in {path / fname}"
        return {k: v.numpy() for k, v in ckpt["model"].items()}

    gen_state = _state(f"generator_{filename}.pth")
    det_state = _state(f"detector_{filename}.pth")
    # config: audioseal ships yaml; accept json too (zero-dep parse)
    cfg: dict = {}
    jpath = path / f"{filename}.json"
    if jpath.exists():
        cfg = json.loads(jpath.read_text())
    seanet = cfg.get("seanet", {})
    nbits = cfg.get("nbits", 16)
    ratios = tuple(seanet.get("ratios", (8, 5, 4, 2)))
    dim = seanet.get("dimension", 128)
    n_filters = seanet.get("n_filters", 32)
    nres = seanet.get("n_residual_layers", 1)
    lstm = seanet.get("lstm", 2)
    output_dim = cfg.get("detector", {}).get("output_dim", 32)
    generator = AudioSealWM(nbits=nbits, dimension=dim, n_filters=n_filters,
                            n_residual_layers=nres, lstm=lstm, ratios=ratios)
    detector = AudioSealDetector(nbits=nbits, dimension=dim,
                                 output_dim=output_dim, n_filters=n_filters,
                                 n_residual_layers=nres, lstm=lstm,
                                 ratios=ratios)
    params = {
        "generator": torch_port.convert_audioseal_generator(
            gen_state, ratios=ratios, n_residual_layers=nres, lstm=lstm),
        "detector": torch_port.convert_audioseal_detector(
            det_state, ratios=ratios, n_residual_layers=nres, lstm=lstm),
    }
    model = AudioSeal(generator, detector, nbits=nbits)
    return model, params


def load_jasco_model(name: str, chords_mapping_path=None):
    """Load a JASCO flow-matching model: (model, params, cfg)
    (`loaders.py:158-179`)."""
    from . import builders
    from ..utils import torch_port
    path = _resolve(name)
    if path.is_dir():
        cands = list(path.glob("state_dict.bin")) + list(path.glob("*.th"))
        assert cands, f"no checkpoint found in {path}"
        path = cands[0]
    state, cfg = torch_port._load_torch_state(path)
    model = builders.get_jasco_model(cfg)
    specs = {}
    for cname, ccfg in dict(cfg.get("conditioners", {})).items():
        if cname == "args" or not isinstance(ccfg, dict):
            continue
        mtype = ccfg.get("model")
        specs[cname] = {"chords_emb": "chords_emb", "melody": "melody",
                        "drum_latents": "drums", "t5": "t5",
                        "lut": "lut"}.get(mtype, mtype)
    params = torch_port.convert_flow_matching_state(
        state, num_layers=model.num_layers, norm_first=model.norm_first,
        bias_proj=model.bias_proj, skip_connections=model.skip_connections,
        conditioner_specs=specs)
    if chords_mapping_path is not None:
        cfg["chords_mapping_path"] = str(chords_mapping_path)
    return model, params, cfg
