"""Import the upstream reference (``/root/reference``) with its missing
third-party deps stubbed out, so numerical-parity tests can run the
*actual* reference torch code on CPU.

The image ships torch (CPU) but not soundfile/av/torchaudio/julius/
omegaconf/flashy/etc.  The reference's numeric modules (transformer,
seanet, lm, quantization, unet, watermark, flow_matching) only touch
those deps on IO / training paths we never exercise, so module-level
stubs are sufficient.  Anything that *does* reach into a stub raises
loudly at call time rather than silently diverging.

This is test-only scaffolding: nothing under ``audiocraft_tpu/`` imports
the reference.
"""
import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUBBED = False


class _AnyType:
    """Placeholder for classes referenced only in annotations/isinstance."""

    def __init__(self, *a, **k):
        raise RuntimeError("reference stub class instantiated in parity test")


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # behave as a package for submodule imports
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    global _STUBBED
    if _STUBBED:
        return
    _STUBBED = True
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    _stub("soundfile")
    _stub("av")

    # torchaudio: referenced for IO and mel transforms only.
    ta = _stub("torchaudio")
    ta_f = _stub("torchaudio.functional")
    ta_t = _stub("torchaudio.transforms", MelSpectrogram=_AnyType,
                 MelScale=_AnyType, Spectrogram=_AnyType)
    ta.functional = ta_f
    ta.transforms = ta_t

    # julius: resampling / lowpass used in audio utils + chroma; parity
    # tests never resample through the reference.
    _stub("julius", resample_frac=None, ResampleFrac=_AnyType,
          SplitBands=_AnyType, split_bands=None,
          lowpass_filter=None, LowPassFilter=_AnyType,
          lowpass_filters=None, LowPassFilters=_AnyType,
          highpass_filter=None, highpass_filters=None,
          fft_conv1d=None, FFTConv1d=_AnyType)

    # omegaconf: config containers; parity tests build models directly.
    class _DictConfig(dict):
        pass

    class _ListConfig(list):
        pass

    class _OmegaConf:
        @staticmethod
        def create(x=None):
            return _DictConfig(x or {})

        @staticmethod
        def to_container(x, resolve=True):
            return dict(x)

        @staticmethod
        def is_config(x):
            return isinstance(x, (_DictConfig, _ListConfig))

    _stub("omegaconf", DictConfig=_DictConfig, ListConfig=_ListConfig,
          OmegaConf=_OmegaConf, MISSING="???")

    # flashy: the reference's training framework; only distrib helpers are
    # touched at import time in a few modules.
    flashy = _stub("flashy")
    distrib = _stub("flashy.distrib",
                    rank=lambda: 0, world_size=lambda: 1,
                    is_rank_zero=lambda: True,
                    broadcast_tensors=lambda *a, **k: None,
                    average_tensors=lambda *a, **k: None,
                    sync_model=lambda *a, **k: None)
    flashy.distrib = distrib
    flashy.state = _stub("flashy.state")

    # misc optional deps referenced at import time somewhere in the tree
    for name in ("num2words", "spacy", "demucs", "demucs.apply",
                 "demucs.audio", "demucs.pretrained", "xformers",
                 "xformers.ops", "transformers_stub"):
        if name not in sys.modules:
            _stub(name)
    sys.modules["num2words"].num2words = lambda n, **k: str(n)

    # xformers.ops: the reference's custom-MHA path only needs unbind
    # (a thin torch wrapper); attention kernels stay unavailable so
    # memory_efficient_attention=True configs fail loudly.
    import torch as _torch
    sys.modules["xformers.ops"].unbind = (
        lambda x, dim=0: _torch.unbind(x, dim=dim))
    sys.modules["xformers"].ops = sys.modules["xformers.ops"]


def import_reference(module: str):
    """Import ``audiocraft.<module>`` (or a fully-qualified name) from the
    read-only reference checkout, with stubs installed."""
    _install_stubs()
    if not module.startswith("audiocraft"):
        module = "audiocraft." + module
    import re
    for _ in range(40):
        try:
            return importlib.import_module(module)
        except ModuleNotFoundError as e:  # auto-stub stragglers
            if e.name in sys.modules:
                raise
            _stub(e.name)
        except ImportError as e:
            # "cannot import name 'x' from 'stubmod'": add a sub-stub attr
            m = re.match(r"cannot import name '(\w+)' from '([\w.]+)'", str(e))
            if not m or m.group(2) not in sys.modules:
                raise
            name, parent = m.group(1), m.group(2)
            if hasattr(sys.modules[parent], name):
                raise
            child = _stub(f"{parent}.{name}")
            setattr(sys.modules[parent], name, child)
    raise RuntimeError(f"could not import {module}")
