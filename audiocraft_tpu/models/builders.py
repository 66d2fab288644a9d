"""Config -> model factories.

Parity: `audiocraft/models/builders.py:70-397`. Configs are plain nested
dicts/dataclasses (our config system, `audiocraft_tpu/config.py`) instead of
OmegaConf; the factory surface matches the reference so training configs map
one-to-one.
"""
import logging
import typing as tp

import jax
import jax.numpy as jnp

from .. import quantization as qt
from ..modules.conditioners import (BaseConditioner, ConditionFuser,
                                    LUTConditioner, T5Conditioner)
from ..modules.patterns import (CodebooksPatternProvider, CoarseFirstPattern,
                                DelayedPatternProvider, MusicLMPattern,
                                ParallelPatternProvider, UnrolledPatternProvider)
from ..modules.seanet import SEANetDecoder, SEANetEncoder
from .encodec import CompressionModel, EncodecModel, InterleaveStereoCompressionModel
from .lm import LMModel

logger = logging.getLogger(__name__)


def _get(cfg, key, default=None):
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def dict_from_config(cfg) -> dict:
    if cfg is None:
        return {}
    if isinstance(cfg, dict):
        return dict(cfg)
    return dict(cfg.__dict__)


def get_quantizer(quantizer: str, cfg, dimension: int) -> qt.BaseQuantizer:
    """`builders.py:45-57`."""
    klass = {"no_quant": qt.DummyQuantizer, "rvq": qt.ResidualVectorQuantizer}[quantizer]
    kwargs = dict_from_config(_get(cfg, quantizer, {}))
    if quantizer != "no_quant":
        kwargs["dimension"] = dimension
        return qt.ResidualVectorQuantizer(**kwargs)
    return qt.DummyQuantizer()


def get_encodec_autoencoder(encoder_name: str, cfg):
    """`builders.py:60-67`."""
    if encoder_name == "seanet":
        kwargs = dict_from_config(_get(cfg, "seanet", {}))
        encoder_override_kwargs = kwargs.pop("encoder", {})
        decoder_override_kwargs = kwargs.pop("decoder", {})
        for k in ("ratios", "kernel_sizes", "dilations"):
            if k in kwargs and isinstance(kwargs[k], list):
                kwargs[k] = tuple(kwargs[k])
        encoder_kwargs = {**kwargs, **encoder_override_kwargs}
        decoder_kwargs = {**kwargs, **decoder_override_kwargs}
        encoder = SEANetEncoder(**encoder_kwargs)
        decoder = SEANetDecoder(**decoder_kwargs)
        return encoder, decoder
    raise KeyError(f"Unexpected compression model {encoder_name}")


def get_compression_model(cfg) -> EncodecModel:
    """Config -> EncodecModel (`builders.py:70-95`). Returns the *model*;
    call `.init(rng)` for variables."""
    if _get(cfg, "compression_model") == "encodec":
        kwargs = dict_from_config(_get(cfg, "encodec", {}))
        encoder_name = kwargs.pop("autoencoder")
        quantizer_name = kwargs.pop("quantizer")
        encoder, decoder = get_encodec_autoencoder(encoder_name, kwargs)
        quantizer = get_quantizer(quantizer_name, kwargs, encoder.dimension)
        frame_rate = kwargs["sample_rate"] // encoder.hop_length
        renormalize = kwargs.pop("renormalize", False)
        kwargs.pop("renorm", None)  # deprecated params
        for k in ("autoencoder", "quantizer", "seanet", "rvq", "no_quant"):
            kwargs.pop(k, None)
        return EncodecModel(encoder, decoder, quantizer, frame_rate=frame_rate,
                            renormalize=renormalize,
                            sample_rate=kwargs["sample_rate"],
                            channels=kwargs["channels"],
                            causal=kwargs.get("causal", False))
    raise KeyError(f"Unexpected compression model {_get(cfg, 'compression_model')}")


def get_condition_fuser(cfg) -> ConditionFuser:
    """`builders.py:224-237`."""
    fuser_cfg = dict_from_config(_get(cfg, "fuser", {}))
    fuser_methods = ["sum", "cross", "prepend", "ignore", "input_interpolate"]
    fuse2cond = {k: fuser_cfg.get(k, []) for k in fuser_methods if k in fuser_cfg}
    kwargs = {k: v for k, v in fuser_cfg.items() if k not in fuser_methods}
    return ConditionFuser(fuse2cond=fuse2cond, **kwargs)


def get_conditioners(output_dim: int, cfg) -> tp.Dict[str, BaseConditioner]:
    """`builders.py:178-221`; returns the dict the LMModel embeds."""
    dict_cfg = dict_from_config(_get(cfg, "conditioners", {}))
    conditioners: tp.Dict[str, BaseConditioner] = {}
    dict_cfg.pop("args", None)
    for cond, cond_cfg in dict_cfg.items():
        model_type = cond_cfg["model"]
        model_args = dict(cond_cfg[model_type])
        if model_type == "t5":
            model_args.pop("device", None)
            if "name" in model_args:  # flax reserves `name` (see T5Conditioner)
                model_args["model_name"] = model_args.pop("name")
            conditioners[str(cond)] = T5Conditioner(output_dim=output_dim, **model_args)
        elif model_type == "lut":
            conditioners[str(cond)] = LUTConditioner(output_dim=output_dim, **model_args)
        elif model_type == "chroma_stem":
            from ..modules.conditioners import ChromaStemConditioner
            model_args.pop("device", None)
            conditioners[str(cond)] = ChromaStemConditioner(
                output_dim=output_dim, **model_args)
        elif model_type == "style":
            from ..modules.conditioners import StyleConditioner
            model_args.pop("device", None)
            conditioners[str(cond)] = StyleConditioner(
                output_dim=output_dim, **model_args)
        elif model_type == "clap":
            from ..modules.conditioners import CLAPEmbeddingConditioner
            model_args.pop("device", None)
            model_args.pop("cache_path", None)
            model_args.pop("attribute", None)   # passed explicitly below
            model_args.pop("kmeans_iters", None)  # RVQ uses EMA re-init here
            conditioners[str(cond)] = CLAPEmbeddingConditioner(
                output_dim=output_dim, attribute=str(cond), **model_args)
        elif model_type in ("chords_emb", "drum_latents", "melody"):
            # JASCO symbolic/latent conditioners (`builders.py:206-211`)
            from ..modules.jasco_conditioners import (ChordsEmbConditioner,
                                                      DrumsConditioner,
                                                      MelodyConditioner)
            model_args.pop("device", None)
            model_args.pop("cache_path", None)
            if model_type == "chords_emb":
                conditioners[str(cond)] = ChordsEmbConditioner(
                    card=model_args["card"], out_dim=model_args["out_dim"])
            elif model_type == "melody":
                conditioners[str(cond)] = MelodyConditioner(
                    card=model_args["card"],
                    output_dim=model_args["out_dim"])
            else:
                out_dim = model_args.pop("out_dim")
                conditioners[str(cond)] = DrumsConditioner(
                    output_dim=out_dim,
                    **{k: v for k, v in model_args.items()
                       if k in ("sample_rate", "blurring_factor",
                                "compression_model_latent_dim",
                                "compression_model_framerate",
                                "segment_duration")})
        else:
            raise ValueError(f"Unrecognized conditioning model: {model_type}")
    return conditioners


def get_codebooks_pattern_provider(n_q: int, cfg) -> CodebooksPatternProvider:
    """`builders.py:240-254`."""
    pattern_providers = {
        "parallel": ParallelPatternProvider,
        "delay": DelayedPatternProvider,
        "unroll": UnrolledPatternProvider,
        "coarse_first": CoarseFirstPattern,
        "musiclm": MusicLMPattern,
    }
    name = _get(cfg, "modeling")
    kwargs = dict_from_config(_get(cfg, name, {})) if _get(cfg, name) is not None else {}
    klass = pattern_providers[name]
    return klass(n_q, **kwargs)


def get_lm_model(cfg) -> LMModel:
    """Config -> LMModel (`builders.py:136-175`)."""
    lm_model = _get(cfg, "lm_model", "transformer_lm")
    if lm_model in ["transformer_lm", "transformer_lm_magnet"]:
        kwargs = dict_from_config(_get(cfg, "transformer_lm", {}))
        n_q = kwargs["n_q"]
        q_modeling = kwargs.pop("q_modeling", None)
        # lr/weight_decay are optimizer-group overrides consumed by the
        # solver (`ref transformer.py:715-721`), not model fields
        kwargs.pop("lr", None)
        kwargs.pop("weight_decay", None)
        kwargs.pop("emb_lr", None)
        codebooks_pattern_cfg = _get(cfg, "codebooks_pattern")
        cls_free_guidance = dict_from_config(_get(cfg, "classifier_free_guidance", {}))
        cfg_coef = cls_free_guidance.get("inference_coef", 1.0)
        fuser = get_condition_fuser(cfg)
        conditioners = get_conditioners(kwargs["dim"], cfg)
        if len(fuser.fuse2cond.get("cross", [])) > 0:
            kwargs["cross_attention"] = True
        if _get(codebooks_pattern_cfg, "modeling") is None:
            assert q_modeling is not None
            codebooks_pattern_cfg = {"modeling": q_modeling,
                                     "delay": {"delays": list(range(n_q))}}
        pattern_provider = get_codebooks_pattern_provider(n_q, codebooks_pattern_cfg)
        # attention backend selection (`builders.py:141-144` reads
        # cfg.efficient_attention_backend for torch-vs-xformers; here it
        # picks xla vs the pallas flash-decode kernel)
        backend = _get(cfg, "efficient_attention_backend", None)
        if backend is not None:
            from ..modules.transformer import set_efficient_attention_backend
            set_efficient_attention_backend(
                {"torch": "xla", "xformers": "pallas"}.get(backend, backend))
        # drop reference-only kwargs that have no TPU equivalent
        for k in ("custom", "memory_efficient", "norm", "emb_lr"):
            kwargs.pop(k, None)
        dtype = kwargs.pop("dtype", None)
        if lm_model == "transformer_lm_magnet":
            from .lm_magnet import MagnetLMModel
            lm_class: tp.Any = MagnetLMModel
        else:
            lm_class = LMModel
        return lm_class(
            pattern_provider=pattern_provider, conditioners=conditioners,
            fuser=fuser, cfg_coef=cfg_coef,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            **kwargs)
    raise KeyError(f"Unexpected LM model {lm_model}")


def get_wrapped_compression_model(compression_model: CompressionModel, cfg
                                  ) -> CompressionModel:
    """Stereo interleave + n_q clamp wrappers (`builders.py:338-354`)."""
    interleave_cfg = _get(cfg, "interleave_stereo_codebooks", None)
    if interleave_cfg is not None and _get(interleave_cfg, "use", False):
        kwargs = dict_from_config(interleave_cfg)
        kwargs.pop("use", None)
        compression_model = InterleaveStereoCompressionModel(compression_model, **kwargs)
    n_q = _get(cfg, "compression_model_n_q", None)
    if n_q is not None:
        compression_model.set_num_codebooks(n_q)
    return compression_model


# ------------------------------------------------------------ debug models

def get_debug_compression_model(sample_rate: int = 32000
                                ) -> tp.Tuple[EncodecModel, tp.Any]:
    """Tiny codec for unit tests (`builders.py:255-287`). Returns
    (model, variables) with a randomly-initialized (non-kmeans) codebook."""
    assert sample_rate in [16000, 32000]
    model_ratios = {16000: (10, 8, 8), 32000: (10, 8, 16)}  # 25 Hz
    ratios = model_ratios[sample_rate]
    frame_rate = 25
    seanet_kwargs: dict = dict(n_filters=4, n_residual_layers=1, dimension=32,
                               ratios=ratios)
    encoder = SEANetEncoder(**seanet_kwargs)
    decoder = SEANetDecoder(**seanet_kwargs)
    quantizer = qt.ResidualVectorQuantizer(dimension=32, bins=400, n_q=4,
                                           kmeans_init=False)
    model = EncodecModel(encoder, decoder, quantizer, frame_rate=frame_rate,
                         sample_rate=sample_rate, channels=1)
    variables = model.init(jax.random.PRNGKey(0), segment_length=sample_rate // 10)
    return model, variables


def get_debug_lm_model() -> tp.Tuple[LMModel, tp.Any]:
    """Tiny LM for unit tests (`builders.py:308-336`). Returns (model, params)."""
    from .lm import init_lm_params
    pattern = DelayedPatternProvider(n_q=4)
    dim = 16
    conditioners: tp.Dict[str, BaseConditioner] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "input_interpolate": []})
    model = LMModel(pattern_provider=pattern, conditioners=conditioners,
                    fuser=fuser, n_q=4, card=400, dim=dim, num_heads=4,
                    num_layers=2, cross_attention=True, causal=True)
    params = init_lm_params(model, jax.random.PRNGKey(0))
    return model, params


def get_debug_stereo_lm_model() -> tp.Tuple[LMModel, tp.Any]:
    """Tiny LM over interleaved stereo codebooks (2x mono n_q)."""
    from .lm import init_lm_params
    dim = 16
    conditioners: tp.Dict[str, BaseConditioner] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "input_interpolate": []})
    model = LMModel(pattern_provider=DelayedPatternProvider(n_q=8),
                    conditioners=conditioners, fuser=fuser, n_q=8, card=400,
                    dim=dim, num_heads=4, num_layers=2, cross_attention=True,
                    causal=True)
    params = init_lm_params(model, jax.random.PRNGKey(0))
    return model, params


def get_debug_magnet_lm_model() -> tp.Tuple["LMModel", tp.Any]:
    """Tiny MAGNeT LM for unit tests: parallel pattern, non-causal."""
    from .lm import init_lm_params
    from .lm_magnet import MagnetLMModel
    dim = 16
    conditioners: tp.Dict[str, BaseConditioner] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "input_interpolate": []})
    model = MagnetLMModel(
        pattern_provider=ParallelPatternProvider(n_q=4),
        conditioners=conditioners, fuser=fuser, n_q=4, card=400, dim=dim,
        num_heads=4, num_layers=2, cross_attention=True, causal=False,
        subcodes_context=5, compression_model_framerate=25,
        segment_duration=10, span_len=3)
    params = init_lm_params(model, jax.random.PRNGKey(0))
    return model, params


def get_jasco_model(cfg, compression_model=None) -> "tp.Any":
    """Config -> FlowMatchingModel (`ref builders.py:94-137`). Returns the
    flax module; params come from torch conversion or init."""
    from .flow_matching import FlowMatchingModel
    kwargs = dict_from_config(_get(cfg, "transformer_lm", {}))
    fuser = get_condition_fuser(cfg)
    conditioners = get_conditioners(kwargs.get("dim", 512), cfg)
    if len(fuser.fuse2cond.get("cross", [])) > 0:
        kwargs["cross_attention"] = True
    kwargs.pop("n_q", None)
    kwargs.pop("card", None)
    cfg_coef = dict_from_config(
        _get(cfg, "classifier_free_guidance", {})).get("inference_coef", 1.0)
    allowed = {f.name for f in FlowMatchingModel.__dataclass_fields__.values()} \
        if hasattr(FlowMatchingModel, "__dataclass_fields__") else set()
    dropped = {k for k in kwargs if k not in allowed}
    if dropped:
        logger.debug("get_jasco_model: dropping unsupported kwargs %s", dropped)
    kwargs = {k: v for k, v in kwargs.items() if k in allowed}
    return FlowMatchingModel(conditioners=conditioners, fuser=fuser,
                             cfg_coef=cfg_coef, **kwargs)


def get_debug_jasco_model():
    """Tiny JASCO for unit tests: flow-matching over debug-codec latents."""
    import jax.numpy as jnp
    from ..modules.jasco_conditioners import ChordsEmbConditioner
    from .flow_matching import FlowMatchingModel
    from .jasco import JASCO

    compression_model, compression_vars = get_debug_compression_model(32000)
    dim = 16
    chords_dim = 8
    conditioners: tp.Dict[str, tp.Any] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
        "chords": ChordsEmbConditioner(card=194, out_dim=chords_dim),
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "ignore": ["chords"],
                            "input_interpolate": []})
    model = FlowMatchingModel(
        conditioners=conditioners, fuser=fuser, dim=dim, num_heads=4,
        flow_dim=32, chords_dim=chords_dim, num_layers=2,
        skip_connections=True, norm_first=True)
    # init
    from ..modules.conditioners import (ConditioningAttributes,
                                        SymbolicCondition)
    from ..modules.jasco_conditioners import JascoConditioningProvider
    import numpy as np
    attrs = [ConditioningAttributes(
        text={"description": "init"},
        symbolic={"chords": SymbolicCondition(
            frame_chords=np.zeros((8,), np.int32))})]
    provider = JascoConditioningProvider(conditioners, sequence_length=8)
    tokenized = provider.tokenize(attrs)
    latents = jnp.zeros((1, 8, 32))
    params = model.init(jax.random.PRNGKey(0), latents, jnp.zeros((1,)),
                        tokenized, method=FlowMatchingModel.init_all)
    import tempfile
    return JASCO("debug", compression_model, compression_vars, model, params,
                 max_duration=1.0)


def get_debug_style_lm_model() -> tp.Tuple["LMModel", tp.Any]:
    """Tiny style-conditioned LM (MusicGen-Style shape: style tokens
    prepended, text cross-attended) for unit tests."""
    import numpy as np
    import jax.numpy as jnp
    from .lm import init_lm_params, tokenize_conditions, LMModel as LM
    from ..modules.conditioners import (ConditioningAttributes, StyleConditioner,
                                        WavCondition, bind_feat_extractor)
    dim = 16
    codec, codec_vars = get_debug_compression_model(sample_rate=32000)
    style = StyleConditioner(dim=256, output_dim=dim, sample_rate=32000,
                             transformer_scale="xsmall", ds_factor=2,
                             n_q_out=3, eval_q=2, length=0.05,
                             encodec_n_q=4, bins=64)
    bind_feat_extractor(style, codec, codec_vars)
    conditioners: tp.Dict[str, BaseConditioner] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
        "self_wav": style,
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": ["self_wav"],
                            "sum": [], "input_interpolate": []})
    model = LMModel(pattern_provider=DelayedPatternProvider(n_q=4),
                    conditioners=conditioners, fuser=fuser, n_q=4, card=400,
                    dim=dim, num_heads=4, num_layers=2, cross_attention=True,
                    causal=True)
    attrs = [ConditioningAttributes(
        text={"description": "init"},
        wav={"self_wav": WavCondition(
            np.zeros((1, 1, 3200), np.float32), np.array([3200]),
            sample_rate=[32000], path=[None])})]
    tokenized = tokenize_conditions(model, attrs)
    seq = jnp.zeros((1, 4, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), seq, tokenized,
                        method=LM.init_all)
    return model, params


def get_debug_melody_lm_model() -> tp.Tuple["LMModel", tp.Any]:
    """Tiny melody-conditioned LM (chroma prepended) for unit tests."""
    from .lm import init_lm_params
    from ..modules.conditioners import ChromaStemConditioner
    dim = 16
    conditioners: tp.Dict[str, BaseConditioner] = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
        "self_wav": ChromaStemConditioner(dim=12, output_dim=dim,
                                          sample_rate=32000, n_chroma=12,
                                          radix2_exp=10, duration=1.0),
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": ["self_wav"],
                            "sum": [], "input_interpolate": []})
    model = LMModel(pattern_provider=DelayedPatternProvider(n_q=4),
                    conditioners=conditioners, fuser=fuser, n_q=4, card=400,
                    dim=dim, num_heads=4, num_layers=2, cross_attention=True,
                    causal=True)
    import numpy as np
    from ..modules.conditioners import ConditioningAttributes, WavCondition
    from .lm import tokenize_conditions, LMModel as LM
    import jax.numpy as jnp
    attrs = [ConditioningAttributes(
        text={"description": "init"},
        wav={"self_wav": WavCondition(
            np.zeros((1, 1, 32000), np.float32), np.array([32000]),
            sample_rate=[32000], path=[None])})]
    tokenized = tokenize_conditions(model, attrs)
    seq = jnp.zeros((1, 4, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), seq, tokenized,
                        method=LM.init_all)
    return model, params
