"""JASCO: text + symbolic (chords/drums/melody) -> music via flow matching.

Parity: `audiocraft/models/jasco.py:24-326` — BaseGenModel-style wrapper over
the FlowMatchingModel with latent normalization and condition preparation.
"""
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..modules.conditioners import ConditioningAttributes, SymbolicCondition
from . import flow_matching as fm
from .flow_matching import FlowMatchingModel


class JASCO:
    """`jasco.py:24-326`."""

    def __init__(self, name: str, compression_model, compression_variables,
                 model: FlowMatchingModel, params,
                 chords_mapping_path: tp.Optional[str] = None,
                 latent_mean: float = 0.0, latent_std: float = 1.0,
                 max_duration: float = 10.0):
        self.name = name
        self.compression_model = compression_model
        self.compression_variables = compression_variables
        self.model = model
        self.params = params
        # the drum conditioner encodes the separated stem with the frozen
        # codec (`ref jasco.py` assigns conditioner.compression_model)
        from ..modules.jasco_conditioners import (DrumsConditioner,
                                                  bind_drums_codec)
        for cond in getattr(model, "conditioners", {}).values():
            if isinstance(cond, DrumsConditioner):
                bind_drums_codec(cond, compression_model,
                                 compression_variables)
        self.latent_mean = latent_mean
        self.latent_std = latent_std
        self.max_duration = max_duration
        self.duration = max_duration
        self.generation_params: dict = {}
        self.rng = jax.random.PRNGKey(0)
        self.chords_mapping = None
        if chords_mapping_path and Path(chords_mapping_path).exists():
            import pickle
            with open(chords_mapping_path, "rb") as f:
                self.chords_mapping = pickle.load(f)
        self.set_generation_params()

    @property
    def frame_rate(self) -> float:
        return self.compression_model.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.compression_model.sample_rate

    def set_generation_params(self, cfg_coef_all: float = 5.0,
                              cfg_coef_txt: float = 0.0, euler: bool = False,
                              euler_steps: int = 50, duration: float = 10.0,
                              **kwargs):
        """`jasco.py:103-128`."""
        self.duration = duration
        self.generation_params = {
            "cfg_coef_all": cfg_coef_all,
            "cfg_coef_txt": cfg_coef_txt,
            "euler": euler,
            "euler_steps": euler_steps,
            **kwargs,
        }

    def _next_rng(self):
        self.rng, r = jax.random.split(self.rng)
        return r

    @staticmethod
    def get_pretrained(name: str = "facebook/jasco-chords-drums-400M",
                       **kwargs) -> "JASCO":
        if name == "debug":
            from . import builders
            return builders.get_debug_jasco_model()
        from . import loaders
        compression_model, compression_vars = \
            loaders.load_compression_model(name)
        from ..utils.assets import chord_mapping_path
        chords_mapping = kwargs.pop("chords_mapping_path",
                                    chord_mapping_path())
        model, params, cfg = loaders.load_jasco_model(
            name, chords_mapping_path=chords_mapping)
        return JASCO(
            name, compression_model, compression_vars, model, params,
            chords_mapping_path=cfg.get("chords_mapping_path",
                                        chords_mapping),
            latent_mean=float(cfg.get("compression_model_latent_mean", 0.0)),
            latent_std=float(cfg.get("compression_model_latent_std", 1.0)),
            max_duration=float(cfg.get("dataset", {}).get(
                "segment_duration", 10.0) if isinstance(
                    cfg.get("dataset"), dict) else 10.0))

    # ---- condition preparation (`jasco.py:130-250`) -----------------------
    def _prepare_chords(self, chords: tp.List[tp.Tuple[str, float]],
                        seq_len: int) -> np.ndarray:
        """(chord_symbol, start_time) list -> per-frame chord indices."""
        assert self.chords_mapping is not None, \
            "chords mapping file required for symbolic chord conditioning"
        fr = self.frame_rate
        null_idx = len(self.chords_mapping)
        out = np.full((seq_len,), null_idx, np.int32)
        for symbol, start in chords:
            idx = self.chords_mapping.get(symbol, null_idx)
            start_frame = int(start * fr)
            out[start_frame:] = idx
        return out

    def _tokenize(self, conditions):
        from ..modules.jasco_conditioners import JascoConditioningProvider
        seq_len = int(self.duration * self.frame_rate)
        provider = JascoConditioningProvider(self.model.conditioners,
                                             sequence_length=seq_len)
        return provider.tokenize(conditions)

    def generate(self, descriptions: tp.List[str],
                 chords: tp.Optional[tp.List[tp.Tuple[str, float]]] = None,
                 melody_salience_matrix: tp.Optional[np.ndarray] = None,
                 drums_wav=None, progress: bool = False,
                 return_tokens: bool = False):
        """Text (+ symbolic) -> audio (`jasco.py:252-326`)."""
        seq_len = int(self.duration * self.frame_rate)
        attributes = []
        for desc in descriptions:
            attrs = ConditioningAttributes(text={"description": desc})
            if "chords" in self.model.conditioners:
                if chords is not None:
                    frame_chords = self._prepare_chords(chords, seq_len)
                else:  # null chord sequence (`jasco.py:150-170`)
                    null_idx = self.model.conditioners["chords"].card
                    frame_chords = np.full((seq_len,), null_idx, np.int32)
                attrs.symbolic["chords"] = SymbolicCondition(
                    frame_chords=frame_chords)
            if melody_salience_matrix is not None and \
                    "melody" in self.model.conditioners:
                attrs.symbolic["melody"] = SymbolicCondition(
                    melody=np.asarray(melody_salience_matrix))
            if "self_wav" in self.model.conditioners:
                # drums conditioning (`ref jasco.py:176-207`): trim/pad the
                # provided drum wav to the generation duration, null
                # condition when absent
                from ..modules.conditioners import WavCondition
                if drums_wav is None:
                    attrs.wav["self_wav"] = WavCondition(
                        np.zeros((1, 1, 1), np.float32), np.array([0]),
                        sample_rate=[self.sample_rate], path=[None])
                else:
                    w = np.asarray(drums_wav, np.float32)
                    if w.ndim == 2:
                        w = w[None]
                    expected = int(self.duration * self.sample_rate)
                    w = w[..., :expected]
                    if w.shape[-1] < expected:
                        w = np.pad(w, ((0, 0), (0, 0),
                                       (0, expected - w.shape[-1])))
                    attrs.wav["self_wav"] = WavCondition(
                        w, np.array([w.shape[-1]]),
                        sample_rate=[self.sample_rate], path=[None])
            attributes.append(attrs)

        latents = fm.generate(
            self.model, self.params, self._next_rng(), self._tokenize,
            conditions=attributes, num_samples=len(descriptions),
            max_gen_len=seq_len, **self.generation_params)

        # unnormalize + decode through the codec decoder only (`jasco.py:85-101`)
        latents = latents * self.latent_std + self.latent_mean
        wav = self.compression_model.decoder.apply(
            {"params": self.compression_variables["params"]["decoder"]},
            latents)
        wav = jnp.swapaxes(wav, 1, 2)
        if return_tokens:
            return wav, latents
        return wav
